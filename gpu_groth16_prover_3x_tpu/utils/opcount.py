"""Trace-time arithmetic op counters (PROFILE_OP_COUNTS analog).

The reference tallies field multiplies and EC group ops at runtime behind
`#ifdef PROFILE_OP_COUNTS` (depends/libff/libff/algebra/fields/fp.hpp:46-51,
common/profiling.cpp:119-150).  Under XLA the program is traced once and
executed many times, so the natural counting point is TRACE time: every
`mont_mul` (and EC formula) records how many lane-instances of work the
traced program will perform per execution.  Code that multiplies a traced
region's execution count (lax.scan / fori_loop bodies) wraps the trace in
``scale(trip_count)`` so the tally reflects real executed work.

Counting is off unless enabled — zero overhead in the traced program
either way (the counters are Python-side; nothing lands in the HLO).

Usage:
    from ..utils import opcount
    with opcount.collect() as tally:
        jax.jit(kernel).lower(args)       # or just run it once
    print(opcount.report(tally))
"""

from contextlib import contextmanager
from typing import Dict, Optional

_active: Optional[Dict[str, int]] = None
_scale = 1


def enabled() -> bool:
    return _active is not None


def add(kind: str, n: int = 1) -> None:
    """Record n units of `kind` (e.g. 'fp_mul' lanes) at current scale."""
    if _active is not None:
        _active[kind] = _active.get(kind, 0) + n * _scale


@contextmanager
def scale(factor: int):
    """Multiply counts recorded inside (a lax.scan/fori_loop body traced
    once but executed `factor` times)."""
    global _scale
    prev = _scale
    _scale = prev * int(factor)
    try:
        yield
    finally:
        _scale = prev


@contextmanager
def collect():
    """Collect counts from every op traced inside the scope."""
    global _active, _scale
    prev, prev_scale = _active, _scale
    tally: Dict[str, int] = {}
    _active, _scale = tally, 1
    try:
        yield tally
    finally:
        _active, _scale = prev, prev_scale


def report(tally: Dict[str, int]) -> str:
    """profiling.cpp:119-150-style one-line-per-counter report."""
    lines = ["op counts (traced work per execution):"]
    for k in sorted(tally):
        lines.append(f"  {k:<24} {tally[k]:>16,}")
    return "\n".join(lines)
