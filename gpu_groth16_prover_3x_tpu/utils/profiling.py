"""Nested block timers (libff enter_block/leave_block equivalent).

Mirrors depends/libff/libff/common/profiling.cpp:241-327: a stack of named
regions printing wall time with indentation, plus the GPU prover's flat
`print_time` phase labels (cuda_prover_piecewise.cu:87-94).  Controlled by
set_profiling_enabled; disabled in tests.
"""

import sys
import time
from contextlib import contextmanager

_enabled = True
_stack = []
_last_laps = {}    # most recent duration per block name (see last_laps)


def last_laps() -> dict:
    """Most recent wall time per block label (top-level phase breakdown
    for harnesses — bench.py records the prover's phase split from it)."""
    return dict(_last_laps)


def clear_laps() -> None:
    _last_laps.clear()


def set_profiling_enabled(flag: bool) -> None:
    global _enabled
    _enabled = flag


def _indent() -> str:
    return "  " * len(_stack)


def enter_block(name: str) -> None:
    if _enabled:
        print(f"{_indent()}(enter) {name}", file=sys.stderr, flush=True)
    _stack.append((name, time.perf_counter()))


def leave_block(name: str) -> None:
    top, start = _stack.pop()
    assert top == name, f"unbalanced blocks: {top} vs {name}"
    dt = time.perf_counter() - start
    _last_laps[name] = dt
    if _enabled:
        print(f"{_indent()}(leave) {name} [{dt:.4f}s]",
              file=sys.stderr, flush=True)


@contextmanager
def block(name: str):
    enter_block(name)
    try:
        yield
    finally:
        leave_block(name)


def log_device_memory(label: str = "") -> dict:
    """Device-memory report (the reference prints free/total GPU memory
    mid-kernel, multiexp/reduce.cu:184-191).  Returns {device: stats} and
    prints one line per device when profiling is enabled; silently empty
    on backends without allocator stats (XLA:CPU)."""
    out = {}
    try:
        import jax
        for d in jax.local_devices():
            st = d.memory_stats() or {}
            if not st:
                continue
            out[str(d)] = st
            if _enabled:
                used = st.get("bytes_in_use", 0)
                lim = st.get("bytes_limit", 0)
                peak = st.get("peak_bytes_in_use", 0)
                print(f"{label + ': ' if label else ''}{d} memory "
                      f"{used / 2**30:.2f} GiB in use, "
                      f"peak {peak / 2**30:.2f} GiB, "
                      f"limit {lim / 2**30:.2f} GiB",
                      file=sys.stderr, flush=True)
    except Exception:
        pass
    return out


class PhaseTimer:
    """print_time-style running phase timer (cuda_prover_piecewise.cu:87-94)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.last = self.t0
        self.laps = {}

    def lap(self, label: str) -> float:
        now = time.perf_counter()
        dt = now - self.last
        self.laps[label] = dt
        if _enabled:
            print(f"{label}: {dt * 1e6:.0f} us", file=sys.stderr, flush=True)
        self.last = now
        return dt

    def total(self, label: str = "total") -> float:
        dt = time.perf_counter() - self.t0
        self.laps[label] = dt
        if _enabled:
            print(f"{label}: {dt * 1e6:.0f} us", file=sys.stderr, flush=True)
        return dt
