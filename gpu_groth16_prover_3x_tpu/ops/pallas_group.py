"""Fused Pallas TPU kernels for whole EC group operations.

The XLA path executes an EC group op (ops/ec.py RCB15) as ~3 stacked
Montgomery multiplies plus ~25 lazy limb ops, each a separate fusion
with an HBM round trip for its (48, B) uint32 operands — the op is
memory-bound by roughly an order of magnitude (VPU needs ~5 u32 ops per
HBM word; the chip affords ~19).  These kernels trace the SAME ec.py
formula code inside one `pl.pallas_call`, so every intermediate field
value lives in VMEM/vregs and HBM sees only the 5 (mixed_add) / 6 (add)
input coordinate blocks and 3 output blocks.  This is the TPU analog of
the reference keeping a whole `ec_jac` point in registers across a warp
tile for the entire bucket pass (multiexp/reduce.cu:11-76).

Exactness: inside the kernel, `limbs.kernel_mul_scope` routes mont_mul
to the plain unrolled CIOS; its canonical REDC output is the unique
integer (ab + m*p)/R, and every surrounding lazy limb op is the
identical jnp code the XLA path traces — so kernel and XLA results are
bit-identical, which the one-time per-signature self-check enforces
before the kernel is ever used for real work (fail-closed to the XLA
path, the same pattern as ops/pallas_kernels.pallas_available).

Dispatch: ops/ec.py CurveOps.{mixed_add,add,dbl} call `maybe_<op>` first;
`None` means "use the XLA path".  GROTH16_NO_PALLAS_GROUP=1 opts out;
GROTH16_FORCE_PALLAS_GROUP=1 (+ optionally GROTH16_GROUP_INTERPRET=1)
enables off-TPU for interpret-mode tests.
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs as L
from .field import Fel

# lanes per kernel instance; live VMEM ~ (#temps ~15) * 48 * 4B * TILE
LANE_TILE = int(os.environ.get("GROTH16_GROUP_TILE", "512"))

_DISABLED = False          # set on any self-check failure (fail-closed)
_CHECKED = {}              # signature -> bool (self-check outcome)
_BUILT = {}                # (cops, op, sig, B, T, interpret) -> callable


def _interpret() -> bool:
    return bool(os.environ.get("GROTH16_GROUP_INTERPRET"))


def _enabled() -> bool:
    if _DISABLED or L.in_kernel_mul():
        return False
    if os.environ.get("GROTH16_NO_PALLAS_GROUP"):
        return False
    if os.environ.get("GROTH16_FORCE_PALLAS_GROUP"):
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# -- Point <-> flat Fel-list plumbing ------------------------------------------

def _flatten_point(P):
    out = []
    for c in P:
        if isinstance(c, Fel):
            out.append(c)
        else:
            out.extend(c)
    return out


def _unflatten_point(deg: int, fels):
    coords = []
    for i in range(3):
        fs = fels[i * deg:(i + 1) * deg]
        coords.append(fs[0] if deg == 1 else tuple(fs))
    return tuple(coords)


def _gather_inputs(cops, op, P, Q_or_xy, q_inf):
    """Flatten an op's operands to (fels, mask, sig).  Returns None if the
    shapes don't fit the kernel contract (rank-2, common batch)."""
    deg = cops.F.deg
    fels = _flatten_point(P)
    if op == "mixed_add":
        x2, y2 = Q_or_xy
        fels += list(x2) if not isinstance(x2, Fel) else [x2]
        fels += list(y2) if not isinstance(y2, Fel) else [y2]
    elif op == "add":
        fels += _flatten_point(Q_or_xy)
    batches = {f.v.shape[1:] for f in fels}
    batches.discard((1,))
    if len(batches) != 1:
        return None
    (batch,) = batches
    if len(batch) != 1:
        return None
    B = int(batch[0])
    mask = None
    if q_inf is not None:
        if q_inf.shape[-1] != B or q_inf.ndim != 2:
            return None
        mask = q_inf
    sig = (op, deg, tuple((f.k, f.lb) for f in fels), mask is not None)
    return fels, mask, B, sig


# -- kernel construction --------------------------------------------------------

def _trace_op(cops, op, fels, mask):
    """The shared formula trace: runs ec.py's XLA code on `fels` under
    kernel_mul_scope semantics decided by the caller's context."""
    deg = cops.F.deg
    P = _unflatten_point(deg, fels[:3 * deg])
    if op == "mixed_add":
        x2 = fels[3 * deg] if deg == 1 else tuple(fels[3 * deg:4 * deg])
        y2 = fels[4 * deg] if deg == 1 else tuple(fels[4 * deg:5 * deg])
        R = cops.mixed_add(P, x2, y2,
                           q_inf=None if mask is None else mask)
    elif op == "add":
        Q = _unflatten_point(deg, fels[3 * deg:6 * deg])
        R = cops.add(P, Q)
    else:
        R = cops.dbl(P)
    return _flatten_point(R)


def _build(cops, op, sig, B):
    """Returns (callable(*input_arrays) -> output arrays, out_bounds).

    The formula trace inevitably creates small constant arrays (the
    modulus limbs, k*p subtraction offsets, the b3 curve constant);
    Pallas kernels may not capture constants, so `jax.closure_convert`
    hoists them out of the traced jaxpr and they ride into the kernel as
    extra grid-invariant inputs.
    """
    key = (cops, op, sig, B, _interpret())
    fn = _BUILT.get(key)
    if fn is not None:
        return fn
    _, deg, in_bounds, has_mask = sig
    n_in = len(in_bounds)
    n_args = n_in + int(has_mask)
    n_out = 3 * deg
    interpret = _interpret()
    T = B if interpret else min(LANE_TILE, B)
    assert B % T == 0
    out_bounds = []

    def flat(*arrs):
        fels = [Fel(a, k, lb)
                for a, (k, lb) in zip(arrs[:n_in], in_bounds)]
        mask = (arrs[n_in] != 0) if has_mask else None
        with L.kernel_mul_scope():
            outs = _trace_op(cops, op, fels, mask)
        del out_bounds[:]
        out_bounds.extend((o.k, o.lb) for o in outs)
        return tuple(o.v for o in outs)

    example = [jax.ShapeDtypeStruct((L.NUM_LIMBS, T), jnp.uint32)
               for _ in range(n_in)]
    if has_mask:
        example.append(jax.ShapeDtypeStruct((1, T), jnp.uint32))
    # make_jaxpr hoists EVERY constant the trace created (closure_convert
    # would bake integer-dtype consts back in); the kernel then replays
    # the jaxpr with the consts arriving through refs.
    closed = jax.make_jaxpr(flat)(*example)
    jaxpr, consts = closed.jaxpr, closed.consts
    from jax import core as jcore
    # 2-D lift: TPU kernel inputs want rank >= 2 (scalars/(n,) consts)
    const_shapes = [tuple(np.shape(c)) for c in consts]
    consts2d = [jnp.asarray(c).reshape(_lift2d(s))
                for c, s in zip(consts, const_shapes)]

    def kernel(*refs):
        ins = [r[...] for r in refs[:n_args]]
        cvals = [refs[n_args + i][...].reshape(s)
                 for i, s in enumerate(const_shapes)]
        res = jcore.eval_jaxpr(jaxpr, cvals, *ins)
        for ref, v in zip(refs[n_args + len(consts):], res):
            ref[...] = v

    ms = pl.ANY if interpret else pltpu.VMEM
    spec = pl.BlockSpec((L.NUM_LIMBS, T), lambda i: (0, i), memory_space=ms)
    in_specs = [spec] * n_in
    if has_mask:
        in_specs.append(
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=ms))
    for c in consts2d:
        in_specs.append(pl.BlockSpec(
            c.shape, (lambda i: (0, 0)), memory_space=ms))
    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((L.NUM_LIMBS, B), jnp.uint32)
                   for _ in range(n_out)],
        grid=(B // T,),
        in_specs=in_specs,
        out_specs=[spec] * n_out,
        interpret=interpret,
    )

    def run(*arrays):
        return call(*arrays, *consts2d)

    fn = (run, tuple(out_bounds))
    _BUILT[key] = fn
    return fn


def _lift2d(shape):
    if len(shape) == 0:
        return (1, 1)
    if len(shape) == 1:
        return (shape[0], 1)
    return shape


# -- self-check -----------------------------------------------------------------

def _self_check(cops, op, sig) -> bool:
    """Kernel output must be limb-identical to the XLA path on random
    in-bounds operands for this exact signature."""
    global _DISABLED
    ok = _CHECKED.get((cops, op, sig))
    if ok is not None:
        return ok
    try:
        _, deg, in_bounds, has_mask = sig
        Bc = 128
        rng = np.random.default_rng(hash(sig) & 0xFFFFFFFF)
        p = cops.F.p if deg == 1 else cops.F.base.p
        fels = []
        for (k, lb) in in_bounds:
            vals = [int.from_bytes(rng.bytes(96), "little") % (k * p)
                    for _ in range(Bc)]
            vals[0] = 0                      # identity/zero lanes
            vals[1] = k * p - 1              # at the static bound
            arr = np.stack([L.int_to_limbs(v) for v in vals], axis=1)
            fels.append(Fel(jnp.asarray(arr), k, lb))
        mask = None
        if has_mask:
            mask = jnp.asarray(
                rng.integers(0, 2, size=(1, Bc)).astype(bool))
        call, out_bounds = _build(cops, op, sig, Bc)
        args = [f.v for f in fels]
        if has_mask:
            args.append(mask.astype(jnp.uint32))
        got = [np.asarray(x) for x in call(*args)]
        with L.kernel_mul_scope():
            want_fels = _trace_op(cops, op, fels, mask)
        want = [np.asarray(f.v) for f in want_fels]
        ok = all(np.array_equal(g, w) for g, w in zip(got, want))
        if not ok:  # pragma: no cover - hardware-dependent
            import sys
            print(f"gpu_groth16_prover_3x_tpu: fused {op} group kernel "
                  "self-check MISMATCH; group kernels disabled",
                  file=sys.stderr, flush=True)
            _DISABLED = True
    except Exception as e:  # pragma: no cover - hardware-dependent
        import sys
        print(f"gpu_groth16_prover_3x_tpu: fused group kernels unavailable "
              f"({type(e).__name__}: {e}); using the XLA path",
              file=sys.stderr, flush=True)
        _DISABLED = True
        ok = False
    _CHECKED[(cops, op, sig)] = ok
    return ok


# -- dispatch entry points (return None -> caller uses the XLA path) ------------

def _run(cops, op, P, Q_or_xy, q_inf) -> Optional[tuple]:
    if not _enabled():
        return None
    g = _gather_inputs(cops, op, P, Q_or_xy, q_inf)
    if g is None:
        return None
    fels, mask, B, sig = g
    if B % 128:
        return None
    if not _self_check(cops, op, sig):
        return None
    call, out_bounds = _build(cops, op, sig, B)
    full = (L.NUM_LIMBS, B)
    args = [jnp.broadcast_to(f.v, full) for f in fels]
    if mask is not None:
        args.append(mask.astype(jnp.uint32))
    outs = call(*args)
    deg = cops.F.deg
    out_fels = [Fel(v, k, lb) for v, (k, lb) in zip(outs, out_bounds)]
    return _unflatten_point(deg, out_fels)


def maybe_mixed_add(cops, P, x2, y2, q_inf):
    return _run(cops, "mixed_add", P, (x2, y2), q_inf)


def maybe_add(cops, P, Q):
    return _run(cops, "add", P, Q, None)


def maybe_dbl(cops, P):
    return _run(cops, "dbl", P, None, None)
