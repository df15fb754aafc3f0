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

# lanes per kernel instance; live VMEM ~ (#temps ~15) * 48 * 4B * TILE.
# This is the LARGEST tile tried: the per-signature self-check walks a
# halving ladder down to MIN_TILE until the kernel fits scoped VMEM
# (~16 MB on v5e) — a deg-2/3 tower op traces 2-3x the temporaries of
# deg 1 and OOMs at the deg-1 tile (seen on hardware: the deg-2
# mixed_add at tile 512 needs 17.3 MB once grid pipelining
# double-buffers the block inputs).
#
# Default 128 (one lane-tile): measured on v5e (round 3, 2^20 G1 MSM,
# .scratch/sweep*.log) the whole-MSM rate rises monotonically as the
# tile shrinks — 73.0k pps @1024, 75.5k @512, 88.2k @256, 108.5k @128
# points/sec — the ~20 live (48, T) temporaries blow the vector register
# file at big tiles and Mosaic spills to VMEM, while at 128 lanes more
# of the formula stays register-resident and the deeper grid still
# pipelines.  Compile time also drops ~2.5x at 128.
LANE_TILE = int(os.environ.get("GROTH16_GROUP_TILE", "128"))
MIN_TILE = 128
# scoped-VMEM ceiling for the fused kernels: the default 16 MB rejects
# the deg-3 (MNT6753 G2) scan-step kernel by ~6% (seen on v5e) and
# forces its whole MSM onto the ~2.7x slower inline path; v5e has
# 128 MB of physical VMEM, so grant a generous slice
VMEM_LIMIT = int(os.environ.get("GROTH16_VMEM_LIMIT", str(96 * 1024 * 1024)))


def _compiler_params():
    try:
        from jax.experimental.pallas import tpu as _pltpu
        return _pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)
    except Exception:   # pragma: no cover - API drift safety
        return None

_DISABLED = False          # set on any self-check failure (fail-closed)
_SUPPRESS = False          # temporarily force the XLA path (self-checks)
_CHECKED = {}              # signature -> chosen tile (int) | False
_BUILT = {}                # (cops, op, sig, B, T, interpret) -> callable


def _tile_ladder():
    t, out = LANE_TILE, []
    while t >= MIN_TILE:
        out.append(t)
        t //= 2
    if not out:
        # sub-128 GROTH16_GROUP_TILE override: try it as-is rather than
        # silently disabling every kernel with an empty ladder
        out.append(LANE_TILE)
    return out


def _fit_tile(tile: int, B: int):
    """Largest capacity-safe tile <= the validated `tile` that divides B.

    Any tile smaller than a validated one fits VMEM (same trace, smaller
    blocks), so shrinking for divisibility needs no re-validation."""
    t = min(tile, B)
    while t > 1 and B % t:
        t //= 2
    return t if t > 0 and B % t == 0 else None


def _interpret() -> bool:
    return bool(os.environ.get("GROTH16_GROUP_INTERPRET"))


def _aot_call(fn, samples):
    """Execute fn on concrete numpy samples OUTSIDE any ambient trace.

    The dispatch (and hence the one-time self-check) usually fires while
    an outer jit is tracing; plain calls would stage onto that trace and
    hand back tracers, and jax.ensure_compile_time_eval leaks eagerness
    into the Pallas kernel's own trace (its internal zeros turn into
    captured constants).  The AOT path traces in a fresh context and
    executes the compiled artifact directly.
    """
    sds = [jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
           for x in samples]
    return jax.jit(fn).lower(*sds).compile()(*samples)


def _enabled() -> bool:
    if _DISABLED or _SUPPRESS or L.in_kernel_mul():
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


def _build(cops, op, sig, B, tile=None):
    """Returns (callable(*input_arrays) -> output arrays, out_bounds).

    The formula trace inevitably creates small constant arrays (the
    modulus limbs, k*p subtraction offsets, the b3 curve constant);
    Pallas kernels may not capture constants, so `jax.closure_convert`
    hoists them out of the traced jaxpr and they ride into the kernel as
    extra grid-invariant inputs.
    """
    key = (cops, op, sig, B, tile, _interpret())
    fn = _BUILT.get(key)
    if fn is not None:
        return fn
    _, deg, in_bounds, has_mask = sig
    n_in = len(in_bounds)
    n_args = n_in + int(has_mask)
    n_out = 3 * deg
    interpret = _interpret()
    T = B if interpret else min(tile or LANE_TILE, B)
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

    example = [jax.ShapeDtypeStruct((cops.nq, T), jnp.uint32)
               for _ in range(n_in)]
    if has_mask:
        example.append(jax.ShapeDtypeStruct((1, T), jnp.uint32))
    # make_jaxpr hoists EVERY constant the trace created (closure_convert
    # would bake integer-dtype consts back in); the kernel then replays
    # the jaxpr with the consts arriving through refs.
    closed = jax.make_jaxpr(flat)(*example)
    jaxpr, consts = closed.jaxpr, closed.consts
    from jax import core as jcore
    # 2-D lift: TPU kernel inputs want rank >= 2 (scalars/(n,) consts).
    # Kept as NUMPY: a jnp op here would run under whatever jit trace the
    # dispatch fired in and hand the kernel tracers instead of values.
    const_shapes = [tuple(np.shape(c)) for c in consts]
    consts2d = [np.asarray(c).reshape(_lift2d(s))
                for c, s in zip(consts, const_shapes)]

    def kernel(*refs):
        ins = [r[...] for r in refs[:n_args]]
        cvals = [refs[n_args + i][...].reshape(s)
                 for i, s in enumerate(const_shapes)]
        res = jcore.eval_jaxpr(jaxpr, cvals, *ins)
        for ref, v in zip(refs[n_args + len(consts):], res):
            ref[...] = v

    ms = pl.ANY if interpret else pltpu.VMEM
    spec = pl.BlockSpec((cops.nq, T), lambda i: (0, i), memory_space=ms)
    in_specs = [spec] * n_in
    if has_mask:
        in_specs.append(
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=ms))
    for c in consts2d:
        in_specs.append(pl.BlockSpec(
            c.shape, (lambda i: (0, 0)), memory_space=ms))
    cp = None if interpret else _compiler_params()
    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((cops.nq, B), jnp.uint32)
                   for _ in range(n_out)],
        grid=(B // T,),
        in_specs=in_specs,
        out_specs=[spec] * n_out,
        interpret=interpret,
        **({"compiler_params": cp} if cp is not None else {}),
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

def _self_check(cops, op, sig):
    """Kernel output must be limb-identical to the XLA path on random
    in-bounds operands for this exact signature.

    Returns the chosen lane tile (int) or False.  The check runs at
    B = 2*tile so the compiled kernel has grid > 1 — grid pipelining
    double-buffers the block inputs/outputs and is what actually sets
    the scoped-VMEM high-water mark (a grid=1 check passes and then the
    production compile OOMs).  Capacity failures walk down the tile
    ladder; only an exactness MISMATCH fail-closes the whole path.
    """
    global _DISABLED
    ok = _CHECKED.get((cops, op, sig))
    if ok is not None:
        return ok
    _, deg, in_bounds, has_mask = sig
    rng = np.random.default_rng(hash(sig) & 0xFFFFFFFF)
    p = cops.F.p if deg == 1 else cops.F.base.p
    last_err = None
    ok = False
    for tile in _tile_ladder():
        Bc = 2 * tile
        try:
            fels = []
            for (k, lb) in in_bounds:
                vals = [int.from_bytes(rng.bytes(96), "little") % (k * p)
                        for _ in range(Bc)]
                vals[0] = 0                      # identity/zero lanes
                vals[1] = k * p - 1              # at the static bound
                arr = np.stack(
                    [L.int_to_limbs(v, cops.nq, cops.qbits) for v in vals],
                    axis=1)
                # numpy on purpose: jnp arrays built under an outer jit
                # trace are tracers; the check must see concrete values
                fels.append(Fel(arr, k, lb))
            mask = None
            if has_mask:
                mask = rng.integers(0, 2, size=(1, Bc)).astype(bool)
            call, out_bounds = _build(cops, op, sig, Bc, tile)
            args = [f.v for f in fels]
            if has_mask:
                args.append(mask.astype(np.uint32))
            got = [np.asarray(x) for x in _aot_call(call, args)]

            def ref(*arrs):
                rf = [Fel(a, k, lb)
                      for a, (k, lb) in zip(arrs, in_bounds)]
                rm = (arrs[-1] != 0) if has_mask else None
                with L.kernel_mul_scope():
                    outs = _trace_op(cops, op, rf, rm)
                return tuple(o.v for o in outs)

            want = [np.asarray(x) for x in _aot_call(ref, args)]
            if all(np.array_equal(g, w) for g, w in zip(got, want)):
                ok = tile
                break
            # pragma: no cover - hardware-dependent
            import sys
            print(f"gpu_groth16_prover_3x_tpu: fused {op} group kernel "
                  "self-check MISMATCH; group kernels disabled",
                  file=sys.stderr, flush=True)
            _DISABLED = True
            ok = False
            break
        except Exception as e:  # pragma: no cover - hardware-dependent
            last_err = e         # capacity/lowering: try a smaller tile
    if ok is False and not _DISABLED:  # pragma: no cover
        import sys
        print(f"gpu_groth16_prover_3x_tpu: fused {op} group kernel "
              f"unavailable for {sig!r} "
              f"({type(last_err).__name__}: {last_err}); "
              f"XLA path for this signature", file=sys.stderr, flush=True)
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
    tile = _self_check(cops, op, sig)
    if not tile:
        return None
    tile = _fit_tile(tile, B)
    if not tile:
        return None
    call, out_bounds = _build(cops, op, sig, B, tile)
    full = (cops.nq, B)
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


# -- generic lane-axis kernel fusion combinator ---------------------------------
#
# `maybe_fuse(tag, fn, args)` runs an arbitrary pure jnp function — whose
# array arguments and results all carry the batch on their LAST axis —
# as ONE Pallas kernel tiled over that axis.  Used for whole-scan-step
# fusion in the MSM (ops/msm.py), where even the fused group op leaves
# the run-boundary select/emit logic as ~10 extra HBM round trips per
# step.  Same machinery as the group kernels: jaxpr const hoisting, a
# per-signature exactness self-check, fail-closed to plain fn.

_FUSED = {}       # (tag, per-arg (rank, rows, dtype)) -> max validated tile | False
_FUSE_RUNS = {}   # (sig, tile) -> compiled runner


def _rand_like(rng, shape, dtype):
    # numpy on purpose: a jnp array built under an outer jit trace is a
    # tracer, and the self-check must evaluate on concrete values
    if dtype == jnp.uint32:
        return rng.integers(0, 1 << 16, size=shape, dtype=np.uint32)
    if dtype == jnp.uint16:
        return rng.integers(0, 1 << 16, size=shape).astype(np.uint16)
    if dtype == jnp.int32:
        return rng.integers(0, 1 << 10, size=shape, dtype=np.int32)
    if dtype == jnp.bool_:
        return rng.integers(0, 2, size=shape).astype(bool)
    raise TypeError(f"no random generator for {dtype}")


def _fuse_build(fn, arg_specs, T):
    """arg_specs: per-arg ((rows-or-None for rank-1), dtype)."""
    in_ranks = [1 if rows is None else 2 for rows, _ in arg_specs]
    n_in = len(arg_specs)
    out_ranks = []

    def norm_fn(*arrs2d):
        args = [a[0] if r == 1 else a for a, r in zip(arrs2d, in_ranks)]
        with L.kernel_mul_scope():
            outs = fn(*args)
        del out_ranks[:]
        out_ranks.extend(o.ndim for o in outs)
        return tuple(o[None] if o.ndim == 1 else o for o in outs)

    example = [jax.ShapeDtypeStruct((rows or 1, T), d)
               for rows, d in arg_specs]
    closed = jax.make_jaxpr(norm_fn)(*example)
    jaxpr, consts = closed.jaxpr, closed.consts
    out_avals = closed.out_avals
    from jax import core as jcore
    const_shapes = [tuple(np.shape(c)) for c in consts]
    consts2d = [np.asarray(c).reshape(_lift2d(s))    # numpy: see _build
                for c, s in zip(consts, const_shapes)]
    interpret = _interpret()
    ms = pl.ANY if interpret else pltpu.VMEM

    def kernel(*refs):
        ins = [r[...] for r in refs[:n_in]]
        cvals = [refs[n_in + i][...].reshape(s)
                 for i, s in enumerate(const_shapes)]
        res = jcore.eval_jaxpr(jaxpr, cvals, *ins)
        for ref, v in zip(refs[n_in + len(consts):], res):
            ref[...] = v

    in_specs = [pl.BlockSpec((rows or 1, T), lambda i: (0, i),
                             memory_space=ms) for rows, _ in arg_specs]
    in_specs += [pl.BlockSpec(c.shape, (lambda i: (0, 0)), memory_space=ms)
                 for c in consts2d]

    calls = {}

    def run(*arrays):
        B = arrays[0].shape[-1]
        call = calls.get(B)
        if call is None:
            out_shape = [jax.ShapeDtypeStruct((a.shape[0], B), a.dtype)
                         for a in out_avals]
            out_specs = [pl.BlockSpec((a.shape[0], T), lambda i: (0, i),
                                      memory_space=ms) for a in out_avals]
            cp = None if interpret else _compiler_params()
            call = calls[B] = pl.pallas_call(
                kernel, out_shape=out_shape, grid=(B // T,),
                in_specs=in_specs, out_specs=out_specs,
                interpret=interpret,
                **({"compiler_params": cp} if cp is not None else {}))
        arrs2d = [a[None] if a.ndim == 1 else a for a in arrays]
        outs = call(*arrs2d, *consts2d)
        return tuple(o[0] if r == 1 else o
                     for o, r in zip(outs, out_ranks))

    return run


def maybe_fuse(tag, fn, args, key=None):
    """fn(*args) as one Pallas kernel, or None (caller runs fn inline).

    args: arrays with the batch on the LAST axis (rank 1 or 2), all the
    same batch size B; B must tile by LANE_TILE.  fn must be a pure jnp
    function of the arrays alone (anything else it closes over must be
    a Python/numpy constant — jaxpr consts are hoisted automatically).

    `key`: hashable identity of everything fn's TRACE depends on beyond
    the arg shapes (e.g. the CurveOps whose moduli ride in as consts).
    Two calls with the same (tag, key) and arg signature share one
    validated kernel; omitting a distinguishing key would silently reuse
    another config's constants.
    """
    if not _enabled():
        return None
    B = args[0].shape[-1]
    if B % 128:
        return None
    for a in args:
        if a.ndim not in (1, 2) or a.shape[-1] != B:
            return None
    sig = (tag, key, tuple((a.ndim, a.shape[0] if a.ndim == 2 else None,
                            str(a.dtype)) for a in args))
    specs = [(a.shape[0] if a.ndim == 2 else None, a.dtype)
             for a in args]
    tile = _FUSED.get(sig)
    if tile is False:
        return None
    if tile is None:
        rng = np.random.default_rng(abs(hash(sig)) & 0xFFFFFFFF)
        global _SUPPRESS
        last_err = None
        # tile ladder: self-check at B = 2*T (grid 2) so the compiled
        # kernel pays the pipelined double-buffering that sets the real
        # scoped-VMEM high-water mark; capacity failures retry smaller
        ladder = [B] if _interpret() else \
            [t for t in _tile_ladder() if t <= B]
        for T in ladder:
            try:
                run = _fuse_build(fn, specs, T)
                Bc = T if _interpret() else 2 * T
                samples = [_rand_like(rng, a.shape[:-1] + (Bc,), a.dtype)
                           for a in args]
                # self-check: kernel == plain fn on random operands
                # (every op is a deterministic mod-2^32 integer op, so
                # arbitrary bits validate the compiled kernel exactly)
                got = _aot_call(run, samples)
                _SUPPRESS = True     # reference trace: pure XLA path
                try:
                    want = _aot_call(fn, samples)
                finally:
                    _SUPPRESS = False
                ok = all(np.array_equal(np.asarray(g), np.asarray(w))
                         for g, w in zip(got, want))
                if not ok:  # pragma: no cover - hardware-dependent
                    import sys
                    print(f"gpu_groth16_prover_3x_tpu: fused '{tag}' "
                          "kernel self-check MISMATCH; inline path",
                          file=sys.stderr, flush=True)
                    _FUSED[sig] = False
                    return None
                tile = _FUSED[sig] = T
                _FUSE_RUNS[(sig, T)] = run
                break
            except Exception as e:  # pragma: no cover - hw-dependent
                last_err = e
        if tile is None:  # pragma: no cover - hardware-dependent
            import sys
            print(f"gpu_groth16_prover_3x_tpu: fused '{tag}' kernel "
                  f"unavailable ({type(last_err).__name__}: {last_err}); "
                  "inline path", file=sys.stderr, flush=True)
            _FUSED[sig] = False
            return None
    # per-call tile fit: a later batch need not be a multiple of the
    # validated tile — shrink to the largest divisor (capacity-safe)
    T = B if _interpret() else _fit_tile(tile, B)
    if not T or T < MIN_TILE // 2:
        return None
    run = _FUSE_RUNS.get((sig, T))
    if run is False:  # a previous build at this shrunk tile failed
        return None
    if run is None:
        try:
            run = _FUSE_RUNS[(sig, T)] = _fuse_build(fn, specs, T)
        except Exception:  # pragma: no cover - hardware-dependent
            # a shrunk tile is an unvalidated geometry: stay fail-closed
            # (inline path) instead of propagating a build error
            _FUSE_RUNS[(sig, T)] = False
            return None
    return run(*args)
