"""Pallas TPU kernels for the hot limb ops.

The jnp implementation of mont_mul (ops/limbs.py) lowers to a lax.scan of
~15 vector ops per CIOS iteration; XLA materializes the (50, batch)
accumulator between ops.  This Pallas kernel unrolls all 48 iterations in
one Mosaic kernel with the accumulator held in VMEM/vregs — one HBM read
per operand, one write for the product, the compute entirely on the VPU.
This is the TPU counterpart of the reference holding the CIOS state in
registers across a warp tile (multiexp/arith.cu:289-337).

Usage: limbs.mont_mul dispatches here when JAX runs on TPU (or when
GROTH16_FORCE_PALLAS is set, e.g. with interpret=True under tests).
"""

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs as L

# batch lanes per kernel instance: 1024 = one (8, 128) vreg per
# accumulator row (50 live rows ~ the vreg file); GROTH16_PALLAS_TILE
# overrides for hardware sweeps
LANE_TILE = int(os.environ.get("GROTH16_PALLAS_TILE", "1024"))


def _kernel_body(p_limbs: tuple, ninv16: int):
    """Build the CIOS kernel for one modulus (constants baked in)."""

    def kernel(a_ref, b_ref, out_ref):
        a = a_ref[...]                        # (48, T) uint32
        b = b_ref[...]
        T = a.shape[1]
        MASK16 = jnp.uint32(0xFFFF)  # built inside: kernels must not
        # close over traced module-level constants
        # accumulator rows t[0..49] kept as a list of vreg values
        t = [jnp.zeros((T,), jnp.uint32) for _ in range(L.NUM_LIMBS + 2)]
        ninv = jnp.uint32(ninv16)
        for i in range(L.NUM_LIMBS):
            ai = a[i, :]
            # t += ai * b  (lazy: limbs < 2^17 before, exact in uint32)
            for j in range(L.NUM_LIMBS):
                t[j] = t[j] + ai * b[j, :]
            # local carry fold: t[j] = (t[j] & 0xffff) + (t[j-1] >> 16)
            carry = jnp.zeros((T,), jnp.uint32)
            for j in range(L.NUM_LIMBS + 2):
                nxt = t[j] >> 16
                t[j] = (t[j] & MASK16) + carry
                carry = nxt
            m = (t[0] * ninv) & MASK16
            for j in range(L.NUM_LIMBS):
                if p_limbs[j]:
                    t[j] = t[j] + m * jnp.uint32(p_limbs[j])
            carry = jnp.zeros((T,), jnp.uint32)
            for j in range(L.NUM_LIMBS + 2):
                nxt = t[j] >> 16
                t[j] = (t[j] & MASK16) + carry
                carry = nxt
            # shift down one limb (t[0] is exactly 0 now)
            t = t[1:] + [jnp.zeros((T,), jnp.uint32)]
        # final exact canonicalization (Kogge-Stone on 49 live limbs)
        v = jnp.stack(t[:L.NUM_LIMBS + 1], axis=0)   # (49, T), limbs < 2^17
        lo = v & MASK16
        g = v >> 16
        pr = (lo == MASK16).astype(jnp.uint32)
        s = 1
        while s < v.shape[0]:
            gs = jnp.concatenate([jnp.zeros((s, T), jnp.uint32), g[:-s]], 0)
            ps = jnp.concatenate([jnp.zeros((s, T), jnp.uint32), pr[:-s]], 0)
            g = g | (pr & gs)
            pr = pr & ps
            s *= 2
        cin = jnp.concatenate([jnp.zeros((1, T), jnp.uint32), g[:-1]], 0)
        out_ref[...] = ((lo + cin) & MASK16)[:L.NUM_LIMBS]

    return kernel


@lru_cache(maxsize=None)
def _build(p: int, ninv16: int, batch: int, interpret: bool):
    p_limbs = tuple(int(x) for x in L.int_to_limbs(p))
    kernel = _kernel_body(p_limbs, ninv16)
    T = min(LANE_TILE, batch)
    assert batch % T == 0
    grid = (batch // T,)

    spec = pl.BlockSpec((L.NUM_LIMBS, T), lambda i: (0, i),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)

    extra = {}
    if not interpret:
        try:
            from .pallas_group import _compiler_params
            cp = _compiler_params()
            if cp is not None:
                extra["compiler_params"] = cp
        except Exception:  # pragma: no cover - API drift safety
            pass
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L.NUM_LIMBS, batch), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
        **extra,
    )
    return jax.jit(fn)


_SELF_CHECK = None  # lazily computed: True once the kernel proves exact


def _self_check() -> bool:
    """One-time exactness gate for the compiled kernel on this backend.

    Runs the Pallas CIOS against the XLA-scan reference on adversarial
    canonical operands (near-bound k*p values, all-ones limb patterns)
    for BOTH 753-bit primes; any mismatch or compile failure disables
    the Pallas path for the process (the scan path is always exact).
    The check is a few tiny eager computations (~seconds incl. kernel
    compile) and runs before the first real multiply.

    The first multiply usually fires while an outer jit is TRACING the
    prover: plain calls would stage onto that trace and hand back
    tracers (np.asarray on one raises TracerArrayConversionError, which
    used to fail-close the Pallas path for the whole process).  Both
    sides therefore run through an AOT lower/compile in a fresh trace
    context, exactly like ops/pallas_group._aot_call.
    """
    global _SELF_CHECK
    if _SELF_CHECK is not None:
        return _SELF_CHECK

    def _aot(fn, *samples):
        sds = [jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
               for x in samples]
        return jax.jit(fn).lower(*sds).compile()(*samples)

    try:
        from ..curves.constants import MNT4753, MNT6753
        rng = np.random.default_rng(0xC105)
        ok = True
        for p in (MNT4753.fq.p, MNT6753.fq.p):
            ctx = L.MontCtx(p)
            bound = (1 << 13) * p
            n = 256
            vals_a, vals_b = [], []
            for i in range(n):
                if i % 5 == 0:
                    va = bound - 1 - i
                elif i % 5 == 1:
                    va = ((1 << 768) - 1) % bound
                else:
                    va = int(rng.integers(1 << 62)) * p % bound + i
                vb = (va * 0x9E3779B97F4A7C15 + i) % bound
                vals_a.append(va)
                vals_b.append(vb)
            a = np.stack([L.int_to_limbs(v) for v in vals_a], axis=1)
            b = np.stack([L.int_to_limbs(v) for v in vals_b], axis=1)
            got = np.asarray(
                _aot(lambda x, y: mont_mul_pallas(ctx, x, y), a, b))
            want = np.asarray(
                _aot(lambda x, y: L._mont_mul_xla(ctx, x, y), a, b))
            ok = ok and np.array_equal(got, want)
        _SELF_CHECK = bool(ok)
        if not ok:  # pragma: no cover - hardware-dependent
            import sys
            print("gpu_groth16_prover_3x_tpu: Pallas CIOS self-check "
                  "MISMATCH; falling back to the XLA scan path",
                  file=sys.stderr, flush=True)
    except Exception as e:  # pragma: no cover - hardware-dependent
        import sys
        print(f"gpu_groth16_prover_3x_tpu: Pallas CIOS unavailable "
              f"({type(e).__name__}: {e}); using the XLA scan path",
              file=sys.stderr, flush=True)
        _SELF_CHECK = False
    return _SELF_CHECK


def pallas_available() -> bool:
    """Default ON for TPU backends, behind a one-time exactness
    self-check (GROTH16_NO_PALLAS=1 opts out; GROTH16_FORCE_PALLAS=1
    skips the backend check for interpret-mode tests)."""
    if os.environ.get("GROTH16_FORCE_PALLAS"):
        return True
    if os.environ.get("GROTH16_NO_PALLAS"):
        return False
    try:
        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:
        return False
    return _self_check()


def mont_mul_pallas(ctx: "L.MontCtx", a, b):
    """Drop-in for limbs.mont_mul on (48, B) canonical operands.

    Pads the flattened batch to the lane tile; trailing garbage lanes are
    computed and discarded.
    """
    interpret = bool(os.environ.get("GROTH16_PALLAS_INTERPRET"))
    shape = a.shape
    a2 = a.reshape(L.NUM_LIMBS, -1)
    b2 = b.reshape(L.NUM_LIMBS, -1)
    n = a2.shape[1]
    # interpret mode (tests) pays per interpreted element: keep the tile
    # minimal; compiled mode wants full lane tiles
    T = n if interpret else min(LANE_TILE, max(n, 128))
    n_pad = ((n + T - 1) // T) * T
    if n_pad != n:
        a2 = jnp.pad(a2, ((0, 0), (0, n_pad - n)))
        b2 = jnp.pad(b2, ((0, 0), (0, n_pad - n)))
    out = _build(ctx.p, ctx.ninv16, n_pad, interpret)(a2, b2)
    return out[:, :n].reshape(shape)
