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


def _kernel_body(p_limbs: tuple, ninv_c: int, bits: int):
    """Build the CIOS kernel for one modulus (constants baked in).

    bits=16: two carry-fold passes per iteration (a 16-bit product fills
    uint32 exactly).  bits=15: ONE fused fold+shift per iteration — two
    15-bit products plus the running lazy limbs stay under 2^32
    (ops/limbs._cios_step15 is the XLA twin of this loop).
    """
    n = len(p_limbs)

    def kernel(a_ref, b_ref, out_ref):
        a = a_ref[...]                        # (n, T) uint32
        b = b_ref[...]
        T = a.shape[1]
        MASKC = jnp.uint32((1 << bits) - 1)  # built inside: kernels must
        # not close over traced module-level constants
        # accumulator rows t[0..n+1] kept as a list of vreg values
        t = [jnp.zeros((T,), jnp.uint32) for _ in range(n + 2)]
        ninv = jnp.uint32(ninv_c)

        def fold(t):
            carry = jnp.zeros((T,), jnp.uint32)
            for j in range(n + 2):
                nxt = t[j] >> bits
                t[j] = (t[j] & MASKC) + carry
                carry = nxt
            return t

        for i in range(n):
            ai = a[i, :]
            # t += ai * b  (lazy; exact in uint32 by the radix's bound)
            for j in range(n):
                t[j] = t[j] + ai * b[j, :]
            if bits == 16:
                t = fold(t)
            m = (t[0] * ninv) & MASKC
            for j in range(n):
                if p_limbs[j]:
                    t[j] = t[j] + m * jnp.uint32(p_limbs[j])
            if bits == 16:
                t = fold(t)
                # shift down one limb (t[0] is exactly 0 now)
                t = t[1:] + [jnp.zeros((T,), jnp.uint32)]
            else:
                # fused fold + shift: out[j] = (t[j+1] & M) + (t[j] >> 15)
                z = jnp.zeros((T,), jnp.uint32)
                t = [((t[j + 1] & MASKC) if j + 1 < n + 2 else z)
                     + (t[j] >> bits) for j in range(n + 2)]
        if bits != 16:
            t = fold(t)   # bring limbs under 2^bits + eps so carries are 0/1
        # final exact canonicalization (Kogge-Stone on n+1 live limbs)
        v = jnp.stack(t[:n + 1], axis=0)   # limbs < 2^(bits+1)
        lo = v & MASKC
        g = v >> bits
        pr = (lo == MASKC).astype(jnp.uint32)
        s = 1
        while s < v.shape[0]:
            gs = jnp.concatenate([jnp.zeros((s, T), jnp.uint32), g[:-s]], 0)
            ps = jnp.concatenate([jnp.zeros((s, T), jnp.uint32), pr[:-s]], 0)
            g = g | (pr & gs)
            pr = pr & ps
            s *= 2
        cin = jnp.concatenate([jnp.zeros((1, T), jnp.uint32), g[:-1]], 0)
        out_ref[...] = ((lo + cin) & MASKC)[:n]

    return kernel


@lru_cache(maxsize=None)
def _build(p: int, ninv_c: int, bits: int, batch: int, interpret: bool):
    n = L.limb_count(bits)
    p_limbs = tuple(int(x) for x in L.int_to_limbs(p, n, bits))
    kernel = _kernel_body(p_limbs, ninv_c, bits)
    T = min(LANE_TILE, batch)
    assert batch % T == 0
    grid = (batch // T,)

    spec = pl.BlockSpec((n, T), lambda i: (0, i),
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
        out_shape=jax.ShapeDtypeStruct((n, batch), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
        **extra,
    )
    return jax.jit(fn)


_SELF_CHECK = {}  # per-radix, lazily computed: True once the kernel proves exact


def _self_check(bits: int = 16) -> bool:
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
    if bits in _SELF_CHECK:
        return _SELF_CHECK[bits]

    def _aot(fn, *samples):
        sds = [jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
               for x in samples]
        return jax.jit(fn).lower(*sds).compile()(*samples)

    try:
        from ..curves.constants import MNT4753, MNT6753
        rng = np.random.default_rng(0xC105)
        ok = True
        for p in (MNT4753.fq.p, MNT6753.fq.p):
            ctx = L.MontCtx(p, bits)
            # adversarial operand bound: near the loose-input headroom
            # (k_a * k_b <= field.MUL_BOUND with canonical limbs)
            bound = (1 << 13) * p
            n = 256
            vals_a, vals_b = [], []
            for i in range(n):
                if i % 5 == 0:
                    va = bound - 1 - i
                elif i % 5 == 1:
                    va = ((1 << ctx.full_bits) - 1) % bound
                else:
                    va = int(rng.integers(1 << 62)) * p % bound + i
                vb = (va * 0x9E3779B97F4A7C15 + i) % bound
                vals_a.append(va)
                vals_b.append(vb)
            a = np.stack([L.int_to_limbs(v, ctx.n, bits) for v in vals_a],
                         axis=1)
            b = np.stack([L.int_to_limbs(v, ctx.n, bits) for v in vals_b],
                         axis=1)
            got = np.asarray(
                _aot(lambda x, y: mont_mul_pallas(ctx, x, y), a, b))
            want = np.asarray(
                _aot(lambda x, y: L._mont_mul_xla(ctx, x, y), a, b))
            ok = ok and np.array_equal(got, want)
        _SELF_CHECK[bits] = bool(ok)
        if not ok:  # pragma: no cover - hardware-dependent
            import sys
            print(f"gpu_groth16_prover_3x_tpu: Pallas CIOS (bits={bits}) "
                  "self-check MISMATCH; falling back to the XLA scan path",
                  file=sys.stderr, flush=True)
    except Exception as e:  # pragma: no cover - hardware-dependent
        import sys
        print(f"gpu_groth16_prover_3x_tpu: Pallas CIOS (bits={bits}) "
              f"unavailable ({type(e).__name__}: {e}); using the XLA scan "
              "path", file=sys.stderr, flush=True)
        _SELF_CHECK[bits] = False
    return _SELF_CHECK[bits]


def pallas_available(bits: int = 16) -> bool:
    """Default ON for TPU backends, behind a one-time per-radix exactness
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
    return _self_check(bits)


def mont_mul_pallas(ctx: "L.MontCtx", a, b):
    """Drop-in for limbs.mont_mul on (ctx.n, B) canonical operands.

    Pads the flattened batch to the lane tile; trailing garbage lanes are
    computed and discarded.
    """
    interpret = bool(os.environ.get("GROTH16_PALLAS_INTERPRET"))
    shape = a.shape
    a2 = a.reshape(ctx.n, -1)
    b2 = b.reshape(ctx.n, -1)
    n = a2.shape[1]
    # interpret mode (tests) pays per interpreted element: keep the tile
    # minimal; compiled mode wants full lane tiles
    T = n if interpret else min(LANE_TILE, max(n, 128))
    n_pad = ((n + T - 1) // T) * T
    if n_pad != n:
        a2 = jnp.pad(a2, ((0, 0), (0, n_pad - n)))
        b2 = jnp.pad(b2, ((0, 0), (0, n_pad - n)))
    out = _build(ctx.p, ctx.ninv, ctx.bits, n_pad, interpret)(a2, b2)
    return out[:, :n].reshape(shape)
