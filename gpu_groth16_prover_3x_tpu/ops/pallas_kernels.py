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

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L.NUM_LIMBS, batch), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )
    return jax.jit(fn)


def pallas_available() -> bool:
    """Opt-in for now (GROTH16_USE_PALLAS=1 on TPU, or FORCE for interpret
    tests); flips to TPU-default once validated on hardware."""
    if os.environ.get("GROTH16_FORCE_PALLAS"):
        return True
    if not os.environ.get("GROTH16_USE_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


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
