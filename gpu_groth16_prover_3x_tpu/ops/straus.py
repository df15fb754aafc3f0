"""Table-based windowed MSM (Straus) over preprocessed multiples.

TPU-native consumption of the reference's preprocessed tables
(`<CURVE>_preprocessed`): rows [P..], [2P..], ..., [(2^C-1)P..] with
C = 5 (libsnark/main.cpp:248-339, consumed at
cuda_prover_piecewise.cu:125-141, kernel multiexp/reduce.cu:11-76).

The CUDA kernel walks windows top-down per point tile, doubling C times
between windows and indexing the multiples row by window digit.  The TPU
redesign keeps the digit-indexed row lookup — the table's whole purpose —
but batches it the VPU way:

  per 5-bit window w (a lax.scan over 151 windows):
    1. extract the cross-limb digit d_i of every scalar (two-limb
       gather + shifts, all vectorized),
    2. gather table rows (d_i - 1)*n + i  (digit 0 -> identity),
    3. tree-reduce the n lifted points with complete projective adds
       (log2(n) batched levels at shrinking widths).

  Window sums return to the host and recombine with the same exact
  Horner doubling as the Pippenger path (finalize_msm, cbits=5) — one
  shared epilogue for both kernels.

Work is ~153/48 of the Pippenger kernel's scan (3x more group adds), but
with no sort, no segmented scan and no bucket reduction — the tradeoff
the reference made on the GPU.  The TPU prover defaults to Pippenger;
tables are consumed when `<CURVE>_preprocessed` is present (SURVEY §7.1:
"tables remain supported ... but become optional").
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L
from .ec import CurveOps

STRAUS_C = 5                      # window bits baked into the table format
SCALAR_BITS = 753


def num_windows(c: int = STRAUS_C) -> int:
    return (SCALAR_BITS + c - 1) // c


@partial(jax.jit, static_argnums=(0, 3))
def straus_window_sums(cops: CurveOps, scalar_limbs, table_rows,
                       c: int = STRAUS_C):
    """Digit-indexed table MSM: per-window sums over one point set.

    scalar_limbs: (48, n) uint32 standard-domain 16-bit digit limbs
    table_rows:   ((2^c - 1) * n, 2*deg*48) uint16 Montgomery affine
                  rows, row-major by multiple: row k*n + i = (k+1)*P_i
    Returns a tuple of 3*deg arrays of shape (nwin, 48, 1) — the same
    layout as msm_window_sums(num_msms=1), finalized by
    window_sums_to_host + finalize_msm(cbits=c).
    """
    F = cops.F
    deg = F.deg
    ncoef = 2 * deg
    nmul = (1 << c) - 1
    n = table_rows.shape[0] // nmul
    assert table_rows.shape[0] == nmul * n
    nwin = num_windows(c)

    # pad the scalar limbs one row up so the two-limb digit gather at the
    # top window never reads out of bounds (bit 752 lives in limb 47)
    limbs49 = jnp.concatenate(
        [scalar_limbs.astype(jnp.uint32),
         jnp.zeros((1,) + scalar_limbs.shape[1:], jnp.uint32)], axis=0)

    # identity row for digit-0 lanes: the table holds AFFINE rows, where
    # an all-zero row (y == 0) encodes infinity (serialization.py), and
    # lift() maps it to the projective identity
    zero_row = jnp.zeros((ncoef * cops.nq,), jnp.uint16)

    # power-of-two padding for the tree reduction
    n_pad = 1 << max(1, (n - 1).bit_length())
    iota = jnp.arange(n, dtype=jnp.int32)

    def lift(rows_u16):
        """(m, F) u16 affine rows -> projective point batch (m,)."""
        m = rows_u16.shape[0]
        cs = rows_u16.T.astype(jnp.uint32).reshape(
            ncoef, cops.nq, m)
        x = F.from_arrays(tuple(cs[i] for i in range(deg)), 1)
        y = F.from_arrays(tuple(cs[deg + i] for i in range(deg)), 1)
        inf = F.is_zero(y)
        one = F.one((m,))
        zero = F.zero((m,))
        X = F.select(inf, zero, x)
        Y = F.select(inf, one, y)
        Z = F.select(inf, zero, one)
        return (X, Y, Z)

    def win_body(carry, w):
        bitpos = w * c
        j = bitpos >> 4
        off = (bitpos & 15).astype(jnp.uint32)
        two = jax.lax.dynamic_slice_in_dim(limbs49, j, 2, axis=0)
        lo = two[0] >> off
        hi = two[1] << (jnp.uint32(16) - off)
        digits = ((lo | hi) & jnp.uint32(nmul)).astype(jnp.int32)  # (n,)

        idx = jnp.where(digits > 0, (digits - 1) * n + iota, 0)
        rows = jnp.take(table_rows, idx, axis=0)          # (n, F)
        rows = jnp.where((digits > 0)[:, None], rows, zero_row[None, :])
        if n_pad != n:
            rows = jnp.concatenate([
                rows, jnp.broadcast_to(zero_row, (n_pad - n,
                                                  rows.shape[1]))], axis=0)
        pts = lift(rows)

        # tree reduction: log2(n_pad) halving levels of complete adds
        m_live = n_pad
        while m_live > 1:
            arrs = cops.to_arrays(cops.normalize_k(pts))
            A = cops.from_arrays(tuple(
                a.reshape(a.shape[:-1] + (-1, 2))[..., 0] for a in arrs))
            B = cops.from_arrays(tuple(
                a.reshape(a.shape[:-1] + (-1, 2))[..., 1] for a in arrs))
            pts = cops.add(A, B)
            m_live //= 2

        out = tuple(L.canon(a, cops.qbits)
                    for a in cops.to_arrays(cops.normalize_k(pts)))
        return carry, out

    _, sums = jax.lax.scan(win_body, 0,
                           jnp.arange(nwin, dtype=jnp.int32))
    # sums: tuple of (nwin, 48, 1) u32
    return sums


def msm_straus_device(cops: CurveOps, host_group, scalars, table_rows_np,
                      p: int, c: int = STRAUS_C):
    """End-to-end table MSM with host inputs/outputs (test/oracle path)."""
    from .msm import finalize_msm, scalars_to_limbs, window_sums_to_host
    limbs = scalars_to_limbs(scalars)
    ws = straus_window_sums(cops, jnp.asarray(limbs),
                            jnp.asarray(table_rows_np), c)
    pts = window_sums_to_host(cops, ws, p)
    return finalize_msm(host_group, pts, c)
