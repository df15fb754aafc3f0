"""Device multi-scalar multiplication: TPU-native Pippenger.

Replaces the reference's GPU MSM (multiexp/reduce.cu: windowed Straus with
C=5 precomputed-multiple tables, :11-76, plus the ec_sum_all reduction
ladder :106-127) with the bucket method the reference itself recommends
(README.md:67-73; CPU spec at libff multiexp.tcc:165-283) — redesigned for
a SIMD/vector machine with no scatter-add and no per-lane control flow:

  window size c = 16, so the 48 *16-bit limbs of a standard-form scalar
  ARE its window digits (zero conversion cost).  Per window:

  1. argsort points by digit (keys), so each bucket is a contiguous run.
  2. Chunked segmented scan: the sorted array is cut into n/S chunks of
     S points processed as S sequential batched steps (batch = n/S lanes);
     a running accumulator adds points of the same key (one complete mixed
     add per point — the same asymptotic work as a serial bucket pass,
     but fully lane-parallel) and emits a finished run total whenever the
     key changes.
  3. Runs crossing chunk borders are stitched with a Hillis-Steele
     carry chain over chunk tails (log-depth, early-exits via while_loop —
     typically 1 step since runs are short for random digits).
  4. Finished run totals scatter into a dense 2^16-slot bucket table
     (unique keys by construction, so a plain scatter-set is exact).
  5. The weighted sum  sum_b b * bucket_b  uses a pre-scaled halving
     recursion: carrying (S' = 2^L * blocksum, W) pairs per block,
     each level costs 3 adds + 1 dbl on half the lanes:
        W   <- W_A + W_B + S'_B
        S'  <- dbl(S'_A + S'_B)
     Total ~4 * 2^16 EC ops per window vs 2 * 2^16 for a serial suffix
     pass, but log-depth and batched (multiexp.tcc:205-277 is the
     sequential spec this reproduces).

  Window sums are recombined on the host by exact Horner doubling —
  mirroring how the reference reads back per-stream results and finishes
  on the CPU (cuda_prover_piecewise.cu:188-200).

All stored tables (points, emissions, buckets) are uint16 limb arrays
(canonical limbs are 16-bit regardless of looseness bound), halving HBM
traffic; compute widens to uint32 on the fly.
"""

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L
from .ec import CurveOps

DEFAULT_C = 16        # window bits: 16 (prod) or 8 (small-n / tests)
DEFAULT_CHUNK = 64    # S: sequential steps per window scan
REDUCE_FORI_WIDTH = 4096  # below this width the halving levels share one trace


# -- host-side data preparation ------------------------------------------------

def pack_affine_rows(coeffs: Sequence[np.ndarray]) -> np.ndarray:
    """[(n,48) limb arrays for x coeffs..., then y coeffs...] -> (n, F) u16.

    Row layout matches the in-kernel unpack: reshape(ncoef, 48) per row.
    """
    return np.concatenate([c.astype(np.uint16) for c in coeffs], axis=1)


def affine_points_to_rows(points, p: int, deg: int) -> np.ndarray:
    """Host affine points [(x, y)] (ints / int-tuples, zero = y==0) ->
    (n, 2*deg*48) uint16 Montgomery rows."""
    from ..utils.serialization import ints_to_u16x48
    n = len(points)
    coeffs = []
    for which in range(2):  # x then y
        for d in range(deg):
            if deg == 1:
                vals = [pt[which] for pt in points]
            else:
                vals = [pt[which][d] for pt in points]
            coeffs.append(ints_to_u16x48(vals, p, to_montgomery=True))
    return pack_affine_rows(coeffs)


def scalars_to_limbs(scalars: Sequence[int], n_pad: int = None) -> np.ndarray:
    """Standard-domain scalars -> (48, n_pad) uint32 digit limbs."""
    n = len(scalars)
    n_pad = n_pad or n
    out = np.zeros((L.NUM_LIMBS, n_pad), dtype=np.uint32)
    for i, s in enumerate(scalars):
        out[:, i] = L.int_to_limbs(int(s))
    return out


def pad_rows(rows: np.ndarray, n_pad: int) -> np.ndarray:
    """Pad with y==0 rows (serialized-infinity convention, weight-0 key)."""
    n, f = rows.shape
    if n == n_pad:
        return rows
    out = np.zeros((n_pad, f), dtype=rows.dtype)
    out[:n] = rows
    return out


def _identity_row(cops: CurveOps) -> np.ndarray:
    """(0 : 1 : 0) as a packed projective u16 row (3*deg*48,)."""
    deg = cops.F.deg
    one = (cops.F.ctx if deg == 1 else cops.F.base.ctx).one_mont[:, 0]
    row = np.zeros(3 * deg * L.NUM_LIMBS, dtype=np.uint16)
    row[deg * L.NUM_LIMBS:(deg + 1) * L.NUM_LIMBS] = one  # Y coeff 0 = R
    return row


# -- the jitted window-scan kernel ----------------------------------------------

def _tree_select(mask, a_list, b_list):
    return tuple(jnp.where(mask, a, b) for a, b in zip(a_list, b_list))


@partial(jax.jit, static_argnums=(0, 3, 4, 6, 7))
def msm_window_sums(cops: CurveOps, scalar_limbs, points_rows,
                    chunk_s: int = DEFAULT_CHUNK, c: int = DEFAULT_C,
                    seg_ids=None, num_msms: int = 1,
                    num_windows: int = None):
    """Window sums of `num_msms` independent fused MSMs over one group.

    scalar_limbs: (48, n) uint32 — standard-domain 16-bit digit limbs
    points_rows:  (n, 2*deg*48) uint16 — Montgomery affine rows
    c: window bits (16: digits ARE the limbs; 8: limb bytes — used at
       small n where the 2^16-bucket reduction would dominate)
    seg_ids: (n,) int32 MSM index per point (None = all zero).  Fusing
       several same-group MSMs (the prover's A/B1/L/H share G1) widens
       every batched stage and runs the sort/scan/scatter machinery once —
       the TPU counterpart of the reference launching B1/B2/L on separate
       CUDA streams (cuda_prover_piecewise.cu:162-167), except fused into
       one kernel instead of three.  The MSM index rides the top bits of
       the bucket key, so runs never merge across MSMs and the weighted
       reduction simply stops at `num_msms` block sums.

    Returns a tuple of 3*deg arrays of shape (768//c, 48, num_msms).
    """
    assert c in (8, 16)
    NB = 1 << c
    F = cops.F
    deg = F.deg
    ncoef = 2 * deg
    n = points_rows.shape[0]
    S = chunk_s
    assert n % S == 0
    C = n // S
    if seg_ids is None:
        seg_ids = jnp.zeros((n,), jnp.int32)
    seg_shift = seg_ids.astype(jnp.int32) * NB

    ident_pt = cops.zero((C,))
    ident_arrs = cops.to_arrays(ident_pt)
    ident_row_np = _identity_row(cops)

    def unpack_affine(block):
        """(ncoef*48, C) u32 -> (x, y) field elements + infinity mask."""
        cs = block.reshape(ncoef, L.NUM_LIMBS, C)
        x = F.from_arrays(tuple(cs[i] for i in range(deg)), 1)
        y = F.from_arrays(tuple(cs[deg + i] for i in range(deg)), 1)
        inf = F.is_zero(y)  # (1, C)
        return x, y, inf

    def lift(block):
        x, y, inf = unpack_affine(block)
        one = F.one((C,))
        zero = F.zero((C,))
        X = F.select(inf, zero, x)
        Y = F.select(inf, one, y)
        Z = F.select(inf, zero, one)
        return (X, Y, Z), (x, y, inf)

    def window_msm(keys):
        order = jnp.argsort(keys)
        ks = jnp.take(keys, order).reshape(C, S)
        pts = jnp.take(points_rows, order, axis=0)          # (n, F) u16
        ptsT = pts.T.astype(jnp.uint32).reshape(ncoef * L.NUM_LIMBS, C, S)
        xs_seq = jnp.moveaxis(ptsT, 2, 0)                   # (S, F, C)
        ks_seq = ks.T                                        # (S, C)

        # -- step 0: initialize run accumulator ---------------------------
        # (initial carries derive from data so their varying axes match the
        # body outputs under shard_map)
        acc0, _ = lift(xs_seq[0])
        acc0_arrs = cops.to_arrays(cops.normalize_k(acc0))
        first0 = tuple(i + a * 0 for i, a in zip(ident_arrs, acc0_arrs))
        carry0 = (
            acc0_arrs,
            ks_seq[0],
            first0,                                          # first partial
            ks_seq[0] != ks_seq[0],                          # has_change
        )

        def step(carry, xs):
            accA, prevk, firstA, haschg = carry
            block, kj = xs
            acc = cops.from_arrays(accA)
            lifted, (x, y, inf) = lift(block)
            summ = cops.mixed_add(acc, x, y, q_inf=inf)
            same = (kj == prevk)[None, :]
            new_acc = cops.select(same, summ, lifted)
            change = ~same[0]
            emit_valid = change & haschg
            first_now = change & (~haschg)
            newfirst = _tree_select(first_now[None, :], accA, firstA)
            new_carry = (
                cops.to_arrays(cops.normalize_k(new_acc)),
                kj,
                newfirst,
                haschg | change,
            )
            # resolve lazy carries before narrowing to uint16 storage
            emit = (tuple(L.canon(a).astype(jnp.uint16) for a in accA),
                    prevk, emit_valid)
            return new_carry, emit

        (tailA, tail_key, firstA, haschg), (em_vals, em_keys, em_valid) = (
            jax.lax.scan(step, carry0, (xs_seq[1:], ks_seq[1:])))

        head_key = ks_seq[0]
        uniform = ~haschg

        # -- cross-chunk carry chain (Hillis-Steele with early exit) -------
        def shift_arrs(arrs, fills, s):
            out = []
            for a, fill in zip(arrs, fills):
                comb = jnp.concatenate([fill, a], axis=-1)
                out.append(jax.lax.dynamic_slice_in_dim(
                    comb, C - s, C, axis=-1))
            return tuple(out)

        link = jnp.concatenate([
            jnp.zeros((1,), jnp.bool_),
            tail_key[:-1] == head_key[1:],
        ])
        tail_shift = shift_arrs(tailA, ident_arrs, 1)
        val0 = _tree_select(link[None, :], tail_shift, ident_arrs)
        prop0 = link & jnp.concatenate(
            [jnp.zeros((1,), jnp.bool_), uniform[:-1]])

        def carry_cond(st):
            s, _, prop = st
            return (s < C) & jnp.any(prop)

        def carry_body(st):
            s, val, prop = st
            val_s = shift_arrs(val, ident_arrs, s)
            prop_s = shift_arrs((prop[None, :].astype(jnp.uint32),),
                                (jnp.zeros((1, C), jnp.uint32),), s)[0][0] > 0
            comb = cops.add(cops.from_arrays(val),
                            cops.from_arrays(val_s))
            val = _tree_select(prop[None, :],
                               cops.to_arrays(cops.normalize_k(comb)), val)
            return (s * 2, val, prop & prop_s)

        _, carry_val, _ = jax.lax.while_loop(
            carry_cond, carry_body, (jnp.int32(1), val0, prop0))

        # -- boundary emissions --------------------------------------------
        carry_pt = cops.from_arrays(carry_val)
        first_total = cops.add(cops.from_arrays(firstA), carry_pt)
        tail_with = cops.add(cops.from_arrays(tailA), carry_pt)
        tail_total = cops.select(uniform[None, :], tail_with,
                                 cops.from_arrays(tailA))
        link_next = jnp.concatenate([
            tail_key[:-1] == head_key[1:],
            jnp.zeros((1,), jnp.bool_),
        ])
        first_valid = haschg
        tail_valid = ~link_next

        # -- scatter run totals into the dense bucket table -----------------
        F3 = 3 * deg * L.NUM_LIMBS

        def to_rows(arrs):  # tuple of (..., 48, C) -> (..., C, F3) u16
            stacked = jnp.concatenate(
                [jnp.swapaxes(a, -2, -1)[..., None, :]
                 .reshape(a.shape[:-2] + (C, L.NUM_LIMBS))
                 for a in arrs], axis=-1)
            return stacked.astype(jnp.uint16)

        em_rows = to_rows(em_vals).reshape(-1, F3)           # ((S-1)*C, F3)
        first_rows = to_rows(tuple(
            L.canon(a).astype(jnp.uint16)
            for a in cops.to_arrays(cops.normalize_k(first_total))))
        first_rows = first_rows.reshape(-1, F3)
        tail_rows = to_rows(tuple(
            L.canon(a).astype(jnp.uint16)
            for a in cops.to_arrays(cops.normalize_k(tail_total))))
        tail_rows = tail_rows.reshape(-1, F3)

        dummy = jnp.int32(num_msms * NB)
        keys_all = jnp.concatenate([
            jnp.where(em_valid, em_keys, dummy).reshape(-1),
            jnp.where(first_valid, head_key, dummy),
            jnp.where(tail_valid, tail_key, dummy),
        ])
        vals_all = jnp.concatenate([em_rows, first_rows, tail_rows], axis=0)

        NT = num_msms * NB
        init = jnp.broadcast_to(jnp.asarray(ident_row_np), (NT + 1, F3))
        buckets = init.at[keys_all].set(vals_all)[:NT]        # (NT, F3) u16

        # -- weighted bucket reduction: per-MSM sum_b b * bucket_b -----------
        barrs = buckets.T.astype(jnp.uint32).reshape(
            3 * deg, L.NUM_LIMBS, NT)
        Sp = cops.from_arrays(tuple(barrs[i] for i in range(3 * deg)),
                              lb=0xFFFF)
        W0_arrs = cops.to_arrays(cops.zero((NT,)))
        W = cops.from_arrays(tuple(
            w + b * 0 for w, b in zip(W0_arrs, cops.to_arrays(Sp))),
            k=1, lb=0xFFFF)

        def halves(P, m):
            arrs = cops.to_arrays(P)
            A = tuple(a.reshape(a.shape[:-1] + (m // 2, 2))[..., 0]
                      for a in arrs)
            B = tuple(a.reshape(a.shape[:-1] + (m // 2, 2))[..., 1]
                      for a in arrs)
            return cops.from_arrays(A), cops.from_arrays(B)

        def level(Sp, W, m):
            # adjacent buckets pair up; A = even index (lower weight)
            Sa, Sb = halves(cops.normalize_k(Sp), m)
            Wa, Wb = halves(cops.normalize_k(W), m)
            W = cops.add(cops.add(Wa, Wb), Sb)
            Sp = cops.dbl(cops.add(Sa, Sb))
            return Sp, W

        # wide levels: python-unrolled (bulk of the work, full batch);
        # the halving stops at num_msms slots (one weighted sum per MSM)
        m = NT
        while m > max(REDUCE_FORI_WIDTH, 2 * num_msms):
            Sp, W = level(Sp, W, m)
            m //= 2

        # narrow tail: ONE traced body iterated with fixed-width arrays.
        # Each iteration halves the active prefix; lanes beyond it hold
        # junk that never feeds back into the prefix (every complete-
        # formula op is total, so junk is harmless).
        def pad_back(P):
            return tuple(
                jnp.concatenate([a, a], axis=-1)[..., :m]
                for a in cops.to_arrays(P))

        def tail_body(_, st):
            sp_arrs, w_arrs = st
            Sp, W = level(cops.from_arrays(sp_arrs),
                          cops.from_arrays(w_arrs), m)
            return (pad_back(Sp), pad_back(W))

        st = (cops.to_arrays(cops.normalize_k(Sp)),
              cops.to_arrays(cops.normalize_k(W)))
        iters = (m // num_msms).bit_length() - 1
        st = jax.lax.fori_loop(0, iters, tail_body, st)
        W = cops.from_arrays(tuple(a[..., :num_msms] for a in st[1]))
        return cops.to_arrays(cops.normalize_k(W))      # each (48, num_msms)

    def all_windows(scalar_limbs):
        limbs = scalar_limbs.astype(jnp.int32)                # (48, n)
        if c == 16:
            keys_all = limbs
        else:
            # byte digits, little-endian within each 16-bit limb
            keys_all = jnp.stack(
                [limbs & 0xFF, limbs >> 8], axis=1).reshape(
                    2 * L.NUM_LIMBS, -1)

        if num_windows is not None:
            # structural smoke runs (dryrun): process only the low
            # windows — the kernel is identical, the result partial
            keys_all = keys_all[:num_windows]

        def body(_, digits):
            return 0, window_msm(digits + seg_shift)

        _, Ws = jax.lax.scan(body, 0, keys_all)
        return Ws

    return all_windows(scalar_limbs)


# -- host finalization ----------------------------------------------------------

def window_sums_to_host(cops: CurveOps, ws, host_group, p: int,
                        num_msms: int = 1):
    """Stacked device window sums (nwin, 48, num_msms) -> per-MSM lists of
    host projective points: out[msm][window]."""
    from ..curves.constants import R
    deg = cops.F.deg
    nwin = jnp.asarray(ws[0]).shape[0]
    ctx = cops.F.ctx if deg == 1 else cops.F.base.ctx
    arrs = [np.asarray(L.to_canonical(
        ctx,
        jnp.moveaxis(jnp.asarray(a), 1, 0).reshape(L.NUM_LIMBS, -1),
        cops.coord_k))
        for a in ws]   # each (48, nwin * num_msms)
    rinv = pow(R, -1, p)
    out = []
    for msm_i in range(num_msms):
        pts = []
        for w in range(nwin):
            col = w * num_msms + msm_i
            coords = []
            for cidx in range(3):
                if deg == 1:
                    coords.append(L.limbs_to_int(
                        arrs[cidx][:, col:col + 1]) * rinv % p)
                else:
                    coords.append(tuple(L.limbs_to_int(
                        arrs[cidx * deg + d][:, col:col + 1])
                        * rinv % p for d in range(deg)))
            pts.append(tuple(coords))
        out.append(pts)
    return out if num_msms > 1 else out[0]


def finalize_msm(host_group, window_pts) -> tuple:
    """Horner recombination: result = sum_w 2^(cw) * W_w, exact on host.

    Device points are homogeneous projective (X:Y:Z); the host oracle group
    is Jacobian, so convert via affine (X/Z, Y/Z).
    """
    def to_host(pt):
        x, y, z = pt
        if host_group.deg == 1:
            if z % host_group.p == 0:
                return host_group.zero
            zi = pow(z, -1, host_group.p)
            return host_group.from_affine((x * zi % host_group.p,
                                           y * zi % host_group.p))
        from ..host import field as HF
        p = host_group.p
        if all(c % p == 0 for c in z):
            return host_group.zero
        zi = HF.e_inv(z, p, host_group.alpha)
        return host_group.from_affine((
            HF.e_mul(x, zi, p, host_group.alpha),
            HF.e_mul(y, zi, p, host_group.alpha)))

    nwin = len(window_pts)
    cbits = 768 // nwin
    acc = host_group.zero
    for w in range(nwin - 1, -1, -1):
        for _ in range(cbits):
            acc = host_group.dbl(acc)
        acc = host_group.add(acc, to_host(window_pts[w]))
    return acc


def msm_device(cops: CurveOps, host_group, scalars: Sequence[int],
               points, p: int, chunk_s: int = DEFAULT_CHUNK,
               c: int = DEFAULT_C):
    """End-to-end device MSM with host inputs/outputs (test/oracle path)."""
    n = len(scalars)
    n_pad = max(chunk_s, ((n + chunk_s - 1) // chunk_s) * chunk_s)
    rows = pad_rows(
        affine_points_to_rows(points, p, cops.F.deg), n_pad)
    limbs = scalars_to_limbs(scalars, n_pad)
    ws = msm_window_sums(cops, jnp.asarray(limbs), jnp.asarray(rows),
                         chunk_s, c)
    pts = window_sums_to_host(cops, ws, host_group, p)
    return finalize_msm(host_group, pts)
