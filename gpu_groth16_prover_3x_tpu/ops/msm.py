"""Device multi-scalar multiplication: TPU-native Pippenger.

Replaces the reference's GPU MSM (multiexp/reduce.cu: windowed Straus with
C=5 precomputed-multiple tables, :11-76, plus the ec_sum_all reduction
ladder :106-127) with the bucket method the reference itself recommends
(README.md:67-73; CPU spec at libff multiexp.tcc:165-283) — redesigned for
a SIMD/vector machine with no scatter-add and no per-lane control flow:

  window size c = 16, so the 48 *16-bit limbs of a standard-form scalar
  ARE its window digits (zero conversion cost).  Windows are processed
  in BLOCKS that ride the batch dims end to end (one sort/scan/scatter
  pass covers a whole block; one joint reduction covers another), so
  lane width — not loop depth — absorbs the work:

  1. argsort points by digit per window (batched sort over the block),
     so each bucket is a contiguous run.
  2. Chunked segmented scan: the sorted arrays are cut into n/S chunks
     of S points processed as S sequential batched steps (batch =
     wb * n/S lanes); a running accumulator adds points of the same key
     (one complete mixed add per point — the same asymptotic work as a
     serial bucket pass, but fully lane-parallel) and emits a finished
     run total whenever the key changes.
  3. Runs crossing chunk borders are stitched with a Hillis-Steele
     carry chain over chunk tails (log-depth, early-exits via while_loop —
     typically 1 step since runs are short for random digits).
  4. Finished run totals scatter into dense per-window bucket tables
     (unique keys by construction, so a plain scatter-set is exact).
  5. The weighted sum  sum_b b * bucket_b  uses a pre-scaled halving
     recursion batched across a GROUP of windows jointly: carrying
     (S' = 2^L * blocksum, W) pairs per block, each level costs 3 adds
     + 1 dbl on half the lanes:
        W   <- W_A + W_B + S'_B
        S'  <- dbl(S'_A + S'_B)
     (multiexp.tcc:205-277 is the sequential spec this reproduces).
     Cross-window batching keeps late levels wide: per-window reduction
     at shrinking widths was ~50% of MSM wall time at 2^18-2^20 despite
     ~10x less arithmetic than the scan.

  Window sums are recombined on the host by exact Horner doubling —
  mirroring how the reference reads back per-stream results and finishes
  on the CPU (cuda_prover_piecewise.cu:188-200).

All stored tables (points, emissions, buckets) are uint16 limb arrays
(canonical limbs are 16-bit regardless of looseness bound), halving HBM
traffic; compute widens to uint32 on the fly.
"""

from functools import lru_cache, partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L
from .ec import CurveOps

DEFAULT_C = 16        # window bits: 16 (prod) or 8 (small-n / tests)
# S: sequential steps per window scan.  128 measured fastest at 2^20 on
# v5e (129.6k pps vs 127.7k @64 vs 122.3k @32, .scratch/bench_r5b_msm.log
# — fewer, wider step kernels amortize the per-kernel fixed cost).
DEFAULT_CHUNK = 128
REDUCE_FORI_WIDTH = 4096  # below this width the halving levels share one trace
# target bucket lanes per joint reduction group: (S', W) carry 6 u32
# coordinate arrays of (48, wb*NT) -> ~4.6 KB/lane transient; 2^19 lanes
# keeps the reduction under ~2.5 GB while still ~100x wider than
# per-window shrinking levels
REDUCE_GROUP_LANES = 1 << 19
# flat lanes per chunked reduction-level op: a stacked mont_mul's
# (50, 13*X/2) u32 scan accumulator must stay VMEM-resident (~2^15
# lanes -> ~43 MB stacked) or the 48 CIOS iterations thrash HBM
LEVEL_CHUNK = 1 << 15


# -- host-side data preparation ------------------------------------------------

def pack_affine_rows(coeffs: Sequence[np.ndarray]) -> np.ndarray:
    """[(n,48) limb arrays for x coeffs..., then y coeffs...] -> (n, F) u16.

    Row layout matches the in-kernel unpack: reshape(ncoef, 48) per row.
    """
    return np.concatenate([c.astype(np.uint16) for c in coeffs], axis=1)


def affine_points_to_rows(points, p: int, deg: int,
                          bits: int = None) -> np.ndarray:
    """Host affine points [(x, y)] (ints / int-tuples, zero = y==0) ->
    (n, 2*deg*nq) uint16 Montgomery rows at the Fq coordinate radix
    (bits=None reads GROTH16_FQ_RADIX; 16 -> the serialized R = 2^768
    layout, 15 -> 52 x 15-bit limbs in Montgomery R' = 2^780 form)."""
    from ..utils.serialization import ints_to_u16x48
    from .field import fq_radix
    if bits is None:
        bits = fq_radix()
    coeffs = []
    for which in range(2):  # x then y
        for d in range(deg):
            if deg == 1:
                vals = [pt[which] for pt in points]
            else:
                vals = [pt[which][d] for pt in points]
            if bits == 16:
                coeffs.append(ints_to_u16x48(vals, p, to_montgomery=True))
            else:
                ctx = L.MontCtx(p, bits)
                coeffs.append(np.stack([
                    L.int_to_limbs(v * ctx.r % p, ctx.n, bits)
                    for v in vals]).astype(np.uint16))
    return pack_affine_rows(coeffs)


def scalars_to_limbs(scalars: Sequence[int], n_pad: int = None) -> np.ndarray:
    """Standard-domain scalars -> (48, n_pad) uint32 digit limbs."""
    n = len(scalars)
    n_pad = n_pad or n
    out = np.zeros((L.NUM_LIMBS, n_pad), dtype=np.uint32)
    for i, s in enumerate(scalars):
        out[:, i] = L.int_to_limbs(int(s))
    return out


def rows_to_radix15(p: int, rows: np.ndarray) -> np.ndarray:
    """Serialized affine rows (n, ncoef*48) u16 (Montgomery R = 2^768)
    -> radix-15 rows (n, ncoef*52) u16 (Montgomery R' = 2^780).

    Host side is a pure bit regroup (u16x48_to_u15x52); the domain shift
    x*R -> x*R' is ONE batched device Montgomery multiply by
    c = R'^2 / R mod p (mont_mul'(x*R, c) = x*R*c/R' = x*R'), followed
    by a conditional subtract so coordinates stay canonical below p
    (the y == 0 infinity encoding and k=1 bounds depend on it; an exact
    0 input stays exactly 0 through REDC).
    """
    import jax
    from ..utils import serialization as ser
    ctx = L.MontCtx(p, 15)
    n = rows.shape[0]
    if n == 0:
        return np.zeros((0, rows.shape[1] * 52 // 48), np.uint16)
    ncoef = rows.shape[1] // 48
    r52 = ser.u16x48_to_u15x52(np.asarray(rows).reshape(n, ncoef, 48))
    cols = jnp.asarray(np.moveaxis(r52, 2, 0).reshape(52, n * ncoef)
                       .astype(np.uint32))
    c = ctx.r * ctx.r % p * pow(1 << 768, -1, p) % p
    c_limbs = jnp.asarray(L.int_to_limbs(c, ctx.n, 15)[:, None])
    out = L.cond_sub_kp(ctx, L.mont_mul(ctx, cols, c_limbs), 1)
    out_np = np.asarray(jax.device_get(out)).astype(np.uint16)
    return np.ascontiguousarray(
        np.moveaxis(out_np.reshape(52, n, ncoef), 0, 2)
        .reshape(n, ncoef * 52))


def stage_rows_device(p: int, rows: np.ndarray, bits: int):
    """Upload serialized (radix-16) affine rows and return DEVICE rows
    at the requested Fq radix.

    Returns (staged, finish) where `staged` is the uploaded device array
    and `finish()` completes any device-side radix conversion and
    returns the final (n, ncoef*nq) u16 device rows.  The two-phase
    shape lets a caller upload EVERY row array first — while the axon
    link is still fast (its bandwidth collapses ~20x after the first
    kernel execution, see msm_window_sums_streamed) — and only then run
    the conversion kernels.  At radix 16 the staged bytes ARE the rows.
    Unlike rows_to_radix15, the converted rows never round-trip back to
    the host.
    """
    if bits == 16:
        d = jnp.asarray(rows)
        return d, lambda: d
    n = rows.shape[0]
    ncoef = rows.shape[1] // 48
    staged = jnp.asarray(np.asarray(rows))   # raw serialized u16 upload

    def finish():
        return _r15_convert_jit(p, ncoef)(staged)

    return staged, finish


@lru_cache(maxsize=None)
def _r15_convert_jit(p: int, ncoef: int):
    """Jitted device twin of rows_to_radix15's domain shift: raw
    bit-regrouped 52-limb rows (R domain) -> canonical R' = 2^780
    Montgomery rows, entirely on device.

    Input: RAW serialized rows (n, ncoef*48) u16 — the 16->15-bit limb
    regroup happens on device too (52 shift/or ops; the numpy version
    cost minutes of contended host time per 2^20 prove).

    Lanes beyond 2^21 are processed through lax.map in bounded column
    blocks: one flat CIOS over the 2^20-prove's 8.4M lanes holds
    several (54, lanes) uint32 scan buffers — enough to
    RESOURCE_EXHAUSTED the chip's HBM on its own.  Zero padding is
    exact (0 * c = 0 through REDC) and sliced back off.
    """
    ctx = L.MontCtx(p, 15)
    c = ctx.r * ctx.r % p * pow(1 << 768, -1, p) % p
    c_np = L.int_to_limbs(c, ctx.n, 15)[:, None]
    CH = 1 << 21

    @jax.jit
    def convert(rows48):
        n = rows48.shape[0]
        lanes = n * ncoef
        cols48 = jnp.moveaxis(
            rows48.reshape(n, ncoef, 48), 2, 0).reshape(
                48, lanes).astype(jnp.uint32)
        # 48 x 16-bit -> 52 x 15-bit limb regroup (device twin of
        # serialization.u16x48_to_u15x52)
        outs = []
        for j in range(52):
            bitpos = 15 * j
            k, s = bitpos >> 4, bitpos & 15
            lo = cols48[k] >> s
            hi = (cols48[k + 1] << (16 - s)) if (s and k + 1 < 48) else 0
            outs.append((lo | hi) & 0x7FFF)
        cols = jnp.stack(outs, axis=0).astype(jnp.uint16)  # (52, lanes)
        c_dev = jnp.asarray(c_np)

        def shift(b):
            return L.cond_sub_kp(
                ctx, L.mont_mul(ctx, b.astype(jnp.uint32), c_dev),
                1).astype(jnp.uint16)

        if lanes > CH:
            nch = -(-lanes // CH)
            cols = jnp.pad(cols, ((0, 0), (0, nch * CH - lanes)))
            blocks = cols.reshape(52, nch, CH).transpose(1, 0, 2)
            out = jax.lax.map(shift, blocks)
            out = out.transpose(1, 0, 2).reshape(52, nch * CH)[:, :lanes]
        else:
            out = shift(cols)
        return jnp.moveaxis(
            out.reshape(52, n, ncoef), 0, 2).reshape(n, ncoef * 52)

    return convert


def rows_at_fq_radix(p: int, rows: np.ndarray) -> np.ndarray:
    """Bring serialized (radix-16) rows to the active Fq radix.

    Row widths are tagged explicitly by divisibility: ncoef*48 (radix 16,
    ncoef = 2/4/6 for affine deg 1-3) vs ncoef*52 (radix 15) — the two
    sets are disjoint for every supported ncoef, and anything else is a
    malformed row array and raises rather than passing through."""
    from .field import fq_radix
    w = rows.shape[1]
    if fq_radix() == 16:
        if w % 48:
            raise ValueError(f"radix-16 rows must be ncoef*48 wide, got {w}")
        return rows
    if w % 52 == 0 and w % 48 != 0:
        return rows          # already radix-15
    if w % 48 == 0 and w % 52 != 0:
        return rows_to_radix15(p, rows)
    raise ValueError(f"ambiguous/malformed row width {w} (not ncoef*48 "
                     f"xor ncoef*52)")


def pad_rows(rows: np.ndarray, n_pad: int) -> np.ndarray:
    """Pad with y==0 rows (serialized-infinity convention, weight-0 key)."""
    n, f = rows.shape
    if n == n_pad:
        return rows
    out = np.zeros((n_pad, f), dtype=rows.dtype)
    out[:n] = rows
    return out


def _identity_row(cops: CurveOps) -> np.ndarray:
    """(0 : 1 : 0) as a packed projective u16 row (3*deg*nq,)."""
    deg, nq = cops.F.deg, cops.nq
    one = cops.fq_ctx.one_mont[:, 0]
    row = np.zeros(3 * deg * nq, dtype=np.uint16)
    row[deg * nq:(deg + 1) * nq] = one  # Y coeff 0 = R
    return row


# -- the jitted window-scan kernel ----------------------------------------------

def _tree_select(mask, a_list, b_list):
    return tuple(jnp.where(mask, a, b) for a, b in zip(a_list, b_list))


def _window_kernel_parts(cops: CurveOps, n: int, chunk_s: int, c: int,
                         num_msms: int, num_windows, signed: bool = False):
    """Build the (scan_phase, reduce_phase) kernel pair for one config.

    The pair is composed two ways: fused into one XLA module on TPU
    (cross-phase fusion, one dispatch — `_msm_window_sums_fused`), or as
    two separately-jitted modules on the CPU backend, where XLA:CPU's
    whole-module optimization cost is superlinear and one fused deg-3
    module blows past 10 GB of compiler RSS (`msm_window_sums` picks).

    `signed`: signed window digits in [-2^(c-1), 2^(c-1)-1] (the CPU
    Pippenger's 2s-helper trick, libff multiexp.tcc's window halving
    analog): a vectorized borrow ripple recodes the unsigned digits, and
    negative digits add the NEGATED point (affine y -> p - y) into the
    |digit| bucket.  Buckets shrink to 2^(c-1) per (window, msm) — half
    the reduction work and scatter-table memory — with bucket b holding
    magnitude b+1; the weight shift is free: the halving recursion's W
    accumulator starts at the buckets themselves instead of zero, which
    adds exactly sum_b bucket_b to the weighted total.
    """
    assert c in (4, 8, 16)
    assert not (signed and num_windows is not None), (
        "partial-window (dryrun) runs require unsigned digits: a signed "
        "low-window partial sum differs from the masked-scalar oracle")
    F = cops.F
    deg = F.deg
    nq, qbits = cops.nq, cops.qbits    # coordinate limb geometry
    ncoef = 2 * deg
    S = chunk_s
    assert n % S == 0
    C = n // S

    ident_row_np = _identity_row(cops)
    NBH = 1 << (c - 1)
    NB = NBH if signed else (1 << c)   # buckets per (window, msm)
    SEG_SPAN = (NBH + 1) if signed else NB  # sort-key span per (window, msm)
    NT = num_msms * NB                 # bucket-table rows per window
    NT_sort = num_msms * SEG_SPAN      # sort-key span per window
    F3 = 3 * deg * nq

    def unpack_affine(block, batch=None):
        """(ncoef*nq, *batch) u32 -> (x, y) field elements + inf mask.

        `batch` defaults to the block's own trailing shape so the trace
        is batch-size-polymorphic — pallas_group.maybe_fuse re-traces
        step_core at lane-tile width, not the full scan width."""
        if batch is None:
            batch = block.shape[1:]
        cs = block.reshape((ncoef, nq) + batch)
        x = F.from_arrays(tuple(cs[i] for i in range(deg)), 1)
        y = F.from_arrays(tuple(cs[deg + i] for i in range(deg)), 1)
        inf = F.is_zero(y)  # (1, *batch)
        return x, y, inf

    def lift(block, batch=None, sign=None):
        if batch is None:
            batch = block.shape[1:]
        x, y, inf = unpack_affine(block, batch)
        one = F.one(batch)
        zero = F.zero(batch)
        if sign is not None:
            # negative digit: add -P = (x, p - y).  Infinity (y == 0)
            # is unaffected — the inf mask was taken first and selects
            # the negated-y lane away below / in mixed_add.
            y = F.select(sign[None], F.sub(zero, y), y)
        X = F.select(inf, zero, x)
        Y = F.select(inf, one, y)
        Z = F.select(inf, zero, one)
        return (X, Y, Z), (x, y, inf)

    def group_msm(keys_grp, points_rows, signs_grp=None):
        """(wb, n) global bucket keys -> (wb*NT, F3) u16 bucket tables.

        A whole block of windows runs through ONE sort/scan/stitch/
        scatter pass: the window axis is FLATTENED into the chunk batch
        (B = wb*C lanes), so the sequential chunk scan costs S steps
        regardless of how many windows the block holds, and every field
        op stays a 2-D (48, B) tensor — a leading window dim of 1 or 8
        as a separate axis would strand the VPU sublane dimension.
        Window blocks are contiguous in the flat batch, so the boundary
        stitch just views (48, B) as (48, wb, C) for its chunk shifts.
        """
        wb = keys_grp.shape[0]
        B = wb * C
        batch = (B,)
        ident_arrs = cops.to_arrays(cops.zero(batch))

        order = jnp.argsort(keys_grp, axis=-1)               # (wb, n)
        import os as _os
        if _os.environ.get("GROTH16_MSM_SORT_ONLY"):
            # profiling knob: run only the argsort + gather, return junk
            # tables carrying a data checksum (defeats DCE)
            s = (jnp.take_along_axis(keys_grp, order, axis=-1)
                 .astype(jnp.uint32).sum()
                 + jnp.take(points_rows, order, axis=0)
                 .astype(jnp.uint32).sum()).astype(jnp.uint16)
            return (jnp.broadcast_to(jnp.asarray(ident_row_np),
                                     (wb * NT, F3)) + s)
        ks = jnp.take_along_axis(keys_grp, order, axis=-1) \
                .reshape(B, S)
        pts = jnp.take(points_rows, order, axis=0)           # (wb, n, F)
        ptsT = jnp.moveaxis(pts, 2, 0).astype(jnp.uint32) \
                  .reshape(ncoef * nq, B, S)
        xs_seq = jnp.moveaxis(ptsT, 2, 0)                    # (S, F, B)
        ks_seq = jnp.moveaxis(ks, 1, 0)                      # (S, B)
        if signs_grp is not None:
            sg = jnp.take_along_axis(signs_grp, order, axis=-1) \
                    .reshape(B, S)
            sg_seq = jnp.moveaxis(sg, 1, 0)                  # (S, B) bool
        else:
            sg_seq = None

        # -- step 0: initialize run accumulator ---------------------------
        # (initial carries derive from data so their varying axes match
        # the body outputs under shard_map)
        acc0, _ = lift(xs_seq[0], batch,
                       sg_seq[0] if sg_seq is not None else None)
        acc0_arrs = cops.to_arrays(cops.normalize_k(acc0))
        first0 = tuple(i + a * 0 for i, a in zip(ident_arrs, acc0_arrs))
        carry0 = (
            acc0_arrs,
            ks_seq[0],
            first0,                                          # first partial
            ks_seq[0] != ks_seq[0],                          # has_change
        )

        n_acc = 3 * deg
        signed_xs = sg_seq is not None

        def step_core(*arrs):
            """Pure-array scan step: the whole run-boundary logic + one
            mixed_add.  Written array-in/array-out so pallas_group's
            maybe_fuse can run it as ONE TPU kernel (every intermediate
            VMEM-resident); the inline call is the identical trace."""
            accA = arrs[:n_acc]
            firstA = arrs[n_acc:2 * n_acc]
            prevk, haschg, kj = arrs[2 * n_acc:2 * n_acc + 3]
            block = arrs[2 * n_acc + 3]
            sj = arrs[2 * n_acc + 4] if signed_xs else None
            # ONE canon pass on the carried accumulator, shared by (a)
            # the u16 emission narrowing and (b) mixed_add's multiply
            # entry (canon_limbs then skips the already-canonical
            # coordinates) — previously emission and entry each paid
            # their own pass (VERDICT r4 #3 "merge canon passes").
            acc = cops.canon_point(cops.from_arrays(accA))
            accA_c = cops.to_arrays(acc)
            lifted, (x, y, inf) = lift(block, None, sj)
            summ = cops.mixed_add(acc, x, y, q_inf=inf)
            same = (kj == prevk)[None]
            new_acc = cops.select(same, summ, lifted)
            change = ~same[0]
            emit_valid = change & haschg
            first_now = change & (~haschg)
            newfirst = _tree_select(first_now[None], accA_c, firstA)
            new_accA = cops.to_arrays(cops.normalize_k(new_acc))
            em_vals = tuple(a.astype(jnp.uint16) for a in accA_c)
            return (tuple(new_accA) + tuple(newfirst) + em_vals
                    + (haschg | change, emit_valid))

        def step(carry, xs):
            accA, prevk, firstA, haschg = carry
            if signed_xs:
                block, kj, sj = xs
            else:
                (block, kj), sj = xs, None
            from . import pallas_group as PG
            args = (tuple(accA) + tuple(firstA) + (prevk, haschg, kj, block)
                    + ((sj,) if signed_xs else ()))
            out = PG.maybe_fuse("msm_scan_step", step_core, args,
                                key=(cops, signed_xs))
            if out is None:
                out = step_core(*args)
            new_accA = out[:n_acc]
            newfirst = out[n_acc:2 * n_acc]
            em_vals = out[2 * n_acc:3 * n_acc]
            new_haschg, emit_valid = out[3 * n_acc:]
            new_carry = (tuple(new_accA), kj, tuple(newfirst), new_haschg)
            emit = (tuple(em_vals), prevk, emit_valid)
            return new_carry, emit

        xs_in = ((xs_seq[1:], ks_seq[1:], sg_seq[1:])
                 if sg_seq is not None else (xs_seq[1:], ks_seq[1:]))
        (tailA, tail_key, firstA, haschg), (em_vals, em_keys, em_valid) = (
            jax.lax.scan(step, carry0, xs_in))

        head_key = ks_seq[0]
        uniform = ~haschg

        # -- cross-chunk carry chain (Hillis-Steele with early exit) -------
        # shifts run along the chunk axis WITHIN each window: view the
        # flat (48, B) arrays as (48, wb, C) just for the shift, compute
        # everything else flat
        def shift_arrs(arrs, fills, s):
            out = []
            for a, fill in zip(arrs, fills):
                a2 = a.reshape(a.shape[:-1] + (wb, C))
                f2 = fill.reshape(fill.shape[:-1] + (wb, C))
                comb = jnp.concatenate([f2, a2], axis=-1)
                sh = jax.lax.dynamic_slice_in_dim(comb, C - s, C, axis=-1)
                out.append(sh.reshape(a.shape))
            return tuple(out)

        def shift_mask1(mask):
            """(B,) -> shifted one chunk within each window, False fill."""
            m2 = mask.reshape(wb, C)
            return jnp.concatenate(
                [jnp.zeros((wb, 1), mask.dtype), m2[:, :-1]],
                axis=-1).reshape(B)

        # link[w*C + c] = (tail_key[w, c-1] == head_key[w, c]), c > 0
        link = jnp.concatenate(
            [jnp.zeros((wb, 1), jnp.bool_),
             tail_key.reshape(wb, C)[:, :-1] ==
             head_key.reshape(wb, C)[:, 1:]], axis=-1).reshape(B)
        tail_shift = shift_arrs(tailA, ident_arrs, 1)
        val0 = _tree_select(link[None], tail_shift, ident_arrs)
        prop0 = link & shift_mask1(uniform)

        def carry_cond(st):
            s, _, prop = st
            return (s < C) & jnp.any(prop)

        def carry_body(st):
            s, val, prop = st
            val_s = shift_arrs(val, ident_arrs, s)
            prop_s = shift_arrs((prop[None].astype(jnp.uint32),),
                                (jnp.zeros((1, B), jnp.uint32),),
                                s)[0][0] > 0
            comb = cops.add(cops.from_arrays(val),
                            cops.from_arrays(val_s))
            val = _tree_select(prop[None],
                               cops.to_arrays(cops.normalize_k(comb)), val)
            return (s * 2, val, prop & prop_s)

        _, carry_val, _ = jax.lax.while_loop(
            carry_cond, carry_body, (jnp.int32(1), val0, prop0))

        # -- boundary emissions --------------------------------------------
        carry_pt = cops.from_arrays(carry_val)
        first_total = cops.add(cops.from_arrays(firstA), carry_pt)
        tail_with = cops.add(cops.from_arrays(tailA), carry_pt)
        tail_total = cops.select(uniform[None], tail_with,
                                 cops.from_arrays(tailA))
        link_next = jnp.concatenate([
            tail_key.reshape(wb, C)[:, :-1] ==
            head_key.reshape(wb, C)[:, 1:],
            jnp.zeros((wb, 1), jnp.bool_),
        ], axis=-1).reshape(B)
        first_valid = haschg
        tail_valid = ~link_next

        # -- scatter run totals into the dense bucket tables ----------------
        def to_rows(arrs):  # tuple of (..., nq, B) -> (..., B, F3)
            stacked = jnp.concatenate(
                [jnp.swapaxes(a, -2, -1)[..., None, :]
                 .reshape(a.shape[:-2] + (B, nq))
                 for a in arrs], axis=-1)
            return stacked.astype(jnp.uint16)

        em_rows = to_rows(em_vals).reshape(-1, F3)       # ((S-1)*wb*C, F3)
        first_rows = to_rows(tuple(
            L.canon(a, qbits).astype(jnp.uint16)
            for a in cops.to_arrays(cops.normalize_k(first_total))))
        first_rows = first_rows.reshape(-1, F3)
        tail_rows = to_rows(tuple(
            L.canon(a, qbits).astype(jnp.uint16)
            for a in cops.to_arrays(cops.normalize_k(tail_total))))
        tail_rows = tail_rows.reshape(-1, F3)

        dummy = jnp.int32(wb * NT)
        if signed:
            # sort keys count in (NBH+1)-wide blocks (magnitude 0..NBH
            # per (window, msm)); the bucket table is NBH-wide with
            # bucket b holding magnitude b+1, and magnitude 0 (a zero
            # digit — no contribution) drops to the dummy slot.
            def to_scatter(k, valid):
                blk = k // jnp.int32(NBH + 1)
                r = k - blk * jnp.int32(NBH + 1)
                return jnp.where(valid & (r > 0),
                                 blk * jnp.int32(NB) + r - 1, dummy)
        else:
            def to_scatter(k, valid):
                return jnp.where(valid, k, dummy)
        keys_flat = jnp.concatenate([
            to_scatter(em_keys, em_valid).reshape(-1),
            to_scatter(head_key, first_valid).reshape(-1),
            to_scatter(tail_key, tail_valid).reshape(-1),
        ])
        vals_all = jnp.concatenate([em_rows, first_rows, tail_rows], axis=0)

        init = jnp.broadcast_to(jnp.asarray(ident_row_np),
                                (wb * NT + 1, F3))
        return init.at[keys_flat].set(vals_all)[:wb * NT]  # (wb*NT, F3)

    # -- weighted bucket reduction: per-MSM sum_b b * bucket_b, batched
    # over a GROUP of windows jointly so every level op runs at
    # (wblock * lanes) width.  Buckets are stored in BIT-REVERSED digit
    # order (the scatter uses bitrev'd keys), so each halving level
    # pairs a bucket with its LSB-of-weight partner via a CONTIGUOUS
    # half-split of the lane axis — no strided even/odd lane shuffles
    # anywhere (per-window shrinking + strided splits made the old
    # reduction ~50% of MSM wall time at 2^18-2^20 despite ~10x less
    # arithmetic than the scan).
    def reduce_group(bt):
        """(W, NT, F3) u16 tables -> per-coord (W, 48, num_msms).

        All arithmetic runs on FLAT rank-2 (48, X) tensors (block axes
        strand the VPU sublane dim; window/msm blocks are contiguous
        and power-of-two sized, so the even/odd adjacent pairing never
        straddles a block).  Early WIDE levels are processed in
        VMEM-sized chunks: a stacked Montgomery multiply beyond ~2^15
        lanes spills its (50, X) scan accumulator to HBM and pays the
        48-iteration round-trip 48 times over — chunking keeps every
        multiply VMEM-resident."""
        Wn = bt.shape[0]
        G = Wn * num_msms
        barrs = jnp.moveaxis(bt, 2, 0).astype(jnp.uint32).reshape(
            3 * deg, nq, G * NB)
        Sp = cops.from_arrays(tuple(barrs[i] for i in range(3 * deg)),
                              lb=cops.fq_ctx.mask)
        if signed:
            # signed digits store magnitude b+1 in bucket b: starting the
            # weighted accumulator at the buckets themselves adds exactly
            # sum_b bucket_b, shifting every weight by one for free.
            W = cops.from_arrays(cops.to_arrays(Sp), lb=cops.fq_ctx.mask)
        else:
            W0_arrs = cops.to_arrays(cops.zero((G * NB,)))
            W = cops.from_arrays(tuple(
                w + b * 0 for w, b in zip(W0_arrs, cops.to_arrays(Sp))),
                k=1, lb=cops.fq_ctx.mask)
        ncrd = 3 * deg

        def halves(P):
            # adjacent-pair split (pairs stay inside their block)
            arrs = cops.to_arrays(P)
            A = tuple(a.reshape(a.shape[:-1] + (-1, 2))[..., 0]
                      for a in arrs)
            B = tuple(a.reshape(a.shape[:-1] + (-1, 2))[..., 1]
                      for a in arrs)
            return cops.from_arrays(A), cops.from_arrays(B)

        def level(Sp, W):
            # adjacent buckets pair up; A = even index (lower weight)
            Sa, Sb = halves(cops.normalize_k(Sp))
            Wa, Wb = halves(cops.normalize_k(W))
            W = cops.add(cops.add(Wa, Wb), Sb)
            Sp = cops.dbl(cops.add(Sa, Sb))
            return Sp, W

        def norm_arrs(Sp, W):
            return (cops.to_arrays(cops.normalize_k(Sp))
                    + cops.to_arrays(cops.normalize_k(W)))

        def from_st(st):
            return (cops.from_arrays(st[:ncrd]),
                    cops.from_arrays(st[ncrd:]))

        def level_chunked(Sp, W):
            """One halving level, fori-chunked to <= LEVEL_CHUNK lanes
            per op so the stacked multiplies stay VMEM-resident."""
            ins = norm_arrs(Sp, W)
            X = ins[0].shape[-1]
            K = X // LEVEL_CHUNK
            if K <= 1 or L._hostcall_mult():
                return level(Sp, W)

            outs0 = tuple(jnp.zeros_like(a[..., :X // 2]) for a in ins)

            def body(i, outs):
                sl = tuple(jax.lax.dynamic_slice_in_dim(
                    a, i * LEVEL_CHUNK, LEVEL_CHUNK, axis=-1)
                    for a in ins)
                Sp2, W2 = level(*from_st(sl))
                res = norm_arrs(Sp2, W2)
                return tuple(jax.lax.dynamic_update_slice_in_dim(
                    o, r, i * (LEVEL_CHUNK // 2), axis=-1)
                    for o, r in zip(outs, res))

            outs = jax.lax.fori_loop(0, K, body, outs0)
            return from_st(outs)

        # wide levels: python-unrolled, chunk-bounded widths.  In
        # hostcall-mult mode (CPU dryrun) unroll everything: compile is
        # cheap (callbacks) and the fori tail's fixed-width element work
        # IS the runtime there.
        fori_width = 1 if L._hostcall_mult() else REDUCE_FORI_WIDTH
        m = NB
        while m > 1 and m * G > fori_width:
            Sp, W = level_chunked(Sp, W)
            m //= 2

        if m > 1:
            # narrow tail: ONE traced body iterated with fixed-width
            # arrays.  Each iteration halves the live prefix of every
            # block; pad_back re-doubles it in place, so lanes beyond a
            # block's live prefix hold junk that never feeds back into
            # it (every complete-formula op is total, junk is harmless).
            def pad_back(P, m_live):
                out = []
                for a in cops.to_arrays(P):
                    a2 = a.reshape(a.shape[:-1] + (G, m_live))
                    a2 = jnp.concatenate([a2, a2], axis=-1)
                    out.append(a2.reshape(a.shape[:-1]
                                          + (G * 2 * m_live,)))
                return tuple(out)

            def tail_body(_, st):
                Sp, W = level(*from_st(st))
                return (pad_back(Sp, m // 2) + pad_back(W, m // 2))

            st = tuple(norm_arrs(Sp, W))
            st = jax.lax.fori_loop(0, m.bit_length() - 1, tail_body, st)
            # live element of each block is its first slot
            W = cops.from_arrays(tuple(
                a.reshape(a.shape[:-1] + (G, m))[..., 0]
                for a in st[ncrd:]))
        # per-coord (nq, G) -> (Wn, nq, num_msms)
        return tuple(
            jnp.moveaxis(a.reshape(nq, Wn, num_msms), 1, 0)
            for a in cops.to_arrays(cops.normalize_k(W)))

    def scan_phase(scalar_limbs, points_rows, seg_ids):
        """(48, n) digit limbs + point rows -> (nwin, NT, F3) bucket tables."""
        limbs = scalar_limbs.astype(jnp.int32)                # (48, n)
        if c == 16:
            keys_all = limbs
        elif c == 8:
            # byte digits, little-endian within each 16-bit limb
            keys_all = jnp.stack(
                [limbs & 0xFF, limbs >> 8], axis=1).reshape(
                    2 * L.NUM_LIMBS, -1)
        else:
            # nibble digits (c=4): tiny bucket tables for callback-mode
            # dryruns and very small MSMs
            keys_all = jnp.stack(
                [limbs & 0xF, (limbs >> 4) & 0xF,
                 (limbs >> 8) & 0xF, (limbs >> 12) & 0xF],
                axis=1).reshape(4 * L.NUM_LIMBS, -1)

        if num_windows is not None:
            # structural smoke runs (dryrun): process only the low
            # windows — the kernel is identical, the result partial
            keys_all = keys_all[:num_windows]

        signs_all = None
        if signed:
            # borrow ripple: digit d + carry >= 2^(c-1) recodes to
            # d + carry - 2^c with a carry into the next window.  The
            # top window never overflows: scalars are < p < 2^753 while
            # the windows span 768 bits, so its digit stays tiny.
            half = jnp.int32(1 << (c - 1))
            fullc = jnp.int32(1 << c)

            def ripple(carry, dig):
                d2 = dig + carry
                neg = d2 >= half
                return neg.astype(jnp.int32), jnp.where(neg, d2 - fullc, d2)

            # derive the zero init-carry from the operand so its varying
            # manual axes match the body output under shard_map (the
            # scan-vma rule; same trick as limbs._mont_mul_xla's t0)
            _, sdig = jax.lax.scan(
                ripple, keys_all[0] * jnp.int32(0), keys_all)
            signs_all = sdig < 0
            keys_all = jnp.abs(sdig)                # magnitudes 0..2^(c-1)

        nwin_t = keys_all.shape[0]

        def fit_block(target):
            wb = min(nwin_t, max(1, target))
            while nwin_t % wb:
                wb -= 1
            return wb

        # scan blocking: 1 on real hardware (the scan is already lane-
        # saturated at production sizes; blocking multiplies the gather/
        # transpose footprint and measured 5x SLOWER at 2^18).
        # GROTH16_WB_SCAN overrides.  In hostcall-mult mode (callback
        # dryrun) invocation count IS the runtime, so every window goes
        # through one batched pass.
        import os
        wb_scan = fit_block(int(os.environ.get("GROTH16_WB_SCAN", 0)) or 1)
        if L._hostcall_mult():
            wb_scan = nwin_t

        # per-window keys with global (window, msm) sort-key offsets; the
        # sort is per-window (axis -1), so constant offsets are inert
        seg_shift = seg_ids.astype(jnp.int32) * jnp.int32(SEG_SPAN)
        keys_off = keys_all + seg_shift[None, :]

        offs = (jnp.arange(nwin_t, dtype=jnp.int32) % wb_scan) * NT_sort
        if wb_scan == nwin_t:
            bt = group_msm(keys_off + offs[:, None], points_rows, signs_all)
        elif signed:
            def scan_body_s(carry, xs):
                kg, w_off, sg = xs
                return carry, group_msm(kg + w_off[:, None],
                                        points_rows, sg)
            grp_keys = keys_off.reshape(nwin_t // wb_scan, wb_scan, -1)
            grp_offs = offs.reshape(nwin_t // wb_scan, wb_scan)
            grp_signs = signs_all.reshape(nwin_t // wb_scan, wb_scan, -1)
            _, bts = jax.lax.scan(scan_body_s, 0,
                                  (grp_keys, grp_offs, grp_signs))
            bt = bts.reshape(nwin_t * NT, -1)
        else:
            def scan_body(carry, kg_and_off):
                kg, w_off = kg_and_off
                return carry, group_msm(kg + w_off[:, None], points_rows)
            grp_keys = keys_off.reshape(nwin_t // wb_scan, wb_scan, -1)
            grp_offs = offs.reshape(nwin_t // wb_scan, wb_scan)
            _, bts = jax.lax.scan(scan_body, 0, (grp_keys, grp_offs))
            bt = bts.reshape(nwin_t * NT, -1)
        return bt.reshape(nwin_t, NT, -1)

    def reduce_phase(bt):
        """(nwin, NT, F3) bucket tables -> per-coord window sums."""
        import os
        nwin_t = bt.shape[0]

        def fit_block(target):
            wb = min(nwin_t, max(1, target))
            while nwin_t % wb:
                wb -= 1
            return wb

        if L._cpu_backend() and not L._hostcall_mult():
            # XLA:CPU-only compile guard: keep the reduction group small
            # enough that NO wide level is python-unrolled (m*G stays
            # under REDUCE_FORI_WIDTH, so the whole reduction is the
            # single-trace fori tail) — each unrolled level re-traces
            # ~12 stacked multiplies and XLA:CPU optimization blows up.
            default_red = max(1, REDUCE_FORI_WIDTH // NT)
        else:
            default_red = max(REDUCE_GROUP_LANES // NT, 8 // num_msms)
        wb_red = fit_block(
            int(os.environ.get("GROTH16_WB_RED", 0)) or default_red)
        if L._hostcall_mult():
            wb_red = nwin_t

        def red_body(_, btg):
            return 0, reduce_group(btg)

        if wb_red == nwin_t:
            return reduce_group(bt)
        _, Ws = jax.lax.scan(red_body, 0,
                             bt.reshape(nwin_t // wb_red, wb_red, NT, -1))
        return tuple(a.reshape((nwin_t,) + a.shape[2:]) for a in Ws)

    return scan_phase, reduce_phase


def _reduce_checksum(bt, num_msms: int, deg: int, nq: int):
    """GROTH16_MSM_SKIP_REDUCE profiling knob: time the bucket-scan phase
    alone (the checksum keeps the scan from being dead-code-eliminated)."""
    s = bt.astype(jnp.uint32).sum()
    z = jnp.zeros((bt.shape[0], nq, num_msms), jnp.uint32) + s
    return tuple(z for _ in range(3 * deg))


def _trace_state_clean() -> bool:
    try:
        return jax.core.trace_state_clean()
    except Exception:
        return True


@partial(jax.jit, static_argnums=(0, 3, 4, 6, 7, 8))
def _msm_window_sums_fused(cops: CurveOps, scalar_limbs, points_rows,
                           chunk_s: int, c: int, seg_ids, num_msms: int,
                           num_windows, signed: bool = False):
    """Scan + reduce phases fused into ONE XLA module (TPU path)."""
    import os
    n = points_rows.shape[0]
    scan_phase, reduce_phase = _window_kernel_parts(
        cops, int(n), chunk_s, c, num_msms, num_windows, signed)
    if seg_ids is None:
        seg_ids = jnp.zeros((n,), jnp.int32)
    bt = scan_phase(scalar_limbs, points_rows, seg_ids)
    if os.environ.get("GROTH16_MSM_SKIP_REDUCE"):
        return _reduce_checksum(bt, num_msms, cops.F.deg, cops.nq)
    return reduce_phase(bt)


@lru_cache(maxsize=None)
def _cpu_phase_jits(cops: CurveOps, n: int, chunk_s: int, c: int,
                    num_msms: int, num_windows, signed: bool):
    scan_phase, reduce_phase = _window_kernel_parts(
        cops, n, chunk_s, c, num_msms, num_windows, signed)
    return jax.jit(scan_phase), jax.jit(reduce_phase)


def msm_window_sums(cops: CurveOps, scalar_limbs, points_rows,
                    chunk_s: int = DEFAULT_CHUNK, c: int = DEFAULT_C,
                    seg_ids=None, num_msms: int = 1,
                    num_windows: int = None, signed: bool = False):
    """Window sums of `num_msms` independent fused MSMs over one group.

    scalar_limbs: (48, n) uint32 — standard-domain 16-bit digit limbs
    points_rows:  (n, 2*deg*48) uint16 — Montgomery affine rows
    c: window bits (16: digits ARE the limbs; 8: limb bytes — used at
       small n where the 2^16-bucket reduction would dominate)
    signed: recode to signed digits in [-2^(c-1), 2^(c-1)-1] — half the
       buckets (reduction work + scatter memory) for the same window
       sums; proof/window results are value-identical to unsigned.
    seg_ids: (n,) int32 MSM index per point (None = all zero).  Fusing
       several same-group MSMs (the prover's A/B1/L/H share G1) widens
       every batched stage and runs the sort/scan/scatter machinery once —
       the TPU counterpart of the reference launching B1/B2/L on separate
       CUDA streams (cuda_prover_piecewise.cu:162-167), except fused into
       one kernel instead of three.  The MSM index rides the top bits of
       the bucket key, so runs never merge across MSMs and the weighted
       reduction simply stops at `num_msms` block sums.

    Returns a tuple of 3*deg arrays of shape (768//c, 48, num_msms).

    On TPU (and whenever already inside a trace) the scan and reduce
    phases compile fused; at the top level of the CPU backend they
    compile as two separate XLA modules — XLA:CPU's whole-module
    optimization cost is superlinear and a fused deg-3 module exceeded
    10 GB of compiler RSS / 30 min (tests segfaulted in LLVM).
    """
    import os
    if (L._cpu_backend() and not L._hostcall_mult()
            and _trace_state_clean()):
        n = int(points_rows.shape[0])
        scan_jit, reduce_jit = _cpu_phase_jits(
            cops, n, chunk_s, c, num_msms, num_windows, signed)
        if seg_ids is None:
            seg_ids = jnp.zeros((n,), jnp.int32)
        bt = scan_jit(scalar_limbs, points_rows,
                      jnp.asarray(seg_ids).astype(jnp.int32))
        if os.environ.get("GROTH16_MSM_SKIP_REDUCE"):
            return _reduce_checksum(bt, num_msms, cops.F.deg, cops.nq)
        return reduce_jit(bt)
    return _msm_window_sums_fused(cops, scalar_limbs, points_rows,
                                  chunk_s, c, seg_ids, num_msms,
                                  num_windows, signed)


@partial(jax.jit, static_argnums=(0,))
def combine_window_sums(cops: CurveOps, ws_a, ws_b):
    """Pointwise EC add of two window-sum stacks (same layout).

    MSM linearity over point chunks: a large MSM processed in bounded
    point blocks (HBM streaming, SURVEY §7.4.7 — the reference's
    unified-memory analog is multiexp/reduce.cu:198-271) yields the same
    per-window sums as one pass, by adding the blocks' window sums.
    Inputs/outputs: tuples of 3*deg arrays shaped (nwin, 48, num_msms).
    """
    nwin, _, M = ws_a[0].shape
    nq, qbits = cops.nq, cops.qbits

    def to_pts(ws):
        arrs = tuple(jnp.moveaxis(jnp.asarray(a), 1, 0).reshape(
            nq, nwin * M) for a in ws)
        return cops.from_arrays(tuple(L.canon(a, qbits) for a in arrs))

    s = cops.add(to_pts(ws_a), to_pts(ws_b))
    return tuple(
        L.canon(a, qbits).reshape(nq, nwin, M).transpose(1, 0, 2)
        for a in cops.to_arrays(cops.normalize_k(s)))


@partial(jax.jit, static_argnums=(1,))
def _slice_widen_keys(keys, B: int, lo):
    """Device-resident key slice [lo, lo+B) widened to uint32 (lo is a
    traced scalar so every block shares one compiled program)."""
    return jax.lax.dynamic_slice_in_dim(keys, lo, B, axis=1).astype(
        jnp.uint32)


@partial(jax.jit, static_argnums=(1,))
def _slice_rows(rows, B: int, lo):
    """Device-resident point-row block [lo, lo+B)."""
    return jax.lax.dynamic_slice_in_dim(rows, lo, B, axis=0)


def msm_window_sums_streamed(cops: CurveOps, scalar_limbs, points_rows_np,
                             chunk_s: int, c: int, seg_ids_np=None,
                             num_msms: int = 1, block_points: int = None,
                             signed: bool = False):
    """msm_window_sums over host-resident points in bounded blocks.

    Keeps device footprint at one block of rows (+ the window sums)
    regardless of total MSM size: the 2^22+ configs' query tables exceed
    a single chip's HBM, so the host array is sliced and each block's
    window sums are combined on device (combine_window_sums).  All
    blocks share one kernel compilation (equal block shapes; the tail
    is zero-padded — infinity rows with zero keys are exact no-ops).

    Streaming-bandwidth design (round 4 measured a 45% throughput tax at
    2^22; the host->device link — not compute — was the bottleneck):
      * The axon link's big-transfer bandwidth COLLAPSES ~20x (measured
        ~600 MB/s -> ~30 MB/s, .scratch/stream_profile*.py) once the
        first real kernel has executed in the process, permanently.  So
        whenever `points_rows_np`/`scalar_limbs` are already DEVICE
        arrays (the prover uploads its query rows before the H-phase
        kernels run, while the link is fast), blocks are device-side
        dynamic_slices and nothing ships mid-stream at all; the block
        structure still bounds the kernel's transient working set (sort
        buffers + emissions), which is what actually outgrows HBM.
      * Host-resident fallback (rows too big to stage, 2^24+): keys
        ship as uint16 (digit limbs are < 2^16 — the uint32 layout
        wasted half its wire bytes), and block i+1's upload is issued
        right after block i's compute is dispatched (XLA dispatch is
        async; the host thread pays the transfer while the device
        crunches), so upload and compute overlap.
    """
    n = points_rows_np.shape[0]
    dev_keys = isinstance(scalar_limbs, jax.Array)
    dev_rows = isinstance(points_rows_np, jax.Array)
    if block_points is None or block_points >= n:
        keys = scalar_limbs if dev_keys else jnp.asarray(scalar_limbs)
        if keys.dtype != jnp.uint32:
            keys = keys.astype(jnp.uint32)
        return msm_window_sums(cops, keys,
                               jnp.asarray(points_rows_np), chunk_s, c,
                               None if seg_ids_np is None
                               else jnp.asarray(seg_ids_np), num_msms,
                               signed=signed)
    # block size quantized so the scan batch tiles by 128 lanes off-CPU
    # (the fused Pallas scan-step kernel requirement; see tpu_prover),
    # and BALANCED: with the requested cap the last block can be mostly
    # padding (a 2^20 prove's 4.2M rows under a 2^21 cap would run 3
    # blocks of 2^21 = 49% wasted lanes); instead the cap only fixes the
    # block COUNT and the size divides the total evenly.
    q = chunk_s if L._cpu_backend() else chunk_s * 128
    nblk = -(-n // max(q, min(block_points, n)))   # ceil(n / cap)
    per_blk = -(-n // nblk)                        # ceil(n / nblk)
    B = -(-per_blk // q) * q                       # rounded up to quantum
    n_full = ((n + B - 1) // B) * B
    if seg_ids_np is None:
        seg_ids_np = np.zeros((n,), np.int32)
    if dev_keys:
        # pad once on device so every block slice is in range
        if scalar_limbs.shape[1] < n_full:
            scalar_limbs = jnp.pad(
                scalar_limbs, ((0, 0), (0, n_full - scalar_limbs.shape[1])))
    else:
        scalar_limbs = np.asarray(scalar_limbs)
    if dev_rows and points_rows_np.shape[0] < n_full:
        # zero rows are y == 0 infinity points: exact no-ops
        points_rows_np = jnp.pad(
            points_rows_np, ((0, n_full - points_rows_np.shape[0]), (0, 0)))

    def stage(lo):
        """Produce block [lo, lo+B): device slices when resident,
        host-slice + upload otherwise."""
        hi = min(lo + B, n)
        if dev_rows:
            rows = _slice_rows(points_rows_np, B, lo)
        else:
            rows = jax.device_put(jnp.asarray(
                pad_rows(np.asarray(points_rows_np[lo:hi]), B)))
        if dev_keys:
            keys = _slice_widen_keys(scalar_limbs, B, lo)
        else:
            keys16 = np.zeros((L.NUM_LIMBS, B), np.uint16)
            keys16[:, :hi - lo] = scalar_limbs[:, lo:hi]
            keys = _widen_keys(jax.device_put(jnp.asarray(keys16)))
        seg = np.zeros((B,), np.int32)
        seg[:hi - lo] = seg_ids_np[lo:hi]
        return keys, rows, jax.device_put(jnp.asarray(seg))

    acc = None
    cur = stage(0)
    for lo in range(0, n, B):
        keys_d, rows_d, seg_d = cur
        ws = msm_window_sums(cops, keys_d, rows_d, chunk_s, c, seg_d,
                             num_msms, signed=signed)
        acc = ws if acc is None else combine_window_sums(cops, acc, ws)
        if lo + B < n:
            # stage the next block while the device runs this one
            cur = stage(lo + B)
    return acc


@jax.jit
def _widen_keys(keys16):
    return keys16.astype(jnp.uint32)


# -- host finalization ----------------------------------------------------------

def finalize_windows_native(cops: CurveOps, host_group, ws, p: int,
                            cbits: int, num_msms: int = 1):
    """Native-epilogue finalize: device window sums -> per-MSM host
    Jacobian points via csrc g16_horner_proj (proj->jac conversion +
    cbits-doubling Horner in C).  Returns a list of points (or a single
    point when num_msms == 1), or None when the native library is
    unavailable (callers fall back to window_sums_to_host+finalize_msm).

    The pure-python epilogue was ~12 s of a warm 26 s 2^16 proof
    (BENCH_r03 phases); native it is milliseconds.
    """
    from ..utils import native
    if not native.available():
        return None
    deg = cops.F.deg
    ctx = cops.fq_ctx
    nwin = int(jnp.asarray(ws[0]).shape[0])
    # Raw (loose) limbs straight to host: the few hundred window-sum
    # elements reduce mod p in python ints below, so a device
    # to_canonical pass here would only add epilogue kernels (each a
    # fresh XLA compile in a cold process — measured ~48 s of the 2^20
    # gate's "readback + host assembly" lap).  The limb sum is reduced
    # mod 2^full_bits FIRST: complement-based device subtraction relies
    # on exactly that truncation (limbs.sub_const contract).
    arrs = [np.moveaxis(np.asarray(a), 1, 0).reshape(ctx.n, nwin, num_msms)
            for a in ws]                 # 3*deg x (nq, nwin, M)
    # the native Horner kernel works in the serialized Montgomery domain
    # (R = 2^768, 12 x 64-bit limbs); radix-15 window sums carry x*R'
    # (R' = 2^780) and convert by one host mulmod per element — a few
    # thousand scalars, microseconds each
    shift = (pow(1 << 12, -1, p) if ctx.bits == 15 else 1)
    mask64 = (1 << 64) - 1
    full_mask = (1 << ctx.full_bits) - 1
    out = []
    for m in range(num_msms):
        rows = np.empty((nwin, 3 * deg * 12), dtype=np.uint64)
        for ci, a in enumerate(arrs):
            col = np.empty((nwin, 12), dtype=np.uint64)
            for w in range(nwin):
                v = (L.limbs_to_int(a[:, w:w + 1, m], ctx.bits)
                     & full_mask) * shift % p
                col[w] = [(v >> (64 * i)) & mask64 for i in range(12)]
            rows[:, ci * 12:(ci + 1) * 12] = col
        pt = native.horner_proj(p, deg, host_group.alpha, host_group.a,
                                rows, cbits)
        if pt is None:
            return None
        out.append(pt)
    return out if num_msms > 1 else out[0]


def window_sums_to_host(cops: CurveOps, ws, p: int, num_msms: int = 1):
    """Stacked device window sums (nwin, nq, num_msms) -> per-MSM lists of
    host projective points: out[msm][window]."""
    deg = cops.F.deg
    nwin = jnp.asarray(ws[0]).shape[0]
    ctx = cops.fq_ctx
    # raw loose limbs; the per-element `% 2^full * rinv % p` below
    # canonicalizes exactly on host (no device epilogue kernels; the
    # mod-2^full truncation is semantically required — complement
    # subtraction relies on it, see finalize_windows_native)
    arrs = [np.moveaxis(np.asarray(a), 1, 0).reshape(ctx.n, -1)
            for a in ws]   # each (nq, nwin * num_msms)
    rinv = pow(1 << ctx.full_bits, -1, p)
    full_mask = (1 << ctx.full_bits) - 1
    out = []
    for msm_i in range(num_msms):
        pts = []
        for w in range(nwin):
            col = w * num_msms + msm_i
            coords = []
            for cidx in range(3):
                if deg == 1:
                    coords.append((L.limbs_to_int(
                        arrs[cidx][:, col:col + 1], ctx.bits)
                        & full_mask) * rinv % p)
                else:
                    coords.append(tuple((L.limbs_to_int(
                        arrs[cidx * deg + d][:, col:col + 1], ctx.bits)
                        & full_mask) * rinv % p for d in range(deg)))
            pts.append(tuple(coords))
        out.append(pts)
    return out if num_msms > 1 else out[0]


def proj_to_host(host_group, pt):
    """Homogeneous projective (X:Y:Z) int tuple -> host group element."""
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


def finalize_msm(host_group, window_pts, cbits: int = None,
                 num_windows: int = None) -> tuple:
    """Horner recombination: result = sum_w 2^(cbits*w) * W_w, exact on host.

    `cbits` is the window bit-width the sums were computed with; when
    omitted it is inferred from the window count, which is only valid for
    full-scalar runs (48 or 96 windows) — a partial num_windows run must
    pass both explicitly (the result is then the partial low-window sum).

    Device points are homogeneous projective (X:Y:Z); the host oracle group
    is Jacobian, so convert via affine (X/Z, Y/Z).
    """
    def to_host(pt):
        return proj_to_host(host_group, pt)

    nwin = len(window_pts)
    if cbits is None:
        assert nwin in (48, 96, 192), (
            f"cannot infer window width from {nwin} windows; pass cbits "
            f"(partial num_windows runs yield partial sums)")
        cbits = 768 // nwin
    elif num_windows is not None:
        assert nwin == num_windows
    acc = host_group.zero
    for w in range(nwin - 1, -1, -1):
        for _ in range(cbits):
            acc = host_group.dbl(acc)
        acc = host_group.add(acc, to_host(window_pts[w]))
    return acc


def msm_device(cops: CurveOps, host_group, scalars: Sequence[int],
               points, p: int, chunk_s: int = DEFAULT_CHUNK,
               c: int = DEFAULT_C, signed: bool = False):
    """End-to-end device MSM with host inputs/outputs (test/oracle path)."""
    n = len(scalars)
    n_pad = max(chunk_s, ((n + chunk_s - 1) // chunk_s) * chunk_s)
    rows = pad_rows(
        affine_points_to_rows(points, p, cops.F.deg), n_pad)
    limbs = scalars_to_limbs(scalars, n_pad)
    ws = msm_window_sums(cops, jnp.asarray(limbs), jnp.asarray(rows),
                         chunk_s, c, signed=signed)
    pts = window_sums_to_host(cops, ws, p)
    return finalize_msm(host_group, pts, c)
