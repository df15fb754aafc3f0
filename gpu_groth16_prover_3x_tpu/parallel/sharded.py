"""Multi-chip sharding: points-DP MSM and all-to-all distributed NTT.

The reference has no multi-device distribution at all (SURVEY.md §2.6: one
host, one GPU, unified memory + CUDA streams).  This module supplies the
TPU-native scaling story:

  * **MSM — data parallelism over points** (the analog of the reference's
    point-chunking across OpenMP threads, multiexp.tcc:402-441, and CUDA
    tiles, reduce.cu:21,140): points/scalars are sharded along the batch
    axis of a 1-D mesh; each chip runs the full per-window Pippenger
    (ops/msm.py) on its shard; the 48 per-chip window sums (a few KB) are
    combined with log-depth batched EC adds.  Cross-chip traffic is one
    all-gather of 48 projective points per MSM — bucket-level
    psum_scatter is unnecessary at these sizes because EC addition is not
    an XLA reduction op; the gather is bytes, not megabytes.

  * **NTT — domain sharding with all_to_all** (the multi-chip realization
    of libfqfft's two-stage parallel FFT factorization,
    basic_radix2_domain_aux.tcc:216-295: local sub-DFTs + twiddle +
    transpose): the classic distributed four-step NTT
        y[k2*n1 + k1] = sum_j2 w^(j2*k1) w_n2^(j2*k2)
                         * sum_j1 x[j1*n2 + j2] w_n1^(j1*k1)
    with the three transposes realized as lax.all_to_all over the ICI
    mesh axis and the column/row NTTs batched locally (ops/ntt.py's
    reshape/concat butterflies with a leading batch dim).

Everything here is shard_map over a jax.sharding.Mesh, so it runs
unchanged on a real multi-chip slice or on N virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=N — the test/dryrun
configuration).
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import limbs as L
from ..ops.ec import CurveOps
from ..ops.field import Fel
from ..ops.msm import msm_window_sums
from ..ops.ntt import NttPlan

AXIS = "data"


def _shmap_kwargs() -> dict:
    """shard_map options.  In dryrun mode (GROTH16_HOSTCALL_MULT set, CPU
    backend) the varying-axes checker is disabled: its analysis hangs
    lowering over pure_callback ops (>150s vs 2.6s) and costs ~250s over
    the real MSM kernel body; the production paths keep full checking."""
    import os
    if os.environ.get("GROTH16_HOSTCALL_MULT") and L._cpu_backend():
        return {"check_vma": False}
    return {}


# -- sharded MSM -----------------------------------------------------------------

def _combine_window_sums(cops: CurveOps, ws_stacked):
    """(D, nwin, 48, num) per-coord arrays -> combined (nwin, 48, num).

    Log-depth pairwise EC reduction batched over windows x fused MSMs.
    """
    ndev = ws_stacked[0].shape[0]

    def to_point(arrs):
        # (d, nwin, 48, num) -> limb-major (48, d, nwin, num)
        return cops.from_arrays(
            tuple(jnp.moveaxis(a, 2, 0) for a in arrs))

    def to_arrays(pt):
        return tuple(jnp.moveaxis(a, 0, 2)
                     for a in cops.to_arrays(cops.normalize_k(pt)))

    arrs = ws_stacked
    d = ndev
    while d > 1:
        half = d // 2
        lo = tuple(a[:half] for a in arrs)
        hi = tuple(a[half:half * 2] for a in arrs)
        summed = to_arrays(cops.add(to_point(lo), to_point(hi)))
        if d % 2:
            arrs = tuple(jnp.concatenate([s, a[d - 1:d]], axis=0)
                         for s, a in zip(summed, arrs))
            d = half + 1
        else:
            arrs = summed
            d = half
    return tuple(a[0] for a in arrs)


def sharded_msm_window_sums(cops: CurveOps, mesh: Mesh, keys, rows,
                            chunk_s: int = 16, c: int = 16,
                            seg_ids=None, num_msms: int = 1,
                            num_windows: int = None,
                            combine: bool = True, signed: bool = False):
    """MSM window sums with points sharded over the mesh axis.

    keys: (48, n) uint32 digit limbs; rows: (n, F) uint16 affine rows;
    n must be divisible by (num_devices * chunk_s).  seg_ids/num_msms
    fuse several same-group MSMs exactly as in ops/msm.py.

    combine=False skips the on-device cross-shard combine and returns
    the stacked per-shard sums (D, nwin, 48, num) — the output sharding
    keeps every shard local, so the program contains NO collective after
    the callback-heavy kernel (the hostcall dryrun combines on host:
    XLA:CPU's collective rendezvous hard-aborts at 40s of thread skew,
    which GIL-serialized callbacks exceed).
    """
    ndev = mesh.shape[AXIS]
    n = rows.shape[0]
    assert n % (ndev * chunk_s) == 0
    if seg_ids is None:
        seg_ids = jnp.zeros((n,), jnp.int32)

    def local(keys_l, rows_l, seg_l):
        # signed recoding is per-scalar (each point carries its full
        # 48-limb key), so points-sharding composes with it unchanged
        ws = msm_window_sums(cops, keys_l, rows_l, chunk_s, c,
                             seg_l, num_msms, num_windows, signed)
        # lift each (nwin, 48, num) to (1, nwin, 48, num) for the gather
        return tuple(w[None] for w in ws)

    ws_sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, AXIS), P(AXIS, None), P(AXIS)),
        out_specs=tuple([P(AXIS, None, None, None)] * (3 * cops.F.deg)),
        **_shmap_kwargs(),
    )(keys, rows, seg_ids)
    if not combine:
        return ws_sharded
    return _combine_window_sums(cops, ws_sharded)


# -- sharded NTT (four-step with all_to_all transposes) ---------------------------

def _dist_transpose(x, axis_name=AXIS):
    """Local block (a/D, b) row-shard of (a, b) -> (b/D, a) row-shard of
    the transpose, via one all_to_all + local transpose."""
    # split columns into D chunks, exchange, stack along rows
    y = jax.lax.all_to_all(x, axis_name, split_axis=x.ndim - 1,
                           concat_axis=x.ndim - 2, tiled=True)
    return jnp.swapaxes(y, -1, -2)  # (a, b/D) -> (b/D, a)


def _batched_ntt(F, v, tw, k_in: int):
    """NTT along the last axis of (48, B, n) limb arrays (ops/ntt.py's
    reshape/concat butterfly with a leading batch dim).  `v` must hold
    canonical 16-bit limbs."""
    limbs, B, n = v.shape
    logn = n.bit_length() - 1
    v = v.reshape(limbs, B, 1, n)
    k = k_in
    for l in range(logn - 1, -1, -1):
        _, _, mp, g2 = v.shape
        v = v.reshape(limbs, B, mp, 2, g2 // 2)
        E, O = v[:, :, :, 0, :], v[:, :, :, 1, :]
        w = tw[:, :: (1 << l)][:, :mp]
        t = F.mul(Fel(O, k),
                  Fel(w[:, None, :, None].astype(jnp.uint32), 1))
        Ef = Fel(E, k)
        hi = F.reduce(F.add(Ef, t), 2)
        lo = F.reduce(F.sub(Ef, t), 2)
        v = jnp.concatenate([hi.v, lo.v], axis=2)
        k = 2
    return v.reshape(limbs, B, n), k


class ShardedNttPlan:
    """Tables for a distributed n = n1 * n2 NTT on a D-device mesh."""

    def __init__(self, plan: NttPlan, ndev: int):
        self.plan = plan
        n = plan.n
        self.ndev = ndev
        # n1: the column count of the (n1, n2) view; both n1, n2 must be
        # divisible by D for the all_to_all transposes.
        log_n = n.bit_length() - 1
        log_n1 = log_n // 2
        self.n1 = 1 << log_n1
        self.n2 = n >> log_n1
        assert self.n1 % ndev == 0 and self.n2 % ndev == 0, (
            f"n1={self.n1}, n2={self.n2} must be divisible by ndev={ndev}")
        p, r = plan.fp.p, plan.F.ctx.r
        # sub-transform twiddle tables: omega_n1 = omega^n2, omega_n2 = omega^n1
        self.tw1_fwd = _sub_table(p, r, plan.omega, self.n2, self.n1)
        self.tw2_fwd = _sub_table(p, r, plan.omega, self.n1, self.n2)
        om_inv = pow(plan.omega, -1, p)
        self.tw1_inv = _sub_table(p, r, om_inv, self.n2, self.n1)
        self.tw2_inv = _sub_table(p, r, om_inv, self.n1, self.n2)
        # inter-stage twiddle matrix W[j2, k1] = omega^(j2*k1), (n2, n1)
        self.tw_mat_fwd = self._twiddle_matrix(plan.omega)
        self.tw_mat_inv = self._twiddle_matrix(om_inv)

    def _twiddle_matrix(self, omega: int) -> np.ndarray:
        p, r = self.plan.fp.p, self.plan.F.ctx.r
        n1, n2 = self.n1, self.n2
        out = np.empty((L.NUM_LIMBS, n2, n1), dtype=np.uint16)
        row_base = 1
        for j2 in range(n2):
            acc = r % p  # 1 in Montgomery form
            step = row_base
            for k1 in range(n1):
                out[:, j2, k1] = L.int_to_limbs(acc).astype(np.uint16)
                acc = acc * step % p
            row_base = row_base * omega % p
        return out


@lru_cache(maxsize=None)
def _sub_table(p: int, r: int, omega: int, stride: int, count: int
               ) -> np.ndarray:
    """(48, count/2) table of (omega^stride)^j in Montgomery form."""
    from ..ops.ntt import _power_table
    return _power_table(p, r, pow(omega, stride, p), max(count // 2, 1))


@lru_cache(maxsize=None)
def get_sharded_plan(plan: NttPlan, ndev: int) -> ShardedNttPlan:
    return ShardedNttPlan(plan, ndev)


def _ntt_local_4step(splan: ShardedNttPlan, x_local, tw1, tw2, tw_mat,
                     scale=None):
    """shard_map body: x_local (48, n/D) of the row-sharded flat input."""
    F = splan.plan.F
    n1, n2 = splan.n1, splan.n2
    # view (n1, n2) row-sharded: local rows of j1
    v = x_local.reshape(L.NUM_LIMBS, -1, n2)
    # T1: -> x^T (n2/D, n1): rows j2 local
    v = _dist_transpose(v)
    # NTT over j1 (last axis) per j2 row
    v, k = _batched_ntt(F, v, tw1, 1)
    # inter-stage twiddle: A^T[j2, k1] *= omega^(j2*k1)
    t = F.mul(Fel(v, k), Fel(tw_mat.astype(jnp.uint32), 1))
    v, k = t.v, t.k
    # T2: -> (n1/D, n2): rows k1 local
    v = _dist_transpose(v)
    # NTT over j2 per k1 row
    v, k = _batched_ntt(F, v, tw2, k)
    # T3: -> natural (n2/D, n1): rows k2 local; flat index k2*n1 + k1
    v = _dist_transpose(v)
    out = Fel(v.reshape(L.NUM_LIMBS, -1), k)
    if scale is not None:
        out = F.mul(out, scale)
    out = F.reduce(out, 2)
    return out.v


def sharded_ntt(splan: ShardedNttPlan, mesh: Mesh, x, inverse: bool = False):
    """Distributed DFT of x (48, n) sharded on the last axis; returns the
    same sharding.  With inverse=True computes the inverse NTT (including
    the 1/n scale).

    All O(n)-sized tables enter as shard_map ARGUMENTS (the sub-transform
    twiddles replicated, the inter-stage matrix column-sharded) — a
    closed-over concrete array would be embedded in the program as an
    HLO literal, which bloats/overflows large-n compiles (see
    ops/ntt.NttPlan.device_tables)."""
    plan = splan.plan
    tw1 = jnp.asarray(splan.tw1_inv if inverse else splan.tw1_fwd)
    tw2 = jnp.asarray(splan.tw2_inv if inverse else splan.tw2_fwd)
    tw_mat_full = jnp.asarray(
        splan.tw_mat_inv if inverse else splan.tw_mat_fwd)
    scale = plan.n_inv if inverse else None

    def body(x_l, tw_mat_l, tw1_a, tw2_a):
        return _ntt_local_4step(splan, x_l, tw1_a, tw2_a, tw_mat_l, scale)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, AXIS), P(None, AXIS, None),
                  P(None, None), P(None, None)),
        out_specs=P(None, AXIS),
        **_shmap_kwargs(),
    )(x, tw_mat_full, tw1, tw2)
