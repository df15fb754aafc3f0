"""Multi-chip Groth16 prove step: DP-sharded MSMs + SP-sharded NTT.

The distributed composition of models/tpu_prover.py: points data-parallel
over the mesh for all five MSMs, the H-pipeline's NTT domain sharded with
all-to-all stage exchanges (parallel/sharded.py).  This is the "full
training step" analog used by __graft_entry__.dryrun_multichip and by the
scaling configs in BASELINE.md (2^22 single host / 2^24 pod slice).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curves.constants import CurveParams
from ..host import ec as host_ec
from ..models.tpu_prover import DeviceInput, DeviceParams
from ..ops import limbs as L
from ..ops.ec import get_curve_ops
from ..ops.field import Fel, fr_ops
from ..ops.msm import finalize_msm, pad_rows, window_sums_to_host
from ..ops.ntt import get_plan
from .sharded import (AXIS, ShardedNttPlan, get_sharded_plan,
                      sharded_msm_window_sums, sharded_ntt)


def compute_h_sharded(splan: ShardedNttPlan, mesh: Mesh, ca, cb, cc):
    """Distributed H pipeline (semantics of compute_H,
    libsnark/main.cpp:89-148) on domain-sharded (48, n) limb arrays.

    Elementwise stages (coset scaling, pointwise mul/sub, divide-by-Z)
    run as ordinary sharding-propagated XLA ops; only the NTTs exchange
    data (three all_to_alls each)."""
    plan = splan.plan
    F = plan.F

    coset = Fel(jnp.asarray(plan.coset).astype(jnp.uint32), 1)
    coset_inv = Fel(jnp.asarray(plan.coset_inv).astype(jnp.uint32), 1)

    def coset_fft_s(x: Fel) -> Fel:
        scaled = F.reduce(F.mul(x, coset), 2)
        return Fel(sharded_ntt(splan, mesh, scaled.v), 2)

    def intt_s(x: Fel) -> Fel:
        return Fel(sharded_ntt(splan, mesh, x.v, inverse=True), 2)

    a = coset_fft_s(intt_s(Fel(ca, 1)))
    b = coset_fft_s(intt_s(Fel(cb, 1)))
    h = F.mul(a, b)
    c = coset_fft_s(intt_s(Fel(cc, 1)))
    h = F.sub(h, c)
    h = F.mul(h, plan.z_coset_inv)
    h = F.mul(intt_s(Fel(F.reduce(h, 2).v, 2)), coset_inv)
    h = F.reduce(h, 2)
    one_std = jnp.zeros((L.NUM_LIMBS, 1), jnp.uint32).at[0, 0].set(1)
    h_std = F.mul(h, Fel(one_std, 1))
    return h.v, h_std.v


def prove_sharded(curve: CurveParams, params: DeviceParams,
                  inputs: DeviceInput, mesh: Mesh, chunk_s: int = 8,
                  c: int = 8, num_windows: int = None):
    """Distributed proof; returns affine (A, B2, C) host tuples.

    Mirrors models/tpu_prover.prove with every MSM points-sharded and the
    H pipeline domain-sharded.
    """
    g1 = get_curve_ops(curve, "g1")
    g2 = get_curve_ops(curve, "g2")
    frops = fr_ops(curve)
    hg1 = host_ec.g1_group(curve)
    hg2 = host_ec.g2_group(curve)
    d, m = params.d, params.m
    ndev = mesh.shape[AXIS]
    quantum = ndev * chunk_s

    def pad_n(n):
        return max(quantum, ((n + quantum - 1) // quantum) * quantum)

    # -- H pipeline (domain-sharded NTT) ------------------------------------
    plan = get_plan(curve.fr, d + 1)
    splan = get_sharded_plan(plan, ndev)
    shard_cols = NamedSharding(mesh, P(None, AXIS))

    def put_cols(rows_np):
        arr = jnp.asarray(np.ascontiguousarray(rows_np.T).astype(np.uint32))
        return jax.device_put(arr, shard_cols)

    _, h_std = compute_h_sharded(
        splan, mesh, put_cols(inputs.ca), put_cols(inputs.cb),
        put_cols(inputs.cc))

    # -- scalars ---------------------------------------------------------------
    # pad the witness to a shardable length (extra zeros decode to zero
    # digits -> weight-0 buckets)
    w_rows = inputs.w_mont
    w_pad = ((w_rows.shape[0] + ndev - 1) // ndev) * ndev
    if w_pad != w_rows.shape[0]:
        w_rows = np.concatenate([
            w_rows, np.zeros((w_pad - w_rows.shape[0], 48),
                             w_rows.dtype)])
    w_mont = put_cols(w_rows)
    one_std = jnp.zeros((L.NUM_LIMBS, 1), jnp.uint32).at[0, 0].set(1)
    w_keys = frops.mul(Fel(w_mont, 1), Fel(one_std, 1)).v

    # -- MSMs (points-DP, fused G1 kernel like models/tpu_prover.py) -----
    def pad2(arr_np, n_pad):
        return pad_rows(np.asarray(arr_np), n_pad)

    w_keys_np = np.asarray(w_keys)
    h_std_np = np.asarray(h_std)
    g1_rows_np = np.concatenate([
        np.asarray(params.A)[:m + 1], np.asarray(params.B1)[:m + 1],
        np.asarray(params.L)[:m - 1], np.asarray(params.H)[:d]])
    n_tot = g1_rows_np.shape[0]
    n_pad1 = pad_n(n_tot)
    g1_rows = jnp.asarray(pad_rows(g1_rows_np, n_pad1))
    g1_keys = jnp.asarray(np.concatenate([
        w_keys_np[:, :m + 1], w_keys_np[:, :m + 1],
        w_keys_np[:, 2:m + 1], h_std_np[:, :d],
        np.zeros((48, n_pad1 - n_tot), np.uint32)], axis=1))
    seg = jnp.asarray(np.concatenate([
        np.full(m + 1, 0), np.full(m + 1, 1), np.full(m - 1, 2),
        np.full(d, 3), np.full(n_pad1 - n_tot, 3)]).astype(np.int32))
    ws_g1 = sharded_msm_window_sums(g1, mesh, g1_keys, g1_rows,
                                    chunk_s, c, seg, 4, num_windows)

    n2_pad = pad_n(m + 1)
    b2_rows = jnp.asarray(pad2(params.B2[:m + 1], n2_pad))
    b2_keys = jnp.asarray(np.pad(
        w_keys_np[:, :m + 1],
        ((0, 0), (0, n2_pad - (m + 1)))).astype(np.uint32))
    ws_B2 = sharded_msm_window_sums(g2, mesh, b2_keys, b2_rows, chunk_s,
                                    c, None, 1, num_windows)

    # -- host assembly -------------------------------------------------------------
    p = curve.fq.p
    g1_pts = window_sums_to_host(g1, ws_g1, hg1, p, num_msms=4)
    At = finalize_msm(hg1, g1_pts[0])
    Bt1 = finalize_msm(hg1, g1_pts[1])
    Lt = finalize_msm(hg1, g1_pts[2])
    Ht = finalize_msm(hg1, g1_pts[3])
    Bt2 = finalize_msm(hg2, window_sums_to_host(g2, ws_B2, hg2, p))

    C = hg1.add(hg1.add(Ht, Lt), hg1.mul(inputs.r, Bt1))
    return (hg1.to_affine(At), hg2.to_affine(Bt2), hg1.to_affine(C))
