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
                  c: int = 8):
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

    # -- MSMs (points-DP) --------------------------------------------------------
    def launch(cops, rows, keys, n):
        n_pad = pad_n(n)
        rows_p = jnp.asarray(pad_rows(np.asarray(rows)[:n], n_pad))
        keys_np = np.asarray(keys)[:, :n]
        keys_p = jnp.asarray(np.pad(
            keys_np, ((0, 0), (0, n_pad - n))).astype(np.uint32))
        return sharded_msm_window_sums(cops, mesh, keys_p, rows_p,
                                       chunk_s, c)

    ws_A = launch(g1, params.A, w_keys, m + 1)
    ws_B1 = launch(g1, params.B1, w_keys, m + 1)
    ws_B2 = launch(g2, params.B2, w_keys, m + 1)
    ws_L = launch(g1, params.L, np.asarray(w_keys)[:, 2:], m - 1)
    ws_H = launch(g1, params.H, h_std, d)

    # -- host assembly -------------------------------------------------------------
    p = curve.fq.p

    def host_pts(cops, hg, ws):
        # ws: tuple of (WINDOWS, 48, 1) combined arrays
        return finalize_msm(hg, window_sums_to_host(cops, ws, hg, p))

    At = host_pts(g1, hg1, ws_A)
    Bt1 = host_pts(g1, hg1, ws_B1)
    Bt2 = host_pts(g2, hg2, ws_B2)
    Lt = host_pts(g1, hg1, ws_L)
    Ht = host_pts(g1, hg1, ws_H)

    C = hg1.add(hg1.add(Ht, Lt), hg1.mul(inputs.r, Bt1))
    return (hg1.to_affine(At), hg2.to_affine(Bt2), hg1.to_affine(C))
