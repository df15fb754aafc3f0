"""Multi-chip Groth16 prove step: DP-sharded MSMs + SP-sharded NTT.

The distributed composition of models/tpu_prover.py: points data-parallel
over the mesh for all five MSMs, the H-pipeline's NTT domain sharded with
all-to-all stage exchanges (parallel/sharded.py).  This is the "full
training step" analog used by __graft_entry__.dryrun_multichip and by the
scaling configs in BASELINE.md (2^22 single host / 2^24 pod slice).

The device computation — H pipeline, scalar from_monty, fused G1 MSM,
G2 MSM — runs as four phase-jits whose intermediate arrays stay
device-resident and sharded: no host round-trip between the NTT and the
MSMs (the reference's CPU<->GPU split at cuda_prover_piecewise.cu:174-193
has no reason to exist on TPU), and the independent MSM dispatches stay
async so XLA can overlap them the way the reference overlaps CUDA
streams with the CPU FFT.
"""

import time

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
from ..ops.msm import (finalize_msm, finalize_windows_native, pad_rows,
                       window_sums_to_host)
from ..ops.ntt import get_plan
from .sharded import (AXIS, ShardedNttPlan, get_sharded_plan,
                      sharded_msm_window_sums, sharded_ntt)


def compute_h_sharded(splan: ShardedNttPlan, mesh: Mesh, ca, cb, cc,
                      coset_t=None, coset_inv_t=None):
    """Distributed H pipeline (semantics of compute_H,
    libsnark/main.cpp:89-148) on domain-sharded (48, n) limb arrays.

    Elementwise stages (coset scaling, pointwise mul/sub, divide-by-Z)
    run as ordinary sharding-propagated XLA ops; only the NTTs exchange
    data (three all_to_alls each).  The O(n) coset tables should be
    passed as traced arguments (coset_t/coset_inv_t) so they don't embed
    as HLO literals (ops/ntt.NttPlan.device_tables rationale)."""
    plan = splan.plan
    F = plan.F

    if coset_t is None:
        coset_t = jnp.asarray(plan.coset)
    if coset_inv_t is None:
        coset_inv_t = jnp.asarray(plan.coset_inv)
    coset = Fel(coset_t.astype(jnp.uint32), 1)
    coset_inv = Fel(coset_inv_t.astype(jnp.uint32), 1)

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
    # digits for the H MSM: fully reduced below p (the reference's
    # from_monty is canonical, fp.tcc from_monty; mont_mul alone can
    # leave the value in [p, 2p))
    h_std = L.cond_sub_kp(F.ctx, F.mul(h, Fel(one_std, 1)).v, 1)
    return h.v, h_std


def prove_sharded(curve: CurveParams, params: DeviceParams,
                  inputs: DeviceInput, mesh: Mesh, chunk_s: int = 8,
                  c: int = 8, num_windows: int = None,
                  primary_input_size: int = 1, verbose: bool = False,
                  signed: bool = None, hostcall: bool = None,
                  block_points: int = None):
    """Distributed proof; returns affine (A, B2, C) host tuples.

    Mirrors models/tpu_prover.prove with every MSM points-sharded and the
    H pipeline domain-sharded, all fused into one jitted step.

    signed: None -> signed digits whenever the run covers all windows
    (the production prover's default; ops/msm.py's recoding borrow-ripple
    spans the full scalar, so partial-window runs must stay unsigned).
    hostcall: None -> the GROTH16_HOSTCALL_MULT env default; a bool
    scopes callback-mults to THIS call via limbs.hostcall_scope (no
    process-wide env mutation — the dryrun passes True explicitly).
    block_points: HBM streaming for the G1 MSM, exactly like the
    single-chip prover's GROTH16_MSM_BLOCK_POINTS path (tpu_prover.py):
    rows stay host-resident and ship in bounded GLOBAL blocks (each
    points-sharded over the mesh), per-block window sums combining on
    device by MSM linearity.  None -> the env knob, else on by default
    past 2^22 rows per chip (the BASELINE 2^24 pod config's requirement).
    """
    if signed is None:
        signed = num_windows is None
    _T0 = time.time()

    def log(msg):
        if verbose:
            print(f"[prove_sharded +{time.time()-_T0:.1f}s] {msg}",
                  flush=True)

    g1 = get_curve_ops(curve, "g1")
    g2 = get_curve_ops(curve, "g2")
    frops = fr_ops(curve)
    hg1 = host_ec.g1_group(curve)
    hg2 = host_ec.g2_group(curve)
    d, m = params.d, params.m
    if g1.qbits != 16:
        # radix-15 Fq: serialized rows -> R' domain (see tpu_prover)
        from ..ops.msm import rows_at_fq_radix as _rx
        from ..models.tpu_prover import DeviceParams as _DP
        p_ = curve.fq.p
        params = _DP(d, m, _rx(p_, np.asarray(params.A)),
                     _rx(p_, np.asarray(params.B1)),
                     _rx(p_, np.asarray(params.B2)),
                     _rx(p_, np.asarray(params.L)),
                     _rx(p_, np.asarray(params.H)))
    ndev = mesh.shape[AXIS]
    quantum = ndev * chunk_s

    def pad_n(n):
        return max(quantum, ((n + quantum - 1) // quantum) * quantum)

    plan = get_plan(curve.fr, d + 1)
    splan = get_sharded_plan(plan, ndev)
    shard_cols = NamedSharding(mesh, P(None, AXIS))
    shard_rows = NamedSharding(mesh, P(AXIS, None))

    def put_cols(rows_np):
        arr = jnp.asarray(np.ascontiguousarray(rows_np.T).astype(np.uint32))
        return jax.device_put(arr, shard_cols)

    # -- host-side data prep (numpy only; no device math) --------------------
    # witness scalars padded to a shardable length (extra zeros decode to
    # zero digits -> weight-0 buckets)
    w_rows = inputs.w_mont
    w_pad = ((w_rows.shape[0] + ndev - 1) // ndev) * ndev
    if w_pad != w_rows.shape[0]:
        w_rows = np.concatenate([
            w_rows, np.zeros((w_pad - w_rows.shape[0], 48), w_rows.dtype)])

    # L query skips the primary inputs: scalars w[primary+1 .. m]
    # (cuda_prover_piecewise.cu:167's `w + (primary+1)*ELT_LIMBS` offset)
    pi1 = primary_input_size + 1
    nL = np.asarray(params.L).shape[0]
    g1_rows_np = np.concatenate([
        np.asarray(params.A)[:m + 1], np.asarray(params.B1)[:m + 1],
        np.asarray(params.L)[:nL], np.asarray(params.H)[:d]])
    n_tot = g1_rows_np.shape[0]
    n_pad1 = pad_n(n_tot)
    seg_np = np.concatenate([
        np.full(m + 1, 0), np.full(m + 1, 1), np.full(nL, 2),
        np.full(d, 3), np.full(n_pad1 - n_tot, 3)]).astype(np.int32)
    n2_pad = pad_n(m + 1)

    if block_points is None:
        import os
        blk_env = os.environ.get("GROTH16_MSM_BLOCK_POINTS")
        if blk_env is not None:
            block_points = int(blk_env) or None
        elif n_pad1 > (1 << 22) * ndev:
            block_points = (1 << 21) * ndev   # 2^21 rows resident per chip
    if block_points is not None:
        # round the global block to the shard/chunk quantum
        block_points = max(quantum,
                           (block_points // quantum) * quantum)
    stream_g1 = block_points is not None and block_points < n_pad1

    dev_in = dict(
        ca=put_cols(inputs.ca), cb=put_cols(inputs.cb),
        cc=put_cols(inputs.cc), w_mont=put_cols(w_rows),
        seg=jax.device_put(jnp.asarray(seg_np), NamedSharding(mesh, P(AXIS))),
        b2_rows=jax.device_put(
            jnp.asarray(pad_rows(np.asarray(params.B2)[:m + 1], n2_pad)),
            shard_rows),
    )
    if not stream_g1:
        dev_in["g1_rows"] = jax.device_put(
            jnp.asarray(pad_rows(g1_rows_np, n_pad1)), shard_rows)
    log(f"inputs staged (g1 n={n_pad1}, g2 n={n2_pad}, "
        f"stream_g1={stream_g1})")

    one_std_np = np.zeros((L.NUM_LIMBS, 1), np.uint32)
    one_std_np[0, 0] = 1

    # The step is four phase-jits (H pipeline / from_monty / G1 MSM /
    # G2 MSM).  Arrays pass between phases as device-resident sharded
    # jax arrays — no host sync anywhere before the final window-sum
    # readback — while each phase stays a separately-compiled program
    # (XLA's pass pipeline is superlinear in program size; the fused
    # one-jit variant compiles far slower for zero runtime benefit, the
    # phases being data-dependent).

    def h_phase(ca, cb, cc, coset_t, coset_inv_t):
        return compute_h_sharded(splan, mesh, ca, cb, cc,
                                 coset_t, coset_inv_t)[1]

    def keys_phase(w_mont):
        # scalars out of Montgomery, fully reduced (device from_monty)
        return L.cond_sub_kp(
            frops.ctx,
            frops.mul(Fel(w_mont, 1), Fel(jnp.asarray(one_std_np), 1)).v, 1)

    # Dryrun (hostcall) mode: the H pipeline is traced with callback
    # multiplies (its XLA:CPU compile is otherwise pathological), while
    # the MSM phases always trace real XLA kernels — callbacks inside
    # the deep scan/while bodies convoy on the GIL under multi-partition
    # CPU execution and starve XLA's collective rendezvous.
    if hostcall is None:
        hostcall = L._hostcall_mult()
    else:
        hostcall = bool(hostcall) and L._cpu_backend()

    def g1_phase(w_keys, h_std, g1_rows, seg):
        # fused G1 MSM (A / B1 / L / H in one kernel)
        g1_keys = jnp.concatenate([
            w_keys[:, :m + 1], w_keys[:, :m + 1],
            w_keys[:, pi1:pi1 + nL], h_std[:, :d],
            jnp.zeros((L.NUM_LIMBS, n_pad1 - n_tot), jnp.uint32)], axis=1)
        return sharded_msm_window_sums(g1, mesh, g1_keys, g1_rows,
                                       chunk_s, c, seg, 4, num_windows,
                                       signed=signed)

    def g2_phase(w_keys, b2_rows):
        b2_keys = jnp.pad(w_keys[:, :m + 1],
                          ((0, 0), (0, n2_pad - (m + 1))))
        return sharded_msm_window_sums(g2, mesh, b2_keys, b2_rows,
                                       chunk_s, c, None, 1, num_windows,
                                       signed=signed)

    def sync(x):
        # under verbose (dryrun) force per-phase completion so the
        # progress log separates compile+run per phase; in production
        # leave dispatches async so XLA can overlap the independent DAGs
        if verbose:
            jax.block_until_ready(x)
        return x

    log("compiling + running the distributed prove step (4 phase-jits)")
    with L.hostcall_scope(hostcall):
        h_std = sync(jax.jit(h_phase)(dev_in["ca"], dev_in["cb"],
                                      dev_in["cc"],
                                      jnp.asarray(splan.plan.coset),
                                      jnp.asarray(splan.plan.coset_inv)))
        log("H pipeline done")
        w_keys = sync(jax.jit(keys_phase)(dev_in["w_mont"]))
        log("from_monty done")
    with L.hostcall_scope(False):
        if stream_g1:
            # host-resident rows in bounded sharded blocks; per-block
            # window sums add by MSM linearity (combine_window_sums) —
            # the multi-chip twin of msm_window_sums_streamed
            from ..ops.msm import combine_window_sums
            g1_keys_np = np.concatenate([
                np.asarray(w_keys)[:, :m + 1], np.asarray(w_keys)[:, :m + 1],
                np.asarray(w_keys)[:, pi1:pi1 + nL],
                np.asarray(h_std)[:, :d],
                np.zeros((48, n_pad1 - n_tot), np.uint32)], axis=1)
            rows_full = pad_rows(g1_rows_np, n_pad1)
            B = block_points
            ws_g1 = None
            for lo in range(0, n_pad1, B):
                hi = min(lo + B, n_pad1)
                rows_b = pad_rows(np.asarray(rows_full[lo:hi]), B)
                keys_b = np.zeros((48, B), np.uint32)
                keys_b[:, :hi - lo] = g1_keys_np[:, lo:hi]
                seg_b = np.full((B,), 3, np.int32)
                seg_b[:hi - lo] = seg_np[lo:hi]
                ws_b = sharded_msm_window_sums(
                    g1, mesh,
                    jax.device_put(jnp.asarray(keys_b), shard_cols),
                    jax.device_put(jnp.asarray(rows_b), shard_rows),
                    chunk_s, c,
                    jax.device_put(jnp.asarray(seg_b),
                                   NamedSharding(mesh, P(AXIS))),
                    4, num_windows, signed=signed)
                ws_g1 = ws_b if ws_g1 is None else \
                    combine_window_sums(g1, ws_g1, ws_b)
                log(f"G1 block [{lo}, {hi}) done")
            sync(ws_g1)
        else:
            ws_g1 = sync(jax.jit(g1_phase)(w_keys, h_std,
                                           dev_in["g1_rows"],
                                           dev_in["seg"]))
        log("G1 fused MSM done")
        ws_B2 = jax.jit(g2_phase)(w_keys, dev_in["b2_rows"])
        jax.block_until_ready(ws_B2)
    log("G2 MSM done; device step complete")

    # -- host assembly -------------------------------------------------------
    p = curve.fq.p

    def finalize(cops_grp, hg, ws, num_msms):
        """Combined window sums -> per-MSM group elements (native C
        Horner epilogue when available, like the single-chip prover)."""
        res = finalize_windows_native(cops_grp, hg, ws, p, c, num_msms)
        if res is not None:
            return res if num_msms > 1 else [res]
        pts = window_sums_to_host(cops_grp, ws, p, num_msms)
        pts = pts if num_msms > 1 else [pts]
        return [finalize_msm(hg, pl, c, num_windows) for pl in pts]

    At, Bt1, Lt, Ht = finalize(g1, hg1, ws_g1, 4)
    Bt2 = finalize(g2, hg2, ws_B2, 1)[0]
    log("host assembly done")

    C = hg1.add(hg1.add(Ht, Lt), hg1.mul(inputs.r, Bt1))
    return (hg1.to_affine(At), hg2.to_affine(Bt2), hg1.to_affine(C))
