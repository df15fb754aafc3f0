"""Multi-chip sharding on the 8-virtual-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8): distributed NTT == host FFT,
sharded MSM == oracle, full distributed prove == oracle proof — the
capability the reference never had (SURVEY.md §2.6)."""

import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.sharding import Mesh

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
from gpu_groth16_prover_3x_tpu.host import ec as host_ec
from gpu_groth16_prover_3x_tpu.host import msm as host_msm
from gpu_groth16_prover_3x_tpu.host.fft import Radix2Domain
from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops
from gpu_groth16_prover_3x_tpu.ops.msm import (affine_points_to_rows,
                                               finalize_msm, pad_rows,
                                               scalars_to_limbs,
                                               window_sums_to_host)
from gpu_groth16_prover_3x_tpu.ops.ntt import get_plan
from gpu_groth16_prover_3x_tpu.parallel.sharded import (
    get_sharded_plan, sharded_msm_window_sums, sharded_ntt)
from gpu_groth16_prover_3x_tpu.utils.serialization import (ints_to_u16x48,
                                                           u16x48_to_ints)

NDEV = 4


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < NDEV:
        pytest.skip("needs >=4 virtual devices")
    return Mesh(np.array(devs[:NDEV]), ("data",))


def test_sharded_ntt_matches_host(mesh, rng):
    curve = MNT4753
    fr = curve.fr
    n = 64                       # n1 = n2 = 8, divisible by 4 devices
    dom = Radix2Domain(fr, n)
    plan = get_plan(fr, n)
    splan = get_sharded_plan(plan, NDEV)
    vals = [rng.randrange(fr.p) for _ in range(n)]
    x = jnp.asarray(ints_to_u16x48(vals, fr.p).T.astype(np.uint32))
    got = u16x48_to_ints(np.asarray(sharded_ntt(splan, mesh, x)).T, fr.p)
    assert [g % fr.p for g in got] == dom.fft(list(vals))
    got = u16x48_to_ints(
        np.asarray(sharded_ntt(splan, mesh, x, inverse=True)).T, fr.p)
    assert [g % fr.p for g in got] == dom.ifft(list(vals))


@pytest.mark.slow
@pytest.mark.parametrize("curve_name,log2_d", [
    ("MNT4753", 5),
    ("MNT6753", 4),     # the deg-3 tower across the mesh
])
def test_prove_sharded_matches_oracle(mesh, curve_name, log2_d):
    """Full distributed prove (signed digits, ALL windows, the production
    configuration of parallel/prover.prove_sharded) == the exact host
    oracle proof, for both curves.  The single-chip e2e analog is
    tests/test_tpu_prover_e2e.py; here every MSM is points-sharded over
    the 4-device mesh and the H pipeline runs the all-to-all NTT."""
    import random as _random

    from gpu_groth16_prover_3x_tpu.curves.constants import CURVES
    from gpu_groth16_prover_3x_tpu.host import groth16 as host_groth16
    from gpu_groth16_prover_3x_tpu.models.tpu_prover import (
        input_from_host, params_from_host)
    from gpu_groth16_prover_3x_tpu.parallel.prover import prove_sharded
    from gpu_groth16_prover_3x_tpu.utils.serialization import (
        Groth16Input, Groth16Params)

    curve = CURVES[curve_name]
    res = host_groth16.setup(curve, log2_d, _random.Random(0xD15D))
    hp = Groth16Params(res.d, res.m, res.A, res.B1, res.B2, res.L, res.H)
    hi = Groth16Input(res.w, res.ca, res.cb, res.cc, res.r)
    params = params_from_host(curve, hp)
    inputs = input_from_host(curve, hi)
    # production shape: signed defaults ON (full windows); c=8 keeps the
    # XLA:CPU bucket reduction small while exercising the same recoding,
    # collectives and kernels the hardware path runs (proofs are
    # c-invariant); hostcall NTT bounds the XLA:CPU compile pathology
    # (which needs the GSPMD lowering — Shardy cannot place a host
    # callback's maximal sharding inside shard_map, see __graft_entry__)
    prev = jax.config.jax_use_shardy_partitioner
    jax.config.update("jax_use_shardy_partitioner", False)
    try:
        proof = prove_sharded(curve, params, inputs, mesh, chunk_s=4, c=8,
                              hostcall=True)
    finally:
        jax.config.update("jax_use_shardy_partitioner", prev)
    expected = host_groth16.prove(curve, hp, hi)
    assert proof == expected


def test_sharded_msm_matches_oracle(mesh, rng):
    curve = MNT4753
    dev = get_curve_ops(curve, "g1")
    hg = host_ec.g1_group(curve)
    gen = host_ec.g1_generator(curve)
    n = 64
    scalars = [rng.randrange(curve.fr.p) for _ in range(n)]
    pts_j = [hg.mul(rng.randrange(1, curve.fr.p), gen) for _ in range(n)]
    pts = [hg.to_affine(pt) for pt in pts_j]
    rows = jnp.asarray(affine_points_to_rows(pts, curve.fq.p, 1))
    keys = jnp.asarray(scalars_to_limbs(scalars))
    ws = sharded_msm_window_sums(dev, mesh, keys, rows, chunk_s=4, c=8)
    got = finalize_msm(
        hg, window_sums_to_host(dev, ws, curve.fq.p))
    want = host_msm.msm(hg, scalars, pts_j)
    assert hg.equal(got, want)

    # streamed blocks across the mesh (parallel/prover's block path):
    # per-block sharded window sums combined by MSM linearity must give
    # the same sums as the one-pass run above
    from gpu_groth16_prover_3x_tpu.ops.msm import combine_window_sums
    B = 32   # two blocks of 32 = 2 * (NDEV * chunk_s)
    acc = None
    for lo in range(0, n, B):
        ws_b = sharded_msm_window_sums(
            dev, mesh, keys[:, lo:lo + B],
            jnp.asarray(affine_points_to_rows(pts[lo:lo + B],
                                              curve.fq.p, 1)),
            chunk_s=4, c=8)
        acc = ws_b if acc is None else combine_window_sums(dev, acc, ws_b)
    got_b = finalize_msm(hg, window_sums_to_host(dev, acc, curve.fq.p))
    assert hg.equal(got_b, want)
