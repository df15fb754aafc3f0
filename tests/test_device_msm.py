"""Device Pippenger MSM vs the host oracle MSM (multiexp.tcc semantics),
including the adversarial shapes the sort/segmented-scan path must survive:
zero scalars, duplicate points, identity points, and uniform digits (one
run spanning every chunk)."""

import random

import pytest

# XLA:CPU compile-heavy (753-bit limb graphs): slow tier.
# Quick tier: `pytest -m "not slow"` (host oracle + serialization
# + native kernels), target < 10 min cold — see README.
pytestmark = pytest.mark.slow

jnp = pytest.importorskip("jax.numpy")

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753, MNT6753
from gpu_groth16_prover_3x_tpu.host import ec as host_ec
from gpu_groth16_prover_3x_tpu.host import msm as host_msm
from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops
from gpu_groth16_prover_3x_tpu.ops.msm import msm_device


def fixtures(curve, group, rng, n):
    dev = get_curve_ops(curve, group)
    hg = (host_ec.g1_group(curve) if group == "g1"
          else host_ec.g2_group(curve))
    gen = (host_ec.g1_generator(curve) if group == "g1"
           else host_ec.g2_generator(curve))
    scalars = [rng.randrange(curve.fr.p) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = curve.fr.p - 1
    scalars[2] = scalars[3] = (7 << 300) | 7      # shared digits
    pts_j = [hg.mul(rng.randrange(1, curve.fr.p), gen) for _ in range(n)]
    pts_j[4] = hg.zero                            # identity with live scalar
    pts_j[5] = pts_j[6]                           # duplicate base
    pts = [hg.to_affine(pt) for pt in pts_j]
    return dev, hg, scalars, pts_j, pts


@pytest.mark.parametrize("curve,group,n,chunk,c,signed", [
    (MNT4753, "g1", 64, 16, 8, False),
    (MNT4753, "g1", 50, 16, 8, False),     # padding path
    (MNT4753, "g1", 64, 16, 8, True),      # signed digits (negated adds)
    (MNT4753, "g1", 50, 16, 4, True),      # signed + padding
    (MNT4753, "g2", 32, 8, 8, False),
    # deg-3 towers use nibble windows on the CPU backend: the 2^8-bucket
    # deg-3 reduction costs ~13 min of XLA:CPU compile+run (the c=8 path
    # is exercised on real TPU hardware by the e2e CLI gates)
    (MNT6753, "g2", 32, 8, 4, False),
    (MNT6753, "g2", 32, 8, 4, True),
])
def test_msm_vs_oracle(curve, group, n, chunk, c, signed, rng):
    dev, hg, scalars, pts_j, pts = fixtures(curve, group, rng, n)
    want = host_msm.msm(hg, scalars, pts_j)
    got = msm_device(dev, hg, scalars, pts, curve.fq.p, chunk_s=chunk, c=c,
                     signed=signed)
    assert hg.equal(got, want)


def test_msm_signed_adversarial_digits(rng):
    """Scalars built to stress the borrow ripple: maximal 0x8000/0xffff
    digit chains (carry propagation through every window) and the
    boundary digits 0x7fff / 0x8000."""
    curve = MNT4753
    dev = get_curve_ops(curve, "g1")
    hg = host_ec.g1_group(curve)
    gen = host_ec.g1_generator(curve)
    n = 32
    pts_j = [hg.mul(rng.randrange(1, curve.fr.p), gen) for _ in range(n)]
    pts = [hg.to_affine(pt) for pt in pts_j]
    scalars = [
        0,
        int("8000" * 40, 16),            # all-0x8000 ripple chain
        int("ffff" * 40, 16),            # all-0xffff (digit -1 everywhere)
        int("7fff" * 40, 16),            # no recoding at all
        int("8000" + "7fff" * 39, 16),   # carry flips 0x7fff to -0x8000
        0x8000, 0x7fff, curve.fr.p - 1,
    ]
    scalars += [rng.randrange(curve.fr.p) for _ in range(n - len(scalars))]
    want = host_msm.msm(hg, scalars, pts_j)
    got = msm_device(dev, hg, scalars, pts, curve.fq.p, chunk_s=8, c=8,
                     signed=True)
    assert hg.equal(got, want)


def test_msm_fused_multi(rng):
    """Fused multi-MSM: two G1 MSMs in one window kernel must each match
    their individual oracle results."""
    import numpy as np
    import jax.numpy as jnp
    from gpu_groth16_prover_3x_tpu.ops.msm import (
        affine_points_to_rows, finalize_msm, msm_window_sums, pad_rows,
        scalars_to_limbs, window_sums_to_host)
    curve = MNT4753
    dev = get_curve_ops(curve, "g1")
    hg = host_ec.g1_group(curve)
    _, _, s1, pj1, pts1 = fixtures(curve, "g1", rng, 24)
    _, _, s2, pj2, pts2 = fixtures(curve, "g1", rng, 40)
    rows = np.concatenate([
        affine_points_to_rows(pts1, curve.fq.p, 1),
        affine_points_to_rows(pts2, curve.fq.p, 1)])
    keys = scalars_to_limbs(s1 + s2)
    seg = np.concatenate([np.zeros(24), np.ones(40)]).astype(np.int32)
    ws = msm_window_sums(dev, jnp.asarray(keys), jnp.asarray(rows), 16, 8,
                         jnp.asarray(seg), 2)
    pts_by_msm = window_sums_to_host(dev, ws, curve.fq.p, num_msms=2)
    got1 = finalize_msm(hg, pts_by_msm[0])
    got2 = finalize_msm(hg, pts_by_msm[1])
    assert hg.equal(got1, host_msm.msm(hg, s1, pj1))
    assert hg.equal(got2, host_msm.msm(hg, s2, pj2))


def test_msm_uniform_digit_run(rng):
    """One bucket receives every point: the single-run carry chain must
    traverse all chunks (the Hillis-Steele while_loop's worst case)."""
    curve = MNT4753
    dev = get_curve_ops(curve, "g1")
    hg = host_ec.g1_group(curve)
    gen = host_ec.g1_generator(curve)
    n = 64
    pts_j = [hg.mul(i + 1, gen) for i in range(n)]
    pts = [hg.to_affine(pt) for pt in pts_j]
    scalars = [0x5555] * n
    want = host_msm.msm_naive(hg, scalars, pts_j)
    got = msm_device(dev, hg, scalars, pts, curve.fq.p, chunk_s=16, c=8)
    assert hg.equal(got, want)


def test_msm_streamed_blocks(rng):
    """HBM-streaming path: bounded point blocks + device window-sum
    combine must equal the single-pass result bit-for-bit at the proof
    level (MSM linearity across blocks)."""
    import numpy as np
    from gpu_groth16_prover_3x_tpu.ops.msm import (
        affine_points_to_rows, finalize_msm, msm_window_sums_streamed,
        scalars_to_limbs, window_sums_to_host)
    curve = MNT4753
    dev = get_curve_ops(curve, "g1")
    hg = host_ec.g1_group(curve)
    _, _, scalars, pts_j, pts = fixtures(curve, "g1", rng, 64)
    rows = affine_points_to_rows(pts, curve.fq.p, 1)
    keys = scalars_to_limbs(scalars)
    seg = (np.arange(64) % 2).astype(np.int32)   # two fused MSMs
    ws = msm_window_sums_streamed(dev, keys, rows, 16, 8, seg, 2,
                                  block_points=24)  # 3 uneven blocks
    pts_by_msm = window_sums_to_host(dev, ws, curve.fq.p, num_msms=2)
    for msm_i in range(2):
        want = host_msm.msm(
            hg, [s for s, g in zip(scalars, seg) if g == msm_i],
            [pt for pt, g in zip(pts_j, seg) if g == msm_i])
        got = finalize_msm(hg, pts_by_msm[msm_i], 8)
        assert hg.equal(got, want)
