"""Device-accelerated trusted setup == exact host setup.

Both paths consume randomness identically, so with the same seed every
serialized byte must match (the generate_parameters contract,
libsnark/generate_parameters.cpp:23-123).
"""

import random

import pytest

# XLA:CPU compile-heavy (753-bit limb graphs): slow tier.
# Quick tier: `pytest -m "not slow"` (host oracle + serialization
# + native kernels), target < 10 min cold — see README.
pytestmark = pytest.mark.slow

pytest.importorskip("jax")

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
from gpu_groth16_prover_3x_tpu.host import groth16 as host_groth16
from gpu_groth16_prover_3x_tpu.models import setup_device


def test_setup_device_matches_host():
    seed = 0x5E7
    res_h = host_groth16.setup(MNT4753, 5, random.Random(seed))
    res_d = setup_device.setup(MNT4753, 5, random.Random(seed))
    assert res_d.d == res_h.d and res_d.m == res_h.m
    assert res_d.A == res_h.A
    assert res_d.B1 == res_h.B1
    assert res_d.B2 == res_h.B2
    assert res_d.L == res_h.L
    assert res_d.H == res_h.H
    assert res_d.w == res_h.w and res_d.r == res_h.r
    assert (res_d.ca, res_d.cb, res_d.cc) == (res_h.ca, res_h.cb, res_h.cc)


def test_batch_exp_block_checkpoint_cache(tmp_path, monkeypatch):
    """Blocked + checkpointed exponentiation == the direct run, and a
    cache-warm rerun is byte-identical (the crash-resume path the gate
    and bench generation rely on, BASELINE.md round-3 findings)."""
    from gpu_groth16_prover_3x_tpu.host import ec as host_ec

    rng = random.Random(0xB10C)
    scalars = [rng.randrange(MNT4753.fr.p) for _ in range(40)]
    gen = host_ec.g1_generator(MNT4753)

    want = setup_device.batch_exp_device(MNT4753, "g1", gen, scalars)

    monkeypatch.setenv("GROTH16_SETUP_CACHE", str(tmp_path))
    monkeypatch.setenv("GROTH16_EXP_BLOCK", "16")  # 40 -> 3 blocks
    got_cold = setup_device.batch_exp_device(MNT4753, "g1", gen, scalars)
    files = list(tmp_path.iterdir())
    assert len(files) == 4  # 3 block checkpoints + the whole-query entry
    got_warm = setup_device.batch_exp_device(MNT4753, "g1", gen, scalars)
    assert got_cold == want
    assert got_warm == want


@pytest.mark.parametrize("curve_name,group", [
    ("MNT4753", "g1"),
    ("MNT4753", "g2"),
    ("MNT6753", "g2"),        # deg-3 tower through the windowed ladder
])
def test_batch_exp_windowed_matches_scan(curve_name, group, monkeypatch):
    """Fixed-base windowed path == double-and-add path == host oracle
    (libff batch_exp semantics, multiexp.tcc:587-680)."""
    from gpu_groth16_prover_3x_tpu.curves.constants import CURVES
    from gpu_groth16_prover_3x_tpu.host import ec as host_ec

    curve = CURVES[curve_name]
    rng = random.Random(0xF1BED)
    gen = (host_ec.g1_generator(curve) if group == "g1"
           else host_ec.g2_generator(curve))
    hg = (host_ec.g1_group(curve) if group == "g1"
          else host_ec.g2_group(curve))
    # include the digit-0-heavy edge cases: 0, 1, tiny, p-1
    scalars = [0, 1, 255, 256, curve.fr.p - 1] + [
        rng.randrange(curve.fr.p) for _ in range(35)]

    monkeypatch.setenv("GROTH16_EXP_WINDOWED", "1")
    got = setup_device.batch_exp_device(curve, group, gen, scalars)
    monkeypatch.setenv("GROTH16_EXP_WINDOWED", "0")
    want = setup_device.batch_exp_device(curve, group, gen, scalars)
    assert got == want
    # spot-check vs the exact host group law
    for s, aff in list(zip(scalars, got))[:6]:
        assert hg.to_affine(hg.mul(s, gen)) == aff or (
            s == 0 and aff == want[0])
