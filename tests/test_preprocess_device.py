"""Device preprocessed-table builder == host oracle tables, byte-exact
(the `<CURVE>_preprocessed` contract, libsnark/main.cpp:311-339)."""

import random

import pytest

# XLA:CPU compile-heavy (753-bit limb graphs): slow tier.
# Quick tier: `pytest -m "not slow"` (host oracle + serialization
# + native kernels), target < 10 min cold — see README.
pytestmark = pytest.mark.slow

pytest.importorskip("jax")

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
from gpu_groth16_prover_3x_tpu.host import groth16 as host_groth16
from gpu_groth16_prover_3x_tpu.models import cpu_prover, preprocess_device
from gpu_groth16_prover_3x_tpu.models.tpu_prover import params_from_host
from gpu_groth16_prover_3x_tpu.utils.serialization import (Groth16Params,
                                                           write_params)


def test_preprocess_device_matches_host(tmp_path):
    curve = MNT4753
    res = host_groth16.setup(curve, 4, random.Random(0xF11E))
    hp = Groth16Params(res.d, res.m, res.A, res.B1, res.B2, res.L, res.H)
    pfile = tmp_path / "params"
    write_params(str(pfile), curve, res.d, res.m,
                 res.A, res.B1, res.B2, res.L, res.H)

    host_out = tmp_path / "pre_host"
    cpu_prover.run_preprocess(curve, str(pfile), str(host_out))
    dev_out = tmp_path / "pre_dev"
    preprocess_device.run_preprocess(curve, str(pfile), str(dev_out))
    assert host_out.read_bytes() == dev_out.read_bytes()
