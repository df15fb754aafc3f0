"""End-to-end: TPU prover output is byte-identical to the CPU oracle
prover — the reference's own correctness criterion (sha256-compared
output files, README.md:54-57), at test scale for both curves."""

import hashlib
import random

import pytest

# XLA:CPU compile-heavy (753-bit limb graphs): slow tier.
# Quick tier: `pytest -m "not slow"` (host oracle + serialization
# + native kernels), target < 10 min cold — see README.
pytestmark = pytest.mark.slow

pytest.importorskip("jax")

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753, MNT6753
from gpu_groth16_prover_3x_tpu.host import groth16 as host_groth16
from gpu_groth16_prover_3x_tpu.models import tpu_prover
from gpu_groth16_prover_3x_tpu.utils.serialization import (Groth16Input,
                                                           Groth16Params)


def _roundtrip(curve, log2_d, tmp_path, seed):
    res = host_groth16.setup(curve, log2_d, random.Random(seed))
    hp = Groth16Params(res.d, res.m, res.A, res.B1, res.B2, res.L, res.H)
    hi = Groth16Input(res.w, res.ca, res.cb, res.cc, res.r)

    # oracle proof (host, exact)
    want = host_groth16.prove(curve, hp, hi)
    assert host_groth16.verify_with_trapdoor(curve, res, *want)

    # device proof through the real file path (bitcast limb loads)
    from gpu_groth16_prover_3x_tpu.utils import serialization as ser
    pfile = tmp_path / f"{curve.name}-parameters"
    ifile = tmp_path / f"{curve.name}-input"
    ser.write_params(str(pfile), curve, res.d, res.m,
                     res.A, res.B1, res.B2, res.L, res.H)
    ser.write_input(str(ifile), curve, res.w, res.ca, res.cb, res.cc, res.r)
    params = tpu_prover.load_params(str(pfile), curve)
    inputs = tpu_prover.load_input(str(ifile), curve, params.d, params.m)
    got = tpu_prover.prove(curve, params, inputs, chunk_s=8)

    # byte-identical serialized proofs (the sha256 gate)
    ofile_cpu = tmp_path / "out-cpu"
    ofile_tpu = tmp_path / "out-tpu"
    ser.write_output(str(ofile_cpu), curve, *want)
    ser.write_output(str(ofile_tpu), curve, *got)
    h_cpu = hashlib.sha256(ofile_cpu.read_bytes()).hexdigest()
    h_tpu = hashlib.sha256(ofile_tpu.read_bytes()).hexdigest()
    assert h_cpu == h_tpu


def test_e2e_mnt4753(tmp_path):
    _roundtrip(MNT4753, 6, tmp_path, 0x4753)


def test_e2e_mnt6753(tmp_path):
    _roundtrip(MNT6753, 5, tmp_path, 0x6753)


@pytest.mark.parametrize("curve,log2_d,seed", [
    (MNT4753, 5, 0x7AB1),
    (MNT6753, 4, 0x7AB2),
])
def test_e2e_tables_path(curve, log2_d, seed, tmp_path):
    """preprocess -> prove(tables=...) == plain Pippenger proof == oracle,
    byte-identical (the reference's table path is the ONLY prover path,
    cuda_prover_piecewise.cu:125-141; here both must serialize the same
    bytes — the claim at models/tpu_prover.py prove())."""
    from gpu_groth16_prover_3x_tpu.models import preprocess_device
    from gpu_groth16_prover_3x_tpu.utils import serialization as ser

    res = host_groth16.setup(curve, log2_d, random.Random(seed))
    hp = Groth16Params(res.d, res.m, res.A, res.B1, res.B2, res.L, res.H)
    hi = Groth16Input(res.w, res.ca, res.cb, res.cc, res.r)
    want = host_groth16.prove(curve, hp, hi)

    pfile = tmp_path / f"{curve.name}-parameters"
    ifile = tmp_path / f"{curve.name}-input"
    tfile = tmp_path / f"{curve.name}_preprocessed"
    ser.write_params(str(pfile), curve, res.d, res.m,
                     res.A, res.B1, res.B2, res.L, res.H)
    ser.write_input(str(ifile), curve, res.w, res.ca, res.cb, res.cc, res.r)
    preprocess_device.run_preprocess(curve, str(pfile), str(tfile))

    params = tpu_prover.load_params(str(pfile), curve)
    inputs = tpu_prover.load_input(str(ifile), curve, params.d, params.m)
    tables = tpu_prover.load_preprocessed(str(tfile), curve, params.m,
                                          params.L.shape[0])
    got_tables = tpu_prover.prove(curve, params, inputs, chunk_s=8,
                                  tables=tables)
    got_plain = tpu_prover.prove(curve, params, inputs, chunk_s=8)

    outs = {}
    for name, proof in (("oracle", want), ("tables", got_tables),
                        ("plain", got_plain)):
        of = tmp_path / f"out-{name}"
        ser.write_output(str(of), curve, *proof)
        outs[name] = hashlib.sha256(of.read_bytes()).hexdigest()
    assert outs["tables"] == outs["oracle"], outs
    assert outs["plain"] == outs["oracle"], outs
