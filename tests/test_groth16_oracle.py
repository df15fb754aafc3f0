"""End-to-end oracle pipeline tests: setup -> files -> prove -> verify.

This is the framework's analog of the reference's golden-file test
(README.md:54-57): the oracle prover here defines the sha256 contract the
TPU prover must match, and is itself validated by the exponent-space
Groth16 equations via the setup trapdoor.
"""

import hashlib
import random

import pytest

from gpu_groth16_prover_3x_tpu.curves.constants import CURVES, MNT4753, MNT6753
from gpu_groth16_prover_3x_tpu.host import groth16
from gpu_groth16_prover_3x_tpu.models import cpu_prover, setup as setup_model
from gpu_groth16_prover_3x_tpu.utils import serialization as ser
from gpu_groth16_prover_3x_tpu.utils.profiling import set_profiling_enabled

set_profiling_enabled(False)

LOG2_D = 6  # 64-point domain: fast but exercises every pipeline stage


@pytest.fixture(scope="module", params=["MNT4753", "MNT6753"])
def pipeline(request, tmp_path_factory):
    curve = CURVES[request.param]
    tmp = tmp_path_factory.mktemp(request.param)
    rng = random.Random(12345)
    result = groth16.setup(curve, LOG2_D, rng)
    params_path = str(tmp / "params")
    input_path = str(tmp / "input")
    ser.write_params(params_path, curve, result.d, result.m, result.A,
                     result.B1, result.B2, result.L, result.H)
    ser.write_input(input_path, curve, result.w, result.ca, result.cb,
                    result.cc, result.r)
    return curve, result, params_path, input_path, tmp


def test_setup_shapes(pipeline):
    curve, result, *_ = pipeline
    d = (1 << LOG2_D) - 1
    assert result.d == d
    assert result.m == d + 1
    assert len(result.A) == result.m + 1
    assert len(result.L) == result.m - 1
    assert len(result.H) == result.d
    assert len(result.ca) == d + 1


def test_params_file_round_trip(pipeline):
    curve, result, params_path, input_path, _ = pipeline
    params = ser.read_params(params_path, curve)
    assert (params.d, params.m) == (result.d, result.m)
    assert params.A == result.A
    assert params.B2 == result.B2
    assert params.H == result.H
    inputs = ser.read_input(input_path, curve, params.d, params.m)
    assert inputs.w == result.w
    assert inputs.r == result.r
    assert inputs.cc == result.cc


def test_prove_and_verify(pipeline):
    curve, result, params_path, input_path, tmp = pipeline
    params = ser.read_params(params_path, curve)
    inputs = ser.read_input(input_path, curve, params.d, params.m)
    a, b, c = groth16.prove(curve, params, inputs)
    assert groth16.verify_with_trapdoor(curve, result, a, b, c)
    # corrupting the witness must fail verification
    bad = groth16.SetupResult(**{**result.__dict__})
    bad.w = list(result.w)
    bad.w[3] = (bad.w[3] + 1) % curve.fr.p
    assert not groth16.verify_with_trapdoor(curve, bad, a, b, c)


def test_prover_is_deterministic(pipeline):
    """The sha256 contract: same inputs -> bit-identical output files."""
    curve, result, params_path, input_path, tmp = pipeline
    out1, out2 = str(tmp / "out1"), str(tmp / "out2")
    cpu_prover.run_prover(curve, params_path, input_path, out1)
    cpu_prover.run_prover(curve, params_path, input_path, out2)
    h1 = hashlib.sha256(open(out1, "rb").read()).hexdigest()
    h2 = hashlib.sha256(open(out2, "rb").read()).hexdigest()
    assert h1 == h2
    # output is exactly G1 + G2 + G1
    deg = curve.ext_degree
    assert len(open(out1, "rb").read()) == 96 * (2 + 2 * deg + 2)


def test_h_pipeline_qap_identity(pipeline):
    """A(t)B(t) - C(t) == H(t)Z(t) with H from the FFT pipeline."""
    curve, result, *_ = pipeline
    td = result.trapdoor
    p = curve.fr.p
    h = groth16.compute_h(curve, result.d, result.ca, result.cb, result.cc)
    # qap degree n = d+1: coefficients n-1 and n vanish for honest
    # witnesses while n-2 does not (r1cs_gg_ppzksnark.tcc:395-399)
    assert h[result.d] == 0
    assert h[result.d + 1] == 0
    assert h[result.d - 1] != 0
    h_at_t = 0
    ti = 1
    for coeff in h[:result.d]:
        h_at_t = (h_at_t + coeff * ti) % p
        ti = ti * td.t % p
    a_s = sum(wi * ai for wi, ai in zip(result.w, td.at)) % p
    b_s = sum(wi * bi for wi, bi in zip(result.w, td.bt)) % p
    c_s = sum(wi * ci for wi, ci in zip(result.w, td.ct)) % p
    assert (a_s * b_s - c_s) % p == h_at_t * td.zt % p


def test_preprocess_tables(pipeline):
    curve, result, params_path, input_path, tmp = pipeline
    pre_path = str(tmp / "preprocessed")
    cpu_prover.run_preprocess(curve, params_path, pre_path)
    deg = curve.ext_degree
    m = result.m
    rows = (1 << cpu_prover.PREPROCESS_C) - 1
    expected = rows * ((m + 1) * 192 + (m + 1) * 192 * deg + (m - 1) * 192)
    assert len(open(pre_path, "rb").read()) == expected
    # spot-check: row k of B1 is (k+1) * B1 base points
    from gpu_groth16_prover_3x_tpu.host import ec
    g1 = ec.g1_group(curve)
    with open(pre_path, "rb") as f:
        row0 = [ser.read_g1_affine(f, curve.fq.p) for _ in range(m + 1)]
        row1 = [ser.read_g1_affine(f, curve.fq.p) for _ in range(m + 1)]
    assert row0 == result.B1
    for base, dbl in list(zip(result.B1, row1))[:5]:
        pt = g1.from_affine(base) if base[1] else g1.zero
        assert g1.to_affine(g1.dbl(pt)) == dbl
