"""Params-resident serving session: ProverSession proofs are
byte-identical to one-shot prove() and the host oracle, and the staged
rows serve MULTIPLE inputs (including a fresh r and fresh witness
evaluations) without re-staging — the beyond-reference serving mode
(the reference reloads its tables from disk every prover invocation,
cuda_prover_piecewise.cu:125-141)."""

import dataclasses
import random

import pytest

pytestmark = pytest.mark.slow

pytest.importorskip("jax")

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
from gpu_groth16_prover_3x_tpu.host import groth16 as host_groth16
from gpu_groth16_prover_3x_tpu.models import tpu_prover
from gpu_groth16_prover_3x_tpu.utils.serialization import (Groth16Input,
                                                           Groth16Params)


def test_session_multi_proof():
    curve = MNT4753
    rng = random.Random(0x5E55)
    res = host_groth16.setup(curve, 5, rng)
    hp = Groth16Params(res.d, res.m, res.A, res.B1, res.B2, res.L, res.H)
    hi1 = Groth16Input(res.w, res.ca, res.cb, res.cc, res.r)
    # second input against the SAME params: fresh randomness r and fresh
    # ca/cb/cc/w columns (the proof formula is input-agnostic; the
    # oracle computes the identical formula, so bit-equality is the
    # full correctness check even for a non-satisfying witness)
    p_r = curve.fr.p
    hi2 = Groth16Input(
        [1] + [rng.randrange(p_r) for _ in range(res.m)],
        [rng.randrange(p_r) for _ in range(res.d + 1)],
        [rng.randrange(p_r) for _ in range(res.d + 1)],
        [rng.randrange(p_r) for _ in range(res.d + 1)],
        rng.randrange(p_r))

    params = tpu_prover.params_from_host(curve, hp)
    sess = tpu_prover.ProverSession(curve, params, chunk_s=8)
    for hi in (hi1, hi2):
        want = host_groth16.prove(curve, hp, hi)
        got = sess.prove(tpu_prover.input_from_host(curve, hi))
        assert got == want
    # staged rows were converted exactly once
    assert sess._fins is None

    # r-only variation reuses every compiled program and staged row
    hi3 = dataclasses.replace(hi1, r=(hi1.r * 7 + 1) % p_r)
    want3 = host_groth16.prove(curve, hp, hi3)
    assert sess.prove(tpu_prover.input_from_host(curve, hi3)) == want3

    # one-shot prove() (itself a session) agrees
    assert tpu_prover.prove(curve, params,
                            tpu_prover.input_from_host(curve, hi1),
                            chunk_s=8) == host_groth16.prove(curve, hp, hi1)
