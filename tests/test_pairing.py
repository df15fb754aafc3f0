"""Pairing + full-Groth16 verifier tests (host oracle layer).

Mirrors the reference's pairing/proof-system test shapes:
test_bilinearity.cpp (libff) and test_r1cs_gg_ppzksnark.cpp (libsnark,
generator -> prover -> verifier -> assert + corruption flips).
"""

import random

import pytest

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753, MNT6753
from gpu_groth16_prover_3x_tpu.host import ec, groth16
from gpu_groth16_prover_3x_tpu.host import pairing as pr

CURVES = [MNT4753, MNT6753]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_pairing_nondegenerate(curve):
    P = ec.g1_generator(curve)
    Q = ec.g2_generator(curve)
    e = pr.reduced_pairing(curve, P, Q)
    one = pr.k_one(2 * curve.ext_degree)
    assert not pr.k_equal(e, one, curve.fq.p)
    # order-r: e^r == 1
    assert pr.k_equal(
        pr.k_exp(e, curve.fr.p, curve.fq.p, curve.non_residue),
        one, curve.fq.p)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_pairing_bilinear(curve):
    rng = random.Random(5)
    g1 = ec.g1_group(curve)
    g2 = ec.g2_group(curve)
    P = ec.g1_generator(curve)
    Q = ec.g2_generator(curve)
    p, alpha = curve.fq.p, curve.non_residue
    a = rng.randrange(2, 1 << 64)
    b = rng.randrange(2, 1 << 64)
    e_pq = pr.reduced_pairing(curve, P, Q)
    # e(aP, bQ) == e(P, Q)^(ab)
    assert pr.k_equal(
        pr.reduced_pairing(curve, g1.mul(a, P), g2.mul(b, Q)),
        pr.k_exp(e_pq, a * b, p, alpha), p)
    # e(P + P', Q) == e(P, Q) e(P', Q)
    P2 = g1.mul(a, P)
    assert pr.k_equal(
        pr.reduced_pairing(curve, g1.add(P, P2), Q),
        pr.k_mul(e_pq, pr.reduced_pairing(curve, P2, Q), p, alpha), p)
    # zero args pair to one
    assert pr.k_equal(
        pr.reduced_pairing(curve, g1.zero, Q),
        pr.k_one(2 * curve.ext_degree), p)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_full_groth16_verify(curve):
    """setup -> full prover (r,s randomness) -> pairing verify; corruption
    of the proof, the vk binding, or the primary input must all fail."""
    res = groth16.setup(curve, 5, random.Random(11))
    vk, pk = groth16.derive_keys(curve, res)
    proof = groth16.full_prove(curve, res, pk, rng=random.Random(12))
    primary = [res.w[1]]

    assert groth16.verify(curve, vk, primary, proof)
    # wrong public input
    assert not groth16.verify(curve, vk, [primary[0] + 1], proof)
    # corrupted proof component
    bad_a = ((proof[0][0] + 1, proof[0][1]), proof[1], proof[2])
    assert not groth16.verify(curve, vk, primary, bad_a)
    # proof from a different setup does not verify against this vk
    res2 = groth16.setup(curve, 5, random.Random(99))
    vk2, pk2 = groth16.derive_keys(curve, res2)
    proof2 = groth16.full_prove(curve, res2, pk2, rng=random.Random(12))
    assert groth16.verify(curve, vk2, [res2.w[1]], proof2)
    assert not groth16.verify(curve, vk, [res2.w[1]], proof2)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_challenge_proof_consistency(curve):
    """The challenge-simplified prover's output still satisfies the
    trapdoor check AND the full prover with r=s=0, alpha=beta=0 offsets
    degenerates to... (the two provers agree on shared MSM maths via
    verify_with_trapdoor, which already runs elsewhere).  Here: the vk
    derivation is deterministic given the setup seed."""
    res = groth16.setup(curve, 5, random.Random(11))
    vk_a, _ = groth16.derive_keys(curve, res)
    vk_b, _ = groth16.derive_keys(curve, res)
    assert vk_a == vk_b
    assert res.trapdoor.gamma != 0
