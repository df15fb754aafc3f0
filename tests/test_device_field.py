"""Device limb/field arithmetic vs exact python ints (golden vectors).

The gentests.py pattern of the reference (cuda-fixnum/tests/gentests.py:
host-trusted bignum generates fixtures for the device kernels), with
adversarial inputs: powers of two, near-modulus, loose (> p) values.
"""

import random

import numpy as np
import pytest

# XLA:CPU compile-heavy (753-bit limb graphs): slow tier.
# Quick tier: `pytest -m "not slow"` (host oracle + serialization
# + native kernels), target < 10 min cold — see README.
pytestmark = pytest.mark.slow

jnp = pytest.importorskip("jax.numpy")

from gpu_groth16_prover_3x_tpu.curves.constants import P_A, P_B, R
from gpu_groth16_prover_3x_tpu.ops import limbs as L
from gpu_groth16_prover_3x_tpu.ops.field import Fel, fp_ops
from gpu_groth16_prover_3x_tpu.curves.constants import FIELD_A, FIELD_B


def adversarial_values(rng, p, n):
    vals = []
    for _ in range(n):
        c = rng.random()
        if c < 0.2:
            vals.append(rng.randrange(p))
        elif c < 0.4:
            vals.append(p - 1 - rng.randrange(1000))
        elif c < 0.55:
            vals.append(1 << rng.randrange(753))
        elif c < 0.7:
            vals.append(rng.randrange(2 * p))      # loose
        elif c < 0.8:
            vals.append(rng.randrange(3))
        else:
            vals.append(rng.randrange(p))
    return vals


def to_batch(vals):
    return jnp.asarray(np.stack([L.int_to_limbs(v) for v in vals], axis=1))


def from_batch(arr):
    a = np.asarray(arr)
    return [L.limbs_to_int(a[:, i:i + 1]) for i in range(a.shape[1])]


@pytest.mark.parametrize("p", [P_A, P_B])
def test_mont_mul_exact(p):
    rng = random.Random(0xAB)
    ctx = L.MontCtx(p)
    va = adversarial_values(rng, p, 48)
    vb = adversarial_values(rng, p, 48)
    got = from_batch(L.mont_mul(ctx, to_batch(va), to_batch(vb)))
    rinv = pow(R, -1, p)
    for g, a, b in zip(got, va, vb):
        assert g % p == a * b * rinv % p
        assert g < 2 * p


@pytest.mark.parametrize("p", [P_A, P_B])
def test_add_sub_small_reduce(p):
    rng = random.Random(0xCD)
    ctx = L.MontCtx(p)
    va = adversarial_values(rng, p, 32)
    vb = [rng.randrange(2 * p) for _ in range(32)]
    A, B = to_batch(va), to_batch(vb)
    assert from_batch(L.add(A, B)) == [a + b for a, b in zip(va, vb)]
    assert from_batch(L.sub(ctx, A, B, 2)) == [
        a - b + 2 * p for a, b in zip(va, vb)]
    assert from_batch(L.small_mul(A, 13)) == [13 * a for a in va]
    got = from_batch(L.to_canonical(ctx, L.small_mul(A, 13), 26))
    assert got == [13 * a % p for a in va]


def test_field_towers_vs_host():
    """Fel-level Fp ops keep exact Montgomery semantics through chains."""
    rng = random.Random(0xEF)
    F = fp_ops(FIELD_A)
    p = FIELD_A.p
    vals = adversarial_values(rng, p, 16)
    vals = [v % p for v in vals]
    x = Fel(to_batch([(v * R) % p for v in vals]), 1)
    # (x + x) * x - x == x * (2x - 1) ... exercised via bound tracking
    y = F.mul(F.add(x, x), x)
    z = F.sub(y, x)
    zc = F.canonical(z)
    got = from_batch(zc.v)
    rinv = pow(R, -1, p)
    for g, v in zip(got, vals):
        assert g * rinv % p == (2 * v * v - v) % p
