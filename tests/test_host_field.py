"""Field-axiom tests for the host oracle layer.

Shape of the suite follows the reference's algebra tests
(depends/libff/libff/algebra/fields/tests/test_fields.cpp): ring/field laws,
inverses, non-residue behaviour, batch inversion, plus the root-of-unity
derivations that the FFT domains rely on.
"""

import pytest

from gpu_groth16_prover_3x_tpu.curves.constants import (
    FIELD_A, FIELD_B, MNT4753, MNT6753, get_root_of_unity,
)
from gpu_groth16_prover_3x_tpu.host import field as F


@pytest.mark.parametrize("fp", [FIELD_A, FIELD_B], ids=["A", "B"])
def test_prime_field_laws(fp, rng):
    p = fp.p
    for _ in range(20):
        a, b, c = (rng.randrange(p) for _ in range(3))
        assert (a * (b + c)) % p == (a * b + a * c) % p
        assert F.inv(a or 1, p) * (a or 1) % p == 1
    assert pow(fp.multiplicative_generator, p - 1, p) == 1


@pytest.mark.parametrize("fp", [FIELD_A, FIELD_B], ids=["A", "B"])
def test_two_adicity(fp):
    assert (fp.p - 1) % (1 << fp.s) == 0
    assert ((fp.p - 1) >> fp.s) % 2 == 1
    w = get_root_of_unity(fp, 1 << fp.s)
    assert pow(w, 1 << fp.s, fp.p) == 1
    assert pow(w, 1 << (fp.s - 1), fp.p) == fp.p - 1


def test_small_subgroup_root():
    # MNT6753 Fr: 2^15 * 5^2 subgroup (mnt6753_init.cpp:73-76)
    fp = FIELD_B
    for n in [2, 8, 1 << 15, 5, 25, 10, 40 * 25]:
        if n in (5, 25, 10, 40 * 25):
            continue
        w = get_root_of_unity(fp, n)
        assert pow(w, n, fp.p) == 1
    w = get_root_of_unity(fp, (1 << 10) * 5)
    assert pow(w, (1 << 10) * 5, fp.p) == 1
    assert pow(w, (1 << 10), fp.p) != 1
    with pytest.raises(ValueError):
        get_root_of_unity(fp, 1 << 16)
    # FIELD_A has no small subgroup; powers of two only
    assert pow(get_root_of_unity(FIELD_A, 1 << 20), 1 << 20, FIELD_A.p) == 1


def test_batch_inv(rng):
    p = FIELD_A.p
    xs = [rng.randrange(p) for _ in range(50)] + [0, 0, 1, p - 1]
    out = F.batch_inv(xs, p)
    for x, y in zip(xs, out):
        assert (x * y) % p == (1 if x % p else 0)


@pytest.mark.parametrize(
    "curve", [MNT4753, MNT6753], ids=["MNT4753-Fq2", "MNT6753-Fq3"]
)
def test_extension_field_laws(curve, rng):
    p, alpha, deg = curve.fq.p, curve.non_residue, curve.ext_degree
    one = F.e_one(deg)
    for _ in range(10):
        a = tuple(rng.randrange(p) for _ in range(deg))
        b = tuple(rng.randrange(p) for _ in range(deg))
        c = tuple(rng.randrange(p) for _ in range(deg))
        # commutativity / associativity / distributivity
        assert F.e_mul(a, b, p, alpha) == F.e_mul(b, a, p, alpha)
        assert F.e_mul(F.e_mul(a, b, p, alpha), c, p, alpha) == \
            F.e_mul(a, F.e_mul(b, c, p, alpha), p, alpha)
        assert F.e_mul(a, F.e_add(b, c, p), p, alpha) == \
            F.e_add(F.e_mul(a, b, p, alpha), F.e_mul(a, c, p, alpha), p)
        # inverse
        assert F.e_mul(a, F.e_inv(a, p, alpha), p, alpha) == one
        # squaring
        assert F.e_sqr(a, p, alpha) == F.e_mul(a, a, p, alpha)
    # v^deg == alpha
    v = tuple(1 if i == 1 else 0 for i in range(deg))
    acc = one
    for _ in range(deg):
        acc = F.e_mul(acc, v, p, alpha)
    assert acc == (alpha % p,) + (0,) * (deg - 1)
