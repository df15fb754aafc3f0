"""Group-law tests for the host EC layer (shape of libff test_groups.cpp)."""

import pytest

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753, MNT6753
from gpu_groth16_prover_3x_tpu.host import ec
from gpu_groth16_prover_3x_tpu.host.msm import (
    batch_exp, get_exp_window_size, msm, msm_naive, window_table, windowed_exp,
)


def groups():
    for curve in (MNT4753, MNT6753):
        yield curve.name + "-G1", ec.g1_group(curve), ec.g1_generator(curve), curve
        yield curve.name + "-G2", ec.g2_group(curve), ec.g2_generator(curve), curve


@pytest.mark.parametrize(
    "name,g,gen,curve", list(groups()), ids=[t[0] for t in groups()]
)
def test_group_laws(name, g, gen, curve, rng):
    assert g.is_on_curve(gen)
    zero = g.zero
    assert g.is_zero(zero)
    # identities
    assert g.equal(g.add(gen, zero), gen)
    assert g.equal(g.add(zero, gen), gen)
    assert g.is_zero(g.add(gen, g.neg(gen)))
    # doubling consistency
    assert g.equal(g.add(gen, gen), g.dbl(gen))
    # small-scalar sanity: (a+b)P = aP + bP, a(bP) = (ab mod r)P
    r = curve.fr.p
    a, b = rng.randrange(1, 1000), rng.randrange(1, 1000)
    pa, pb = g.mul(a, gen), g.mul(b, gen)
    assert g.is_on_curve(pa)
    assert g.equal(g.add(pa, pb), g.mul(a + b, gen))
    assert g.equal(g.mul(a, pb), g.mul(a * b, gen))
    # subgroup order: r * gen == 0
    assert g.is_zero(g.mul(r, gen))
    # large-scalar associativity around the modulus
    k = rng.randrange(r)
    assert g.equal(g.mul(k, gen), g.mul(k + r, gen))
    # affine round trip
    aff = g.to_affine(pa)
    assert g.equal(g.from_affine(aff), pa)
    assert g.to_affine(zero) == (g.fzero, g.fzero)


def test_batch_to_affine(rng):
    g = ec.g1_group(MNT4753)
    gen = ec.g1_generator(MNT4753)
    pts = [g.mul(rng.randrange(1, 999), gen) for _ in range(10)] + [g.zero]
    batch = g.batch_to_affine(pts)
    single = [g.to_affine(pt) for pt in pts]
    assert batch == single


def test_msm_matches_naive(rng):
    curve = MNT4753
    g = ec.g1_group(curve)
    gen = ec.g1_generator(curve)
    pts = [g.mul(rng.randrange(1, 500), gen) for _ in range(30)]
    scalars = [rng.randrange(curve.fr.p) for _ in range(30)]
    # include edge scalars 0, 1 and the zero point
    scalars[0], scalars[1] = 0, 1
    pts.append(g.zero)
    scalars.append(rng.randrange(curve.fr.p))
    assert g.equal(msm(g, scalars, pts), msm_naive(g, scalars, pts))


def test_msm_g2(rng):
    curve = MNT6753
    g = ec.g2_group(curve)
    gen = ec.g2_generator(curve)
    pts = [g.mul(rng.randrange(1, 100), gen) for _ in range(8)]
    scalars = [rng.randrange(curve.fr.p) for _ in range(8)]
    assert g.equal(msm(g, scalars, pts), msm_naive(g, scalars, pts))


def test_windowed_exp(rng):
    curve = MNT4753
    g = ec.g1_group(curve)
    gen = ec.g1_generator(curve)
    bits = 753
    window = get_exp_window_size(64)
    table = window_table(g, bits, window, gen)
    for _ in range(5):
        k = rng.randrange(curve.fr.p)
        assert g.equal(windowed_exp(g, bits, window, table, k), g.mul(k, gen))
    ks = [rng.randrange(curve.fr.p) for _ in range(4)]
    coeff = rng.randrange(curve.fr.p)
    out = batch_exp(g, bits, window, table, ks, coeff=coeff, modulus=curve.fr.p)
    for k, pt in zip(ks, out):
        assert g.equal(pt, g.mul(coeff * k % curve.fr.p, gen))


def test_wnaf_exp(rng):
    """wNAF digits are non-adjacent and sum back; wnaf exp == plain mul
    (wnaf.tcc find_wnaf / fixed_window_wnaf_exp / opt_window_wnaf_exp)."""
    from gpu_groth16_prover_3x_tpu.host.msm import (
        WNAF_WINDOW_TABLE_G2, find_wnaf, fixed_window_wnaf_exp,
        opt_window_wnaf_exp)
    curve = MNT4753
    g = ec.g1_group(curve)
    gen = ec.g1_generator(curve)
    for w in (2, 4):
        for k in (0, 1, 5, (1 << 64) - 1, rng.randrange(curve.fr.p)):
            naf = find_wnaf(w, k)
            assert sum(d << i for i, d in enumerate(naf)) == k
            assert all(d == 0 or (d % 2 == 1 and abs(d) < (1 << w))
                       for d in naf)
            # width-w NAF: at most one nonzero in any w+1 consecutive digits
            for i, d in enumerate(naf):
                if d:
                    assert all(x == 0 for x in naf[i + 1:i + 1 + w])
            assert g.equal(fixed_window_wnaf_exp(g, w, gen, k), g.mul(k, gen))
    k = rng.randrange(curve.fr.p)
    assert g.equal(opt_window_wnaf_exp(g, gen, k, k.bit_length()),
                   g.mul(k, gen))
    g2 = ec.g2_group(curve)
    gen2 = ec.g2_generator(curve)
    assert g2.equal(
        opt_window_wnaf_exp(g2, gen2, k, k.bit_length(),
                            window_table=WNAF_WINDOW_TABLE_G2),
        g2.mul(k, gen2))
