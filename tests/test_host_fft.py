"""FFT-domain tests (shape of libfqfft evaluation_domain_test.cpp)."""

import pytest

from gpu_groth16_prover_3x_tpu.curves.constants import FIELD_A, FIELD_B
from gpu_groth16_prover_3x_tpu.host.fft import Radix2Domain


def naive_dft(a, omega, p):
    n = len(a)
    return [sum(a[j] * pow(omega, i * j, p) for j in range(n)) % p
            for i in range(n)]


@pytest.mark.parametrize("fp", [FIELD_A, FIELD_B], ids=["A", "B"])
def test_fft_matches_naive_dft(fp, rng):
    dom = Radix2Domain(fp, 16)
    a = [rng.randrange(fp.p) for _ in range(16)]
    assert dom.fft(list(a)) == naive_dft(a, dom.omega, fp.p)


@pytest.mark.parametrize("fp", [FIELD_A, FIELD_B], ids=["A", "B"])
def test_ifft_of_fft(fp, rng):
    dom = Radix2Domain(fp, 64)
    a = [rng.randrange(fp.p) for _ in range(64)]
    assert dom.ifft(dom.fft(list(a))) == a


@pytest.mark.parametrize("fp", [FIELD_A, FIELD_B], ids=["A", "B"])
def test_icoset_of_coset(fp, rng):
    dom = Radix2Domain(fp, 32)
    a = [rng.randrange(fp.p) for _ in range(32)]
    assert dom.icoset_fft(dom.coset_fft(list(a))) == a


def test_coset_fft_evaluates_on_coset(rng):
    # cosetFFT(a)[i] = poly_a(g * omega^i)
    fp = FIELD_A
    dom = Radix2Domain(fp, 8)
    coeffs = [rng.randrange(fp.p) for _ in range(8)]

    def horner(x):
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % fp.p
        return acc

    evals = dom.fft(list(coeffs))  # plain evaluation on the subgroup
    for i in range(8):
        assert evals[i] == horner(pow(dom.omega, i, fp.p))
    coset_evals = dom.coset_fft(list(coeffs))
    for i in range(8):
        assert coset_evals[i] == horner(dom.g * pow(dom.omega, i, fp.p) % fp.p)


def test_vanishing_and_lagrange(rng):
    fp = FIELD_A
    dom = Radix2Domain(fp, 16)
    # Z vanishes on the domain, not on the coset
    assert dom.compute_vanishing_polynomial(pow(dom.omega, 5, fp.p)) == 0
    assert dom.compute_vanishing_polynomial(dom.g) != 0
    # Lagrange: interpolation identity sum_i f(w^i) L_i(t) == f(t)
    t = rng.randrange(fp.p)
    u = dom.evaluate_all_lagrange_polynomials(t)
    coeffs = [rng.randrange(fp.p) for _ in range(16)]
    evals = dom.fft(list(coeffs))

    def horner(x):
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % fp.p
        return acc

    assert sum(e * l for e, l in zip(evals, u)) % fp.p == horner(t)
    # t on the domain -> indicator vector
    u5 = dom.evaluate_all_lagrange_polynomials(pow(dom.omega, 5, fp.p))
    assert u5[5] == 1 and sum(u5) == 1


def test_mnt6753_fr_domain_uses_small_subgroup_root():
    # MNT6753 Fr = FIELD_B: s = 15 with 5^2 small subgroup; a 2^10 domain
    # must use the derived root (field_utils.tcc:40-68)
    dom = Radix2Domain(FIELD_B, 1 << 10)
    assert pow(dom.omega, 1 << 10, FIELD_B.p) == 1
    assert pow(dom.omega, 1 << 9, FIELD_B.p) == FIELD_B.p - 1


# -- extended / step / mixed domains + selection cascade ---------------------
# (get_evaluation_domain.tcc cascade; extended needs m = 2^(s+1), which is
# 2^31 for the MNT Fr fields, so the small-field fixtures below exercise
# the algebra at testable sizes — the code is field-generic.)

from gpu_groth16_prover_3x_tpu.curves.constants import FieldParams
from gpu_groth16_prover_3x_tpu.host.fft import (ExtendedRadix2Domain,
                                                StepRadix2Domain,
                                                get_evaluation_domain)

def _small_field(p, s, t, q=None):
    """Tiny test field with p - 1 = 2^s * t; generator found by search.
    (The real Fr fields have s = 30, putting the extended domain's
    mandatory 2^(s+1) size out of test reach; t must also not divide the
    coset-shift exponents or step/extended Z-constants degenerate.)"""
    g = next(g for g in range(2, p)
             if all(pow(g, (p - 1) // f, p) != 1 for f in (2, t)))
    return FieldParams(p=p, s=s, t=t, multiplicative_generator=g,
                       root_of_unity=pow(g, t, p), nqr=g,
                       small_subgroup_base=q,
                       small_subgroup_power=1 if q else None,
                       full_root_of_unity=g if q else None)


F449 = _small_field(449, 6, 7)            # 448 = 2^6 * 7
F449M = _small_field(449, 6, 7, q=7)      # with the 7-subgroup exposed


def _domain_evals_match_definition(dom, rng):
    """FFT(a)[i] == P_a(get_domain_element(i)) and ifft inverts."""
    p, m = dom.p, dom.m
    a = [rng.randrange(p) for _ in range(m)]
    evals = dom.fft(list(a))
    for i in range(m):
        x = dom.get_domain_element(i)
        want = sum(a[j] * pow(x, j, p) for j in range(m)) % p
        assert evals[i] == want, i
    assert dom.ifft(list(evals)) == a
    assert dom.icoset_fft(dom.coset_fft(list(a))) == a
    # vanishing polynomial is zero exactly on the domain
    for i in range(m):
        assert dom.compute_vanishing_polynomial(
            dom.get_domain_element(i)) == 0
    t = rng.randrange(p)
    # Lagrange: P(t) == sum_i u_i(t) * P(elt_i) for P of degree < m
    u = dom.evaluate_all_lagrange_polynomials(t)
    pt = sum(a[j] * pow(t, j, p) for j in range(m)) % p
    assert sum(ui * e for ui, e in zip(u, evals)) % p == pt
    # add_poly_Z really adds coeff * Z(x)
    coeff = rng.randrange(1, p)
    H = [rng.randrange(p) for _ in range(m + 1)]
    H2 = list(H)
    dom.add_poly_Z(coeff, H2)
    x = rng.randrange(p)
    lhs = sum(c * pow(x, j, p) for j, c in enumerate(H2)) % p
    rhs = (sum(c * pow(x, j, p) for j, c in enumerate(H))
           + coeff * dom.compute_vanishing_polynomial(x)) % p
    assert lhs == rhs


def test_extended_radix2_domain(rng):
    dom = ExtendedRadix2Domain(F449, 128)  # 2^(s+1) = 128
    assert dom.small_m == 64
    _domain_evals_match_definition(dom, rng)


def test_step_radix2_domain(rng):
    dom = StepRadix2Domain(F449, 20)      # 16 + 4
    assert (dom.big_m, dom.small_m) == (16, 4)
    _domain_evals_match_definition(dom, rng)


def test_mixed_radix_basic_domain(rng):
    dom = Radix2Domain(F449M, 28)         # 2^2 * 7
    _domain_evals_match_definition(dom, rng)


def test_divide_by_z_on_coset_nonbasic(rng):
    # coset evaluations of f*Z divided by Z-on-coset == coset evals of f
    for dom in (ExtendedRadix2Domain(F449, 128), StepRadix2Domain(F449, 20)):
        p, m = dom.p, dom.m
        f = [rng.randrange(p) for _ in range(m)]
        fz = [0] * (m + 1)
        dom.add_poly_Z(1, fz)             # fz = Z
        # f*Z has degree < 2m; evaluate on the coset directly instead
        g = dom.g
        coset_evals_fz = []
        for i in range(m):
            x = g * dom.get_domain_element(i) % p
            pf = sum(c * pow(x, j, p) for j, c in enumerate(f)) % p
            pz = dom.compute_vanishing_polynomial(x)
            coset_evals_fz.append(pf * pz % p)
        got = dom.divide_by_z_on_coset(coset_evals_fz)
        want = dom.coset_fft(list(f))
        assert got == want


def test_geometric_sequence_domain(rng):
    from gpu_groth16_prover_3x_tpu.host.fft import GeometricSequenceDomain
    dom = GeometricSequenceDomain(F449, 12)   # any m > 1 works
    assert dom.get_domain_element(0) == 1
    assert dom.get_domain_element(3) == 8     # r = 2 (fp.tcc:292-298)
    _domain_evals_match_definition(dom, rng)


def test_arithmetic_sequence_domain(rng):
    from gpu_groth16_prover_3x_tpu.host.fft import ArithmeticSequenceDomain
    dom = ArithmeticSequenceDomain(F449, 11)
    assert [dom.get_domain_element(i) for i in range(4)] == [0, 1, 2, 3]
    _domain_evals_match_definition(dom, rng)


def test_cascade_reaches_sequence_domains(rng):
    # a field with s = 1 (p = 23: 22 = 2 * 11) starves every radix-2
    # domain at size 6, so the cascade must fall through to the
    # geometric sequence domain (get_evaluation_domain.tcc:120-133)
    from gpu_groth16_prover_3x_tpu.host.fft import GeometricSequenceDomain
    f23 = _small_field(23, 1, 11)
    dom = get_evaluation_domain(f23, 6)
    assert isinstance(dom, GeometricSequenceDomain) and dom.m == 6
    a = [rng.randrange(23) for _ in range(6)]
    assert dom.ifft(dom.fft(list(a))) == a


def test_get_evaluation_domain_cascade():
    # power of two -> basic
    assert isinstance(get_evaluation_domain(F449, 16), Radix2Domain)
    # 2^(s+1) -> extended
    assert isinstance(get_evaluation_domain(F449, 128),
                      ExtendedRadix2Domain)
    # 2^k + 2^r -> step
    d = get_evaluation_domain(F449, 20)
    assert isinstance(d, StepRadix2Domain) and d.m == 20
    # non-2-power, non-step size rounds small part up (tcc:66-68)
    d2 = get_evaluation_domain(F449, 21)  # big 16, small 5 -> 16 + 8
    assert d2.m == 24 and isinstance(d2, StepRadix2Domain)
    # small-subgroup field: mixed basic domain resolves odd leftovers
    d3 = get_evaluation_domain(F449M, 3)
    assert d3.m >= 3
    # real fields: the pipeline's 2^k sizes stay basic
    d4 = get_evaluation_domain(FIELD_A, 1 << 10)
    assert isinstance(d4, Radix2Domain) and d4.m == 1 << 10
