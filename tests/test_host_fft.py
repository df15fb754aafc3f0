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
