"""Host-side exact radix-2 evaluation domain (the oracle NTT).

Replaces the reference's vendored libfqfft basic_radix2_domain
(depends/libfqfft/libfqfft/evaluation_domain/domains/basic_radix2_domain.tcc
and basic_radix2_domain_aux.tcc).  The reference FFT is the classic
iterative Cooley-Tukey with an input bit-reversal, i.e. mathematically the
plain DFT in natural order:

    FFT(a)[i]  = sum_j a[j] * omega^(i*j)          (aux.tcc:168-202)
    iFFT(a)    = FFT with omega^-1, scaled by 1/n  (basic_radix2_domain.tcc:71-82)
    cosetFFT   = scale a[j] by g^j, then FFT       (:84-89)
    icosetFFT  = iFFT, then scale by g^-j          (:91-96)

Since field arithmetic is exact, any algorithm computing the same function
is bit-identical; this module is the spec the TPU NTT (ops/ntt.py) is
tested against.

The domain root comes from libff::get_root_of_unity including the
small-subgroup derivation for MNT6753 Fr (field_utils.tcc:40-89), see
curves/constants.get_root_of_unity.
"""

from typing import List

from ..curves.constants import FieldParams, get_root_of_unity
from ..utils import native


class Radix2Domain:
    """Evaluation domain of size m = 2^k (basic_radix2_domain equivalent)."""

    def __init__(self, fp: FieldParams, m: int):
        if m < 2 or m & (m - 1):
            raise ValueError("domain size must be a power of two >= 2")
        self.fp = fp
        self.p = fp.p
        self.m = m
        self.omega = get_root_of_unity(fp, m)
        self.g = fp.multiplicative_generator

    # -- core FFT -------------------------------------------------------------

    def _fft(self, a: List[int], omega: int) -> List[int]:
        """In-place iterative radix-2 DIT (same maths as aux.tcc:168-202)."""
        p = self.p
        n = len(a)
        if n >= 64:
            # native butterfly loops (csrc/limb_host.cpp g16_fft) for
            # reference-scale (2^16+) oracle runs
            res = native.fft_ints(a, omega, p)
            if res is not None:
                return res
        logn = n.bit_length() - 1
        # bit-reverse permutation
        for k in range(n):
            rk = int(bin(k)[2:].zfill(logn)[::-1], 2)
            if k < rk:
                a[k], a[rk] = a[rk], a[k]
        m = 1
        for _ in range(logn):
            w_m = pow(omega, n // (2 * m), p)
            for k in range(0, n, 2 * m):
                w = 1
                for j in range(m):
                    t = w * a[k + j + m] % p
                    a[k + j + m] = (a[k + j] - t) % p
                    a[k + j] = (a[k + j] + t) % p
                    w = w * w_m % p
            m *= 2
        return a

    def fft(self, a: List[int]) -> List[int]:
        assert len(a) == self.m
        return self._fft([x % self.p for x in a], self.omega)

    def ifft(self, a: List[int]) -> List[int]:
        assert len(a) == self.m
        p = self.p
        out = self._fft([x % p for x in a], pow(self.omega, -1, p))
        n_inv = pow(self.m, -1, p)
        return [x * n_inv % p for x in out]

    # -- coset ops (basic_radix2_domain.tcc:84-134) ----------------------------

    def _multiply_by_coset(self, a: List[int], g: int) -> List[int]:
        p = self.p
        u = g
        out = list(a)
        for i in range(1, len(out)):
            out[i] = out[i] * u % p
            u = u * g % p
        return out

    def coset_fft(self, a: List[int]) -> List[int]:
        return self.fft(self._multiply_by_coset(a, self.g))

    def icoset_fft(self, a: List[int]) -> List[int]:
        return self._multiply_by_coset(self.ifft(a), pow(self.g, -1, self.p))

    def compute_vanishing_polynomial(self, t: int) -> int:
        return (pow(t, self.m, self.p) - 1) % self.p

    def divide_by_z_on_coset(self, a: List[int]) -> List[int]:
        zinv = pow(self.compute_vanishing_polynomial(self.g), -1, self.p)
        return [x * zinv % self.p for x in a]

    def evaluate_all_lagrange_polynomials(self, t: int) -> List[int]:
        """_basic_radix2_evaluate_all_lagrange_polynomials (aux.tcc:333-388)."""
        p, m = self.p, self.m
        t = t % p
        u = [0] * m
        if pow(t, m, p) == 1:
            omega_i = 1
            for i in range(m):
                if omega_i == t:
                    u[i] = 1
                    return u
                omega_i = omega_i * self.omega % p
        z = (pow(t, m, p) - 1) % p
        l = z * pow(m, -1, p) % p
        r = 1
        for i in range(m):
            u[i] = l * pow((t - r) % p, -1, p) % p
            l = l * self.omega % p
            r = r * self.omega % p
        return u
