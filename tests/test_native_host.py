"""Native C++ host-kernel exactness tests (csrc/limb_host.cpp).

The native layer is what makes the CPU oracle usable at reference scale
(the role OpenMP-libff plays for the reference's `main` prover,
libsnark/main.cpp:172-233).  Every kernel is checked against the exact
Python big-int implementations on adversarial inputs: zero points, zero
scalars, repeated points (bucket collisions), both curves, both groups.
"""

import random

import pytest

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753, MNT6753
from gpu_groth16_prover_3x_tpu.host import ec
from gpu_groth16_prover_3x_tpu.host import msm as hmsm
from gpu_groth16_prover_3x_tpu.host.fft import Radix2Domain
from gpu_groth16_prover_3x_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")

CURVES = [MNT4753, MNT6753]


def _groups(curve):
    return [
        (ec.g1_group(curve), ec.g1_generator(curve)),
        (ec.g2_group(curve), ec.g2_generator(curve)),
    ]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_native_msm_matches_naive(curve):
    rng = random.Random(7)
    for grp, gen in _groups(curve):
        n = 150
        base = [grp.mul(rng.randrange(1, curve.fr.p), gen) for _ in range(6)]
        pts = (base * 25)[:n]
        pts[3] = grp.zero
        # affine (Z=1) points exercise the mixed-add fast path
        pts[10] = grp.from_affine(grp.to_affine(pts[10]))
        sc = [rng.randrange(curve.fr.p) for _ in range(n)]
        sc[5] = 0
        sc[6] = 1
        sc[7] = curve.fr.p - 1
        for c in (4, 13):
            got = native.msm_jacobian(
                grp.p, grp.deg, grp.alpha, grp.a, pts, sc, c)
            want = hmsm.msm_naive(grp, sc, pts)
            assert grp.equal(got, want), (curve.name, grp.deg, c)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_native_fixed_base_matches_mul(curve):
    rng = random.Random(8)
    for grp, gen in _groups(curve):
        sc = [rng.randrange(curve.fr.p) for _ in range(8)] + [0, 1]
        out = native.fixed_base_batch(
            grp.p, grp.deg, grp.alpha, grp.a, gen, sc, 5)
        for s, pt in zip(sc, out):
            assert grp.equal(pt, grp.mul(s, gen)), (curve.name, grp.deg, s)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_native_fft_matches_python(curve):
    rng = random.Random(9)
    p = curve.fr.p
    dom = Radix2Domain(curve.fr, 128)
    a = [rng.randrange(p) for _ in range(128)]
    a[0] = 0
    a[1] = p - 1
    nat = native.fft_ints(a, dom.omega, p)

    def pyfft(vec, omega):
        vec = list(vec)
        n = len(vec)
        logn = n.bit_length() - 1
        for k in range(n):
            rk = int(bin(k)[2:].zfill(logn)[::-1], 2)
            if k < rk:
                vec[k], vec[rk] = vec[rk], vec[k]
        m = 1
        while m < n:
            w_m = pow(omega, n // (2 * m), p)
            for k in range(0, n, 2 * m):
                w = 1
                for j in range(m):
                    t = w * vec[k + j + m] % p
                    vec[k + j + m] = (vec[k + j] - t) % p
                    vec[k + j] = (vec[k + j] + t) % p
                    w = w * w_m % p
            m *= 2
        return vec

    assert nat == pyfft(a, dom.omega)
    # domain-level round trip through the (native-backed) Radix2Domain
    assert dom.ifft(dom.fft(list(a))) == [x % p for x in a]
    assert dom.icoset_fft(dom.coset_fft(list(a))) == [x % p for x in a]


def test_msm_dispatches_native_above_threshold():
    """host.msm routes n>=64 through the native kernel and the result
    matches the pure-python bucket path bit-for-bit."""
    curve = MNT4753
    rng = random.Random(10)
    grp = ec.g1_group(curve)
    gen = ec.g1_generator(curve)
    base = [grp.mul(rng.randrange(1, curve.fr.p), gen) for _ in range(4)]
    pts = (base * 20)[:70]
    sc = [rng.randrange(curve.fr.p) for _ in range(70)]
    fast = hmsm.msm(grp, sc, pts)
    slow = hmsm.msm(grp, sc[:40], pts[:40])  # python path (n < 64)
    rest = hmsm.msm_naive(grp, sc[40:], pts[40:])
    assert grp.equal(fast, grp.add(slow, rest))
