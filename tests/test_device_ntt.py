"""Device NTT / coset pipeline vs the host libfqfft-equivalent oracle
(the evaluation_domain_test.cpp shapes: FFT == naive, inverse round-trips,
coset round-trips — depends/libfqfft tests, SURVEY.md §4.4)."""

import random

import numpy as np
import pytest

# XLA:CPU compile-heavy (753-bit limb graphs): slow tier.
# Quick tier: `pytest -m "not slow"` (host oracle + serialization
# + native kernels), target < 10 min cold — see README.
pytestmark = pytest.mark.slow

jnp = pytest.importorskip("jax.numpy")

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753, MNT6753
from gpu_groth16_prover_3x_tpu.host.fft import Radix2Domain
from gpu_groth16_prover_3x_tpu.host import groth16 as host_groth16
from gpu_groth16_prover_3x_tpu.ops import ntt as dev_ntt
from gpu_groth16_prover_3x_tpu.ops.field import Fel
from gpu_groth16_prover_3x_tpu.utils.serialization import (ints_to_u16x48,
                                                           u16x48_to_ints)


def to_dev(vals, p):
    return Fel(jnp.asarray(ints_to_u16x48(vals, p).T.astype(np.uint32)), 1)


def from_dev(fel, p):
    return [v % p for v in u16x48_to_ints(np.asarray(fel.v).T, p)]


@pytest.mark.parametrize("curve,n", [(MNT4753, 64), (MNT6753, 32)])
def test_ntt_matches_host_domain(curve, n, rng):
    fr = curve.fr
    dom = Radix2Domain(fr, n)
    plan = dev_ntt.get_plan(fr, n)
    vals = [rng.randrange(fr.p) for _ in range(n)]
    x = to_dev(vals, fr.p)
    assert from_dev(dev_ntt.ntt(plan, x), fr.p) == dom.fft(list(vals))
    assert from_dev(dev_ntt.intt(plan, x), fr.p) == dom.ifft(list(vals))
    assert from_dev(dev_ntt.coset_fft(plan, x), fr.p) == \
        dom.coset_fft(list(vals))
    assert from_dev(dev_ntt.icoset_fft(plan, x), fr.p) == \
        dom.icoset_fft(list(vals))


def test_compute_h_device_matches_host(rng):
    """Full H pipeline == host compute_h (libsnark/main.cpp:89-148)."""
    curve = MNT4753
    fr = curve.fr
    d = 31                      # domain size 32
    ca = [rng.randrange(fr.p) for _ in range(d + 1)]
    cb = [rng.randrange(fr.p) for _ in range(d + 1)]
    cc = [rng.randrange(fr.p) for _ in range(d + 1)]
    want = host_groth16.compute_h(curve, d, ca, cb, cc)

    plan = dev_ntt.get_plan(fr, d + 1)
    h_mont, h_std = dev_ntt.compute_h_device(
        plan, to_dev(ca, fr.p).v, to_dev(cb, fr.p).v, to_dev(cc, fr.p).v)
    got = [v % fr.p
           for v in u16x48_to_ints(np.asarray(h_mont).T, fr.p)]
    assert got == want[:d + 1]
    # standard-domain digit limbs decode without the Montgomery factor
    got_std = [v % fr.p for v in u16x48_to_ints(
        np.asarray(h_std).T, fr.p, from_montgomery=False)]
    assert got_std == want[:d + 1]
