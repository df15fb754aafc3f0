"""Native host kernel (csrc/limb_host.cpp via ctypes) golden tests."""

import random

import numpy as np
import pytest

from gpu_groth16_prover_3x_tpu.curves.constants import P_A, P_B, R
from gpu_groth16_prover_3x_tpu.utils import native


def _limbs(v):
    return np.frombuffer(v.to_bytes(96, "little"), dtype="<u8").copy()


def _int(row):
    return int.from_bytes(np.ascontiguousarray(row).tobytes(), "little")


def test_native_builds():
    assert native.available(), "g++ build of csrc/limb_host.cpp failed"


@pytest.mark.parametrize("p", [P_A, P_B])
def test_mont_mul_and_codec(p, rng):
    n = 64
    vals = [rng.randrange(p) for _ in range(n)]
    a = np.stack([_limbs(v * R % p) for v in vals])
    bvals = [rng.randrange(p) for _ in range(n)]
    b = np.stack([_limbs(v * R % p) for v in bvals])
    out = native.mont_mul_batch(a, b, p)
    rinv = pow(R, -1, p)
    for i in range(n):
        assert _int(out[i]) == _int(a[i]) * _int(b[i]) * rinv % p
    dec = native.mont_decode(a, p)
    assert [_int(r) for r in dec] == vals
    enc = native.mont_encode(dec, p)
    assert [(_int(r) * rinv) % p for r in enc] == vals


def test_batch_affine(rng):
    p = P_A
    n = 50
    xs = np.stack([_limbs(rng.randrange(p) * R % p) for _ in range(n)])
    ys = np.stack([_limbs(rng.randrange(p) * R % p) for _ in range(n)])
    zs = np.stack([_limbs(rng.randrange(1, p) * R % p) for _ in range(n)])
    zs[3] = 0   # a point at infinity
    ox, oy = native.batch_affine(xs, ys, zs, p)
    rinv = pow(R, -1, p)
    for i in range(n):
        z = _int(zs[i]) * rinv % p
        x = _int(xs[i]) * rinv % p
        y = _int(ys[i]) * rinv % p
        gx = _int(ox[i]) * rinv % p
        gy = _int(oy[i]) * rinv % p
        if z == 0:
            assert gx == 0 and gy == 0
        else:
            zi = pow(z, -1, p)
            assert gx == x * zi % p and gy == y * zi % p
