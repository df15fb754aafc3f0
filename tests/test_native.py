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


@pytest.mark.parametrize("curve_name,group", [
    ("MNT4753", "g1"),        # deg 1
    ("MNT4753", "g2"),        # deg 2 (Fp2 twist)
    ("MNT6753", "g2"),        # deg 3 (Fp3 twist) — the production
                              # MNT6753 prove epilogue path
])
def test_horner_proj_matches_python_finalize(curve_name, group, rng):
    """Native window-sum Horner epilogue == the python finalize path
    (the device prover's readback hot spot, BENCH_r03 phases)."""
    from gpu_groth16_prover_3x_tpu.curves.constants import CURVES
    from gpu_groth16_prover_3x_tpu.host import ec as host_ec

    curve = CURVES[curve_name]
    hg = (host_ec.g1_group(curve) if group == "g1"
          else host_ec.g2_group(curve))
    gen = (host_ec.g1_generator(curve) if group == "g1"
           else host_ec.g2_generator(curve))
    p, deg = curve.fq.p, hg.deg
    nwin, cbits = 7, 5
    rinv = pow(R, -1, p)

    # random projective window sums (X:Y:Z) = random Z-scalings of real
    # points, plus one infinity row (Z == 0)
    rows = np.zeros((nwin, 3 * deg * 12), dtype=np.uint64)
    want_pts = []
    for w in range(nwin):
        if w == 3:
            want_pts.append(hg.zero)
            continue  # row stays zero (Z == 0)
        jpt = hg.mul(rng.randrange(1, 1 << 40), gen)
        ax, ay = hg.to_affine(jpt)
        z = rng.randrange(1, p)
        if deg == 1:
            coords = [ax * z % p, ay * z % p, z]
        else:
            from gpu_groth16_prover_3x_tpu.host import field as HF
            zs = tuple([z] + [0] * (deg - 1))
            coords = list(HF.e_mul(ax, zs, p, hg.alpha)) + \
                list(HF.e_mul(ay, zs, p, hg.alpha)) + list(zs)
            coords = [c for c in coords]
        flat = []
        for c in coords:
            flat.append(c)
        for ci, v in enumerate(flat):
            rows[w, ci * 12:(ci + 1) * 12] = _limbs(v * R % p)
        want_pts.append(jpt)
    got = native.horner_proj(p, deg, hg.alpha, hg.a, rows, cbits)
    assert got is not None
    acc = hg.zero
    for w in range(nwin - 1, -1, -1):
        for _ in range(cbits):
            acc = hg.dbl(acc)
        acc = hg.add(acc, want_pts[w])
    assert hg.equal(got, acc)


def _loose_limbs16(v, n, rng, kmax=3):
    """Non-canonical 16-bit limb encoding of v (uint32 limbs): canonical
    split of v, then borrow/carry redistributions between adjacent limbs
    — the lazy form device window sums arrive in."""
    d = [(v >> (16 * i)) & 0xFFFF for i in range(n)]
    for _ in range(rng.randrange(1, 8)):
        i = rng.randrange(n - 1)
        if d[i + 1] >= 1 and d[i] <= (1 << 31) - (1 << 16):
            d[i + 1] -= 1
            d[i] += 1 << 16
    # complement-wrap excess: device subtraction leaves +t*2^full in the
    # limb sum, cancelled only by the mod-2^full truncation
    # (limbs.sub_const contract) — put t*2^16 on the top limb
    d[n - 1] += rng.randrange(3) << 16
    assert (sum(x << (16 * i) for i, x in enumerate(d))
            % (1 << (16 * n))) == v
    return d


@pytest.mark.parametrize("curve_name,group", [
    ("MNT4753", "g1"),
    ("MNT6753", "g2"),        # deg-3 tower
])
def test_finalize_windows_loose_limbs(curve_name, group, rng):
    """finalize_windows_native and window_sums_to_host+finalize_msm accept
    RAW (lazy, above-p) device limbs: canonicalization happens on host
    (no device epilogue kernels), including a Z == p (value ≡ 0) infinity
    encoding."""
    from gpu_groth16_prover_3x_tpu.curves.constants import CURVES
    from gpu_groth16_prover_3x_tpu.host import ec as host_ec
    from gpu_groth16_prover_3x_tpu.host import field as HF
    from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops
    from gpu_groth16_prover_3x_tpu.ops.msm import (
        finalize_msm, finalize_windows_native, window_sums_to_host)

    curve = CURVES[curve_name]
    cops = get_curve_ops(curve, group)
    hg = (host_ec.g1_group(curve) if group == "g1"
          else host_ec.g2_group(curve))
    gen = (host_ec.g1_generator(curve) if group == "g1"
           else host_ec.g2_generator(curve))
    p, deg, n = curve.fq.p, hg.deg, cops.fq_ctx.n
    nwin, cbits, M = 5, 4, 2

    ws = [np.zeros((nwin, n, M), dtype=np.uint32) for _ in range(3 * deg)]
    want = [[] for _ in range(M)]
    for m in range(M):
        for w in range(nwin):
            if (w + m) % 4 == 3:   # infinity: encode Z as p (≡ 0 mod p)
                want[m].append(hg.zero)
                zc = [p] + [0] * (deg - 1) if deg > 1 else p
                coords = ([0] * deg * 2 + list(zc)) if deg > 1 \
                    else [0, 0, p]
            else:
                jpt = hg.mul(rng.randrange(1, 1 << 30), gen)
                ax, ay = hg.to_affine(jpt)
                z = rng.randrange(1, p)
                if deg == 1:
                    coords = [ax * z % p, ay * z % p, z]
                else:
                    zs = tuple([z] + [0] * (deg - 1))
                    coords = list(HF.e_mul(ax, zs, p, hg.alpha)) + \
                        list(HF.e_mul(ay, zs, p, hg.alpha)) + list(zs)
                want[m].append(jpt)
            for ci, v in enumerate(coords):
                enc = v * R % p + rng.randrange(3) * p  # loose: above p
                ws[ci][w, :, m] = _loose_limbs16(enc, n, rng)

    def oracle(m):
        acc = hg.zero
        for w in range(nwin - 1, -1, -1):
            for _ in range(cbits):
                acc = hg.dbl(acc)
            acc = hg.add(acc, want[m][w])
        return acc

    pts = window_sums_to_host(cops, ws, p, num_msms=M)
    for m in range(M):
        assert hg.equal(finalize_msm(hg, pts[m], cbits), oracle(m))
    if native.available():
        res = finalize_windows_native(cops, hg, ws, p, cbits, M)
        assert res is not None
        for m in range(M):
            assert hg.equal(res[m], oracle(m))
