"""Radix-15 Fq limb arithmetic (GROTH16_FQ_RADIX=15): the one-fold CIOS
at R' = 2^780 (ops/limbs.py bits=15) against the exact bigint oracle,
the serialization-boundary conversions, and a small end-to-end MSM.

The radix-16 twins of these checks live in test_device_field.py /
test_device_msm.py; the production sha gates exercise the full radix-15
prover through the CLI (.scratch/verify_r4.log, BASELINE.md).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753, MNT6753
from gpu_groth16_prover_3x_tpu.ops import limbs as L


@pytest.mark.parametrize("curve", [MNT4753, MNT6753],
                         ids=["mnt4753", "mnt6753"])
def test_mont_mul15_matches_bigint(curve):
    """All three XLA CIOS forms at bits=15 == the unique REDC integer
    (t = ab/R' mod p, t < 2p) on adversarial near-bound operands."""
    p = curve.fq.p
    ctx = L.MontCtx(p, 15)
    n, R = ctx.n, 1 << ctx.full_bits
    assert (n, ctx.full_bits) == (52, 780)
    rng = np.random.default_rng(0xF15B)
    k = 1 << 13                    # ka*kb = 2^26 < R'/p ~ 2^27
    vals_a = [int(rng.integers(1 << 62)) * p % (k * p) + i
              for i in range(32)]
    vals_a[0] = k * p - 1
    vals_a[1] = 0
    vals_a[2] = p
    vals_b = [(v * 0x9E3779B97F4A7C15 + 3) % (k * p) for v in vals_a]
    vals_b[0] = k * p - 1
    a = np.stack([L.int_to_limbs(v, n, 15) for v in vals_a], axis=1)
    b = np.stack([L.int_to_limbs(v, n, 15) for v in vals_b], axis=1)
    rinv = pow(R, -1, p)
    for fn in (L._mont_mul_xla, L._mont_mul_xla_dyn, L._mont_mul_unrolled):
        got = np.asarray(jax.jit(lambda x, y, f=fn: f(ctx, x, y))(a, b))
        for i, (va, vb) in enumerate(zip(vals_a, vals_b)):
            g = L.limbs_to_int(got[:, i:i + 1], 15)
            assert g % p == va * vb * rinv % p and g < 2 * p, \
                (fn.__name__, i)


def test_u16x48_to_u15x52_rechunk():
    """The host bit-regroup preserves the integer value exactly."""
    from gpu_groth16_prover_3x_tpu.utils.serialization import (
        u16x48_to_u15x52)
    rng = np.random.default_rng(5)
    vals = [int.from_bytes(rng.bytes(94), "little") for _ in range(10)]
    vals += [0, (1 << 752) - 1]
    a16 = np.stack([L.int_to_limbs(v, 48, 16) for v in vals])
    a15 = u16x48_to_u15x52(a16)
    for i, v in enumerate(vals):
        assert L.limbs_to_int(a15[i][:, None], 15) == v


def test_rows_to_radix15_domain_shift(rng):
    """R-domain serialized rows -> R'-domain radix-15 rows: value x is
    preserved across the Montgomery domain shift, canonical below p,
    and exact zeros (the y==0 infinity encoding) stay exact zeros."""
    from gpu_groth16_prover_3x_tpu.ops.msm import rows_to_radix15
    p = MNT4753.fq.p
    R, Rp = 1 << 768, 1 << 780
    xs = [rng.randrange(p) for _ in range(7)] + [0]
    rows = np.stack([L.int_to_limbs(x * R % p, 48, 16).astype(np.uint16)
                     for x in xs])
    out = rows_to_radix15(p, rows)
    assert out.shape == (8, 52)
    for i, x in enumerate(xs):
        v = L.limbs_to_int(out[i][:, None].astype(np.uint32), 15)
        assert v < p and v == x * Rp % p
    assert not out[-1].any()      # zero stays bitwise zero


def test_msm_radix15_matches_oracle(monkeypatch, rng):
    """End-to-end radix-15 G1 MSM == exact host Pippenger."""
    from gpu_groth16_prover_3x_tpu.host import ec as host_ec
    from gpu_groth16_prover_3x_tpu.host import msm as host_msm
    from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops
    from gpu_groth16_prover_3x_tpu.ops.msm import msm_device

    monkeypatch.setenv("GROTH16_FQ_RADIX", "15")
    curve = MNT4753
    dev = get_curve_ops(curve, "g1")
    assert (dev.nq, dev.qbits) == (52, 15)
    hg = host_ec.g1_group(curve)
    gen = host_ec.g1_generator(curve)
    n = 32
    scalars = [rng.randrange(curve.fr.p) for _ in range(n)]
    pts_j = [hg.mul(rng.randrange(1, curve.fr.p), gen) for _ in range(n)]
    pts = [hg.to_affine(pt) for pt in pts_j]
    got = msm_device(dev, hg, scalars, pts, curve.fq.p, chunk_s=4, c=8)
    want = host_msm.msm(hg, scalars, pts_j)
    assert hg.equal(got, want)
