"""Device EC group law (complete RCB15 formulas) vs the exact host oracle.

Covers all four groups (G1/G2 x MNT4753/MNT6753) on point sets that
include the identity, equal points (doubling case), and inverse pairs —
the cases the reference handles with branches (multiexp/curves.cu:152-173,
262-265) and we handle by formula completeness.
"""

import random

import numpy as np
import pytest

# XLA:CPU compile-heavy (753-bit limb graphs): slow tier.
# Quick tier: `pytest -m "not slow"` (host oracle + serialization
# + native kernels), target < 10 min cold — see README.
pytestmark = pytest.mark.slow

jnp = pytest.importorskip("jax.numpy")

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753, MNT6753, R
from gpu_groth16_prover_3x_tpu.host import ec as host_ec
from gpu_groth16_prover_3x_tpu.host import field as HF
from gpu_groth16_prover_3x_tpu.ops import limbs as L
from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops
from gpu_groth16_prover_3x_tpu.ops.field import Fel


def fel_from_ints(vals, p):
    arr = np.stack([L.int_to_limbs((v * R) % p) for v in vals], axis=1)
    return Fel(jnp.asarray(arr), 1)


def ext_from_ints(tuples, p, deg):
    return tuple(fel_from_ints([t[i] for t in tuples], p)
                 for i in range(deg))


def fel_to_ints(fel, ctx, p):
    v = np.asarray(L.to_canonical(ctx, fel.v, fel.k))
    rinv = pow(R, -1, p)
    return [L.limbs_to_int(v[:, i:i + 1]) * rinv % p
            for i in range(v.shape[1])]


def make_fixture(curve, group_name, rng, n=10):
    dev = get_curve_ops(curve, group_name)
    hg = (host_ec.g1_group(curve) if group_name == "g1"
          else host_ec.g2_group(curve))
    gen = (host_ec.g1_generator(curve) if group_name == "g1"
           else host_ec.g2_generator(curve))
    P = [hg.mul(rng.randrange(1, curve.fr.p), gen) for _ in range(n)]
    Q = [hg.mul(rng.randrange(1, curve.fr.p), gen) for _ in range(n)]
    P[0] = hg.zero
    Q[1] = hg.zero
    Q[2] = P[2]
    Q[3] = hg.neg(P[3])
    P[4] = hg.zero
    Q[4] = hg.zero
    return dev, hg, P, Q


def to_dev(dev, hg, pts, curve):
    p = curve.fq.p
    deg = dev.F.deg
    affs = [hg.to_affine(pt) for pt in pts]
    zero_mask = jnp.asarray(
        np.array([hg.is_zero(pt) for pt in pts]))[None, :]
    if deg == 1:
        xs = fel_from_ints([a[0] for a in affs], p)
        ys = fel_from_ints([a[1] for a in affs], p)
    else:
        xs = ext_from_ints([a[0] for a in affs], p, deg)
        ys = ext_from_ints([a[1] for a in affs], p, deg)
    one = dev.F.one((len(pts),))
    zero = dev.F.zero((len(pts),))
    X = dev.F.select(zero_mask, zero, xs)
    Y = dev.F.select(zero_mask, one, ys)
    Z = dev.F.select(zero_mask, zero, one)
    return (X, Y, Z), (xs, ys, zero_mask)


def dev_to_host_affine(dev, P, curve):
    p = curve.fq.p
    deg = dev.F.deg
    X, Y, Z = P
    if deg == 1:
        ctx = dev.F.ctx
        xs = fel_to_ints(X, ctx, p)
        ys = fel_to_ints(Y, ctx, p)
        zs = fel_to_ints(Z, ctx, p)
        out = []
        for x, y, z in zip(xs, ys, zs):
            if z == 0:
                out.append(None)
            else:
                zi = pow(z, -1, p)
                out.append((x * zi % p, y * zi % p))
        return out
    ctx = dev.F.base.ctx
    xs = [fel_to_ints(c, ctx, p) for c in X]
    ys = [fel_to_ints(c, ctx, p) for c in Y]
    zs = [fel_to_ints(c, ctx, p) for c in Z]
    out = []
    alpha = curve.non_residue
    for i in range(len(xs[0])):
        z = tuple(zs[d][i] for d in range(deg))
        if all(c == 0 for c in z):
            out.append(None)
            continue
        zi = HF.e_inv(z, p, alpha)
        out.append((
            HF.e_mul(tuple(xs[d][i] for d in range(deg)), zi, p, alpha),
            HF.e_mul(tuple(ys[d][i] for d in range(deg)), zi, p, alpha)))
    return out


def host_affine_or_none(hg, pt):
    return None if hg.is_zero(pt) else hg.to_affine(pt)


@pytest.mark.parametrize("curve,group", [
    (MNT4753, "g1"), (MNT4753, "g2"), (MNT6753, "g1"), (MNT6753, "g2"),
])
def test_group_law_vs_oracle(curve, group, rng):
    dev, hg, P, Q = make_fixture(curve, group, rng)
    Pd, _ = to_dev(dev, hg, P, curve)
    Qd, (x2, y2, q_inf) = to_dev(dev, hg, Q, curve)

    got = dev_to_host_affine(dev, dev.add(Pd, Qd), curve)
    want = [host_affine_or_none(hg, hg.add(a, b)) for a, b in zip(P, Q)]
    assert got == want

    got = dev_to_host_affine(dev, dev.dbl(Pd), curve)
    want = [host_affine_or_none(hg, hg.dbl(a)) for a in P]
    assert got == want

    got = dev_to_host_affine(
        dev, dev.mixed_add(Pd, x2, y2, q_inf), curve)
    want = [host_affine_or_none(hg, hg.add(a, b)) for a, b in zip(P, Q)]
    assert got == want
