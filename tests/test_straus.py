"""Table-based Straus MSM (ops/straus.py) vs the host oracle, including
digit-0 lanes, identity table entries, and cross-limb window extraction
(the c=5 windows straddle 16-bit limb boundaries every other window)."""

import random

import numpy as np
import pytest

# XLA:CPU compile-heavy (753-bit limb graphs): slow tier.
# Quick tier: `pytest -m "not slow"` (host oracle + serialization
# + native kernels), target < 10 min cold — see README.
pytestmark = pytest.mark.slow

jnp = pytest.importorskip("jax.numpy")

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753, MNT6753
from gpu_groth16_prover_3x_tpu.host import ec as host_ec
from gpu_groth16_prover_3x_tpu.host import msm as host_msm
from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops
from gpu_groth16_prover_3x_tpu.ops.msm import affine_points_to_rows
from gpu_groth16_prover_3x_tpu.ops.straus import (STRAUS_C,
                                                  msm_straus_device)


def host_table_rows(hg, pts_j, p, deg, c=STRAUS_C):
    """((2^c-1)*n, F) rows: flat index k*n + i holds (k+1) * P_i."""
    rows = []
    for k in range(1, 1 << c):
        mult = [hg.to_affine(hg.mul(k, pt)) for pt in pts_j]
        rows.append(affine_points_to_rows(mult, p, deg))
    return np.concatenate(rows, axis=0)


@pytest.mark.parametrize("curve,group,n", [
    (MNT4753, "g1", 13),          # non-power-of-two: tree padding path
    (MNT6753, "g2", 8),
])
def test_straus_vs_oracle(curve, group, n, rng):
    dev = get_curve_ops(curve, group)
    hg = (host_ec.g1_group(curve) if group == "g1"
          else host_ec.g2_group(curve))
    gen = (host_ec.g1_generator(curve) if group == "g1"
           else host_ec.g2_generator(curve))
    deg = dev.F.deg
    scalars = [rng.randrange(curve.fr.p) for _ in range(n)]
    scalars[0] = 0                       # all-zero digits
    scalars[1] = curve.fr.p - 1          # top windows populated
    pts_j = [hg.mul(rng.randrange(1, curve.fr.p), gen) for _ in range(n)]
    pts_j[2] = hg.zero                   # identity rows in the table
    table = host_table_rows(hg, pts_j, curve.fq.p, deg)
    want = host_msm.msm(hg, scalars, pts_j)
    got = msm_straus_device(dev, hg, scalars, table, curve.fq.p)
    assert hg.equal(got, want)
