"""Trace-time op-counter tests (utils/opcount).

The reference's PROFILE_OP_COUNTS tallies field muls / EC ops at runtime
(libff fp.hpp:46-51, common/profiling.cpp:119-150); here the tally is
taken at TRACE time, so a plain jax.make_jaxpr is enough to count a
program without compiling or running it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("jax")

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753, MNT6753
from gpu_groth16_prover_3x_tpu.ops import limbs as L
from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops
from gpu_groth16_prover_3x_tpu.utils import opcount


def test_collect_scale_semantics():
    with opcount.collect() as tally:
        opcount.add("x", 3)
        with opcount.scale(10):
            opcount.add("x", 2)
            with opcount.scale(4):
                opcount.add("y")
        opcount.add("x")
    assert tally == {"x": 3 + 20 + 1, "y": 40}
    # counting is off outside collect(): no crash, no tally
    assert not opcount.enabled()
    opcount.add("z", 5)
    assert "z" not in tally
    rep = opcount.report(tally)
    assert "x" in rep and "24" in rep


def test_mont_mul_counts_lanes():
    ctx = L.MontCtx(MNT4753.fq.p)
    sds = jax.ShapeDtypeStruct((L.NUM_LIMBS, 5), jnp.uint32)
    with opcount.collect() as tally:
        jax.make_jaxpr(lambda a, b: L.mont_mul(ctx, a, b))(sds, sds)
    assert tally["fp_mont_mul"] == 5


@pytest.mark.parametrize("curve,deg", [(MNT4753, 1), (MNT4753, 2),
                                       (MNT6753, 3)])
def test_ec_add_mul_budget(curve, deg):
    """One RCB15 complete add = 14 Montgomery-multiply instances
    (6 + 2 + 6 layer products, ops/ec.py) x batch lanes x deg-dependent
    base-mul expansion; the ec_add tally is exactly the lane count."""
    group = "g1" if deg == 1 else "g2"
    if deg == 2 and curve is MNT6753:
        pytest.skip("no deg-2 group on MNT6753")
    cops = get_curve_ops(curve, group)
    batch = 7

    def one_add(*arrs):
        P = cops.from_arrays(arrs[:3 * deg])
        Q = cops.from_arrays(arrs[3 * deg:])
        return cops.to_arrays(cops.add(P, Q))

    sds = [jax.ShapeDtypeStruct((L.NUM_LIMBS, batch), jnp.uint32)
           for _ in range(6 * deg)]
    with opcount.collect() as tally:
        jax.make_jaxpr(one_add)(*sds)
    assert tally["ec_add"] == batch
    # Karatsuba: deg 1 -> 1 base mul per product, deg 2 -> 3, deg 3 -> 6;
    # the b3 layer products use BaseScalar (deg base muls each).
    base_muls = {1: 14, 2: 12 * 3 + 2 * 2, 3: 12 * 6 + 2 * 3}[deg]
    assert tally["fp_mont_mul"] == base_muls * batch


def test_msm_scan_step_ops_per_point():
    """The Pippenger scan step's traced multiply budget per point stays
    within the round-3 model (BASELINE.md): one segmented-scan step is
    ~2 complete adds' worth of muls per point per window pass."""
    from gpu_groth16_prover_3x_tpu.ops.msm import (
        msm_window_sums, pad_rows, affine_points_to_rows, scalars_to_limbs)
    from gpu_groth16_prover_3x_tpu.host import ec as host_ec

    curve = MNT4753
    cops = get_curve_ops(curve, "g1")
    hg = host_ec.g1_group(curve)
    import random
    rng = random.Random(3)
    n = 16
    g = host_ec.g1_generator(curve)
    pts = [hg.to_affine(hg.mul(rng.randrange(1, 1 << 60), g))
           for _ in range(n)]
    rows = pad_rows(affine_points_to_rows(pts, curve.fq.p, 1), n)
    limbs = scalars_to_limbs(
        [rng.randrange(1, curve.fr.p) for _ in range(n)], n)

    with opcount.collect() as tally:
        jax.make_jaxpr(
            lambda kl, pr: msm_window_sums(cops, kl, pr, chunk_s=4, c=16)
        )(jnp.asarray(limbs), jnp.asarray(rows))
    assert tally.get("fp_mont_mul", 0) > 0
    # the tally is per-trace (scan bodies traced once); it must at least
    # account one scan step (chunk of 4 points) + the reduction ladder
    assert tally["fp_mont_mul"] >= 14 * 4
