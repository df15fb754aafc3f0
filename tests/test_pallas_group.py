"""Fused Pallas EC group-op kernels == the XLA formula path, limb-exact.

On a TPU backend these run the real compiled kernels.  On CPU the only
option is Pallas interpret mode (minutes per op), so the heavy exactness
legs are opt-in via GROTH16_RUN_PALLAS_TESTS=1, mirroring
tests/test_pallas_kernels.py; the dispatch/fallback logic tests always
run (they are cheap and backend-independent).
"""

import os

import numpy as np
import pytest

# XLA:CPU compile-heavy (753-bit limb graphs): slow tier.
# Quick tier: `pytest -m "not slow"` (host oracle + serialization
# + native kernels), target < 10 min cold — see README.
pytestmark = pytest.mark.slow

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753, MNT6753
from gpu_groth16_prover_3x_tpu.ops import limbs as L
from gpu_groth16_prover_3x_tpu.ops import pallas_group as PG
from gpu_groth16_prover_3x_tpu.ops.ec import STEADY_LB, get_curve_ops
from gpu_groth16_prover_3x_tpu.ops.field import Fel

B = 128


def _rand_fel(rng, p, k, lb):
    vals = [int.from_bytes(rng.bytes(96), "little") % (k * p)
            for _ in range(B)]
    return Fel(jnp.asarray(
        np.stack([L.int_to_limbs(v) for v in vals], axis=1)), k, lb)


def _rand_coord(rng, F, p, k, lb):
    if F.deg == 1:
        return _rand_fel(rng, p, k, lb)
    return tuple(_rand_fel(rng, p, k, lb) for _ in range(F.deg))


def _flat(R):
    out = []
    for c in R:
        out.extend([c] if isinstance(c, Fel) else list(c))
    return out


def _kernel_env(monkeypatch):
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        if not os.environ.get("GROTH16_RUN_PALLAS_TESTS"):
            pytest.skip("interpret-mode group kernels are minutes-slow on "
                        "CPU; set GROTH16_RUN_PALLAS_TESTS=1 to run")
        monkeypatch.setenv("GROTH16_FORCE_PALLAS_GROUP", "1")
        monkeypatch.setenv("GROTH16_GROUP_INTERPRET", "1")
    monkeypatch.delenv("GROTH16_NO_PALLAS_GROUP", raising=False)


@pytest.mark.parametrize("curve,group", [
    (MNT4753, "g1"),
    (MNT6753, "g2"),       # deg-3 tower incl. BaseScalar b3 in-kernel
])
def test_group_kernels_match_xla(curve, group, rng, monkeypatch):
    _kernel_env(monkeypatch)
    nrng = np.random.default_rng(rng.randrange(1 << 30))
    cops = get_curve_ops(curve, group)
    p = curve.fq.p
    K = cops.coord_k
    P = tuple(_rand_coord(nrng, cops.F, p, K, STEADY_LB) for _ in range(3))
    Q = tuple(_rand_coord(nrng, cops.F, p, K, STEADY_LB) for _ in range(3))
    x2 = _rand_coord(nrng, cops.F, p, 1, 0xFFFF)
    y2 = _rand_coord(nrng, cops.F, p, 1, 0xFFFF)
    inf = jnp.asarray(nrng.integers(0, 2, size=(1, B)).astype(bool))

    got = [cops.mixed_add(P, x2, y2, q_inf=inf), cops.add(P, Q),
           cops.dbl(P)]
    assert PG._CHECKED and all(PG._CHECKED.values()) and not PG._DISABLED
    monkeypatch.setenv("GROTH16_NO_PALLAS_GROUP", "1")
    want = [cops.mixed_add(P, x2, y2, q_inf=inf), cops.add(P, Q),
            cops.dbl(P)]
    for gR, wR in zip(got, want):
        for g, w in zip(_flat(gR), _flat(wR)):
            assert np.array_equal(np.asarray(g.v), np.asarray(w.v))
            assert (g.k, g.lb) == (w.k, w.lb)


def test_dispatch_fallback_logic(monkeypatch):
    """Shape misfits fall back to the XLA path; self-check failure
    disables the feature fail-closed."""
    monkeypatch.setenv("GROTH16_FORCE_PALLAS_GROUP", "1")
    monkeypatch.setenv("GROTH16_GROUP_INTERPRET", "1")
    monkeypatch.setattr(PG, "_DISABLED", False)
    monkeypatch.setattr(PG, "_CHECKED", {})
    cops = get_curve_ops(MNT4753, "g1")

    # rank-3 batch: dispatch must decline (returns None)
    x = Fel(jnp.zeros((L.NUM_LIMBS, 2, 4), jnp.uint32), 1)
    assert PG.maybe_dbl(cops, (x, x, x)) is None
    # batch not a multiple of 128: decline
    y = Fel(jnp.zeros((L.NUM_LIMBS, 60), jnp.uint32), 1)
    assert PG.maybe_dbl(cops, (y, y, y)) is None
    # inside a kernel trace: decline (no recursive kernels)
    z = Fel(jnp.zeros((L.NUM_LIMBS, 128), jnp.uint32), 1)
    with L.kernel_mul_scope():
        assert PG.maybe_dbl(cops, (z, z, z)) is None

    # a broken build falls back per-signature and never raises (only an
    # exactness MISMATCH fail-closes the whole path via _DISABLED)
    def _boom(*a, **k):
        raise RuntimeError("mosaic says no")
    monkeypatch.setattr(PG, "_build", _boom)
    assert PG.maybe_dbl(cops, (z, z, z)) is None
    assert not PG._DISABLED
    sig_key = next(k for k in PG._CHECKED if k[1] == "dbl")
    assert PG._CHECKED[sig_key] is False
    # ...and stays off for subsequent calls without re-building
    assert PG.maybe_dbl(cops, (z, z, z)) is None


def test_msm_with_group_kernels(rng, monkeypatch):
    """Whole-MSM exactness with the fused kernels active in the scan."""
    _kernel_env(monkeypatch)
    if jax.devices()[0].platform != "tpu" and \
            not os.environ.get("GROTH16_RUN_PALLAS_TESTS_SLOW"):
        pytest.skip("interpret-mode MSM scan is very slow on CPU; set "
                    "GROTH16_RUN_PALLAS_TESTS_SLOW=1 to run")
    from gpu_groth16_prover_3x_tpu.host import ec as host_ec
    from gpu_groth16_prover_3x_tpu.host import msm as host_msm
    from gpu_groth16_prover_3x_tpu.ops.msm import msm_device

    curve = MNT4753
    cops = get_curve_ops(curve, "g1")
    hg = host_ec.g1_group(curve)
    gen = host_ec.g1_generator(curve)
    n = 2048                       # chunk 16 -> B = 128 lanes in the scan
    scalars = [rng.randrange(curve.fr.p) for _ in range(n)]
    pts_j = [hg.mul(3 + 7 * (i % 50), gen) for i in range(n)]
    pts = [hg.to_affine(pt) for pt in pts_j]
    got = msm_device(cops, hg, scalars, pts, curve.fq.p, chunk_s=16, c=8)
    want = host_msm.msm(hg, scalars, pts_j)
    assert hg.equal(got, want)
    # the fused scan-step kernel must actually have ENGAGED (a silent
    # fail-closed fallback would still produce correct results)
    assert "msm_scan_step" in {k[0] for k in PG._FUSED}
    assert not [k for k, v in PG._FUSED.items() if v is False]
    assert not PG._DISABLED
