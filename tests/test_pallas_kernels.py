"""Pallas mont_mul kernel == exact python ints.

On a TPU backend this runs the real compiled kernel (the validation that
matters).  On CPU the only option is Pallas interpret mode, which
evaluates the ~4000-op unrolled CIOS kernel one primitive at a time —
minutes of wall clock — so it is opt-in via GROTH16_RUN_PALLAS_TESTS=1
(the kernel itself is also opt-in in production, ops/pallas_kernels.py).
"""

import os
import random

import numpy as np
import pytest

# XLA:CPU compile-heavy (753-bit limb graphs): slow tier.
# Quick tier: `pytest -m "not slow"` (host oracle + serialization
# + native kernels), target < 10 min cold — see README.
pytestmark = pytest.mark.slow

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from gpu_groth16_prover_3x_tpu.curves.constants import P_A, R
from gpu_groth16_prover_3x_tpu.ops import limbs as L
from gpu_groth16_prover_3x_tpu.ops import pallas_kernels as PK


def test_pallas_mont_mul(rng, monkeypatch):
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        if not os.environ.get("GROTH16_RUN_PALLAS_TESTS"):
            pytest.skip("interpret-mode pallas is minutes-slow on CPU; "
                        "set GROTH16_RUN_PALLAS_TESTS=1 to run")
        monkeypatch.setenv("GROTH16_PALLAS_INTERPRET", "1")
    p = P_A
    ctx = L.MontCtx(p)
    n = 16
    va = [rng.randrange(2 * p) for _ in range(n)]
    vb = [rng.randrange(p) for _ in range(n)]
    A = jnp.asarray(np.stack([L.int_to_limbs(v) for v in va], axis=1))
    B = jnp.asarray(np.stack([L.int_to_limbs(v) for v in vb], axis=1))
    out = np.asarray(PK.mont_mul_pallas(ctx, A, B))
    rinv = pow(R, -1, p)
    for i, (x, y) in enumerate(zip(va, vb)):
        got = L.limbs_to_int(out[:, i:i + 1])
        assert got % p == x * y * rinv % p
        assert got < 2 * p


def test_pallas_self_check_gate(monkeypatch):
    """The TPU-default dispatch gate: exact kernel -> enabled; any
    mismatch or failure -> permanent fallback to the XLA scan path."""
    import jax.numpy as jnp2

    # exact stand-in: self-check must pass
    monkeypatch.setattr(PK, "_SELF_CHECK", {})
    monkeypatch.setattr(PK, "mont_mul_pallas",
                        lambda ctx, a, b: L._mont_mul_xla(ctx, a, b))
    assert PK._self_check() is True

    # off-by-one kernel: self-check must fail closed
    monkeypatch.setattr(PK, "_SELF_CHECK", {})
    monkeypatch.setattr(
        PK, "mont_mul_pallas",
        lambda ctx, a, b: L._mont_mul_xla(ctx, a, b) + jnp2.uint32(1))
    assert PK._self_check() is False

    # raising kernel: disabled, no exception escapes
    monkeypatch.setattr(PK, "_SELF_CHECK", {})
    def _boom(ctx, a, b):
        raise RuntimeError("mosaic says no")
    monkeypatch.setattr(PK, "mont_mul_pallas", _boom)
    assert PK._self_check() is False

    # CPU backend: pallas_available is False without any env overrides
    monkeypatch.delenv("GROTH16_FORCE_PALLAS", raising=False)
    monkeypatch.delenv("GROTH16_NO_PALLAS", raising=False)
    if jax.devices()[0].platform != "tpu":
        assert PK.pallas_available() is False
