"""Pallas mont_mul kernel == exact python ints (interpret mode on CPU)."""

import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from gpu_groth16_prover_3x_tpu.curves.constants import P_A, R
from gpu_groth16_prover_3x_tpu.ops import limbs as L
from gpu_groth16_prover_3x_tpu.ops import pallas_kernels as PK


def test_pallas_mont_mul_interpret(rng, monkeypatch):
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
