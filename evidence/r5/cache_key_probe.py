"""Which cache-key component is unstable for the fused MSM program?"""
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.WARNING)
logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)

import numpy as np
import jax
import jax.numpy as jnp

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
from gpu_groth16_prover_3x_tpu.host import ec as host_ec
from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops
from gpu_groth16_prover_3x_tpu.ops.msm import (affine_points_to_rows,
                                               msm_window_sums)

curve = MNT4753
cops = get_curve_ops(curve, "g1")
hg = host_ec.g1_group(curve)
gen = host_ec.g1_generator(curve)
base = [hg.to_affine(hg.mul(3 + 7 * i, gen)) for i in range(16)]
rows = np.tile(affine_points_to_rows(base, curve.fq.p, 1), (1 << 10, 1))
n = rows.shape[0]
rng = np.random.default_rng(3)
keys = rng.integers(0, 1 << 16, size=(48, n), dtype=np.uint32)
out = msm_window_sums(cops, jnp.asarray(keys), jnp.asarray(rows), 16,
                      signed=True)
jax.block_until_ready(out)
print("done", flush=True)
