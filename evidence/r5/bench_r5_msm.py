"""Round-5 hardware MSM legs: 2^20 chunk sweep at the radix-15 default
+ 2^22 streamed MSM with the overlap/u16 streaming path (VERDICT r4 #4).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
from gpu_groth16_prover_3x_tpu.host import ec as host_ec
from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops
from gpu_groth16_prover_3x_tpu.ops.field import fq_radix
from gpu_groth16_prover_3x_tpu.ops.msm import (affine_points_to_rows,
                                               msm_window_sums,
                                               msm_window_sums_streamed)
from gpu_groth16_prover_3x_tpu.utils.profiling import log_device_memory

curve = MNT4753
cops = get_curve_ops(curve, "g1")
print(f"fq_radix = {fq_radix()}  device = {jax.devices()[0]}", flush=True)
hg = host_ec.g1_group(curve)
gen = host_ec.g1_generator(curve)
base = [hg.to_affine(hg.mul(3 + 7 * i, gen)) for i in range(64)]
base_rows = affine_points_to_rows(base, curve.fq.p, 1)

# -- 2^20 chunk sweep ----------------------------------------------------
n = 1 << 20
rows = np.tile(base_rows, (n // 64, 1))
rng = np.random.default_rng(7)
keys = rng.integers(0, 1 << 16, size=(48, n), dtype=np.uint32)
keys[47] = rng.integers(0, 2, size=n, dtype=np.uint32)
keys_d = jax.device_put(jnp.asarray(keys))
rows_d = jax.device_put(jnp.asarray(rows))

for chunk in (64, 128, 32):
    t0 = time.time()
    out = msm_window_sums(cops, keys_d, rows_d, chunk, signed=True)
    jax.block_until_ready(out)
    cf = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = msm_window_sums(cops, keys_d, rows_d, chunk, signed=True)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    print(f"msm20 chunk={chunk}: {n/best:,.0f} pps best={best:.3f}s "
          f"all={[round(t,3) for t in times]} compile+first={cf:.1f}s",
          flush=True)

# -- 2^22 streamed (block 2^21), new overlap + u16-key path --------------
n22 = 1 << 22
rows22 = np.tile(base_rows, (n22 // 64, 1))
keys22 = rng.integers(0, 1 << 16, size=(48, n22), dtype=np.uint32)
keys22[47] = rng.integers(0, 2, size=n22, dtype=np.uint32)
block = 1 << 21
for rep in ("cold", "warm"):
    t0 = time.time()
    ws = msm_window_sums_streamed(cops, keys22, rows22, 64, 16, None, 1,
                                  block, signed=True)
    jax.block_until_ready(ws)
    dt = time.time() - t0
    print(f"msm22 streamed ({rep}): {dt:.1f}s  {n22/dt:,.0f} pps", flush=True)
log_device_memory("after 2^22 streamed MSM")
