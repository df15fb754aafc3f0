"""Round-5b hardware MSM: canon-optimized scan step + device-resident
streamed 2^22 (uploads before the first kernel, while the link is fast).
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

n22 = 1 << 22
rows22_np = np.tile(base_rows, (n22 // 64, 1))
rng = np.random.default_rng(7)
keys22_np = rng.integers(0, 1 << 16, size=(48, n22), dtype=np.uint32)
keys22_np[47] = rng.integers(0, 2, size=n22, dtype=np.uint32)

# upload EVERYTHING before the first kernel (fast link)
t0 = time.time()
rows22 = jax.device_put(jnp.asarray(rows22_np))
keys22 = jax.device_put(jnp.asarray(keys22_np.astype(np.uint16)))
jax.block_until_ready((rows22, keys22))
print(f"pre-kernel uploads: {time.time()-t0:.1f}s "
      f"({(rows22_np.nbytes + keys22_np.nbytes//2)/2**20:.0f} MB)",
      flush=True)

# -- 2^20 (slices of the resident arrays), canon-optimized step ----------
n = 1 << 20
keys20 = keys22[:, :n].astype(jnp.uint32)
rows20 = rows22[:n]
for chunk in (64, 128):
    t0 = time.time()
    out = msm_window_sums(cops, keys20, rows20, chunk, signed=True)
    jax.block_until_ready(out)
    cf = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = msm_window_sums(cops, keys20, rows20, chunk, signed=True)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    print(f"msm20 chunk={chunk}: {n/best:,.0f} pps best={best:.3f}s "
          f"all={[round(t,3) for t in times]} compile+first={cf:.1f}s",
          flush=True)

# -- 2^22 streamed over device-resident rows (block 2^21) ----------------
block = 1 << 21
for rep in ("cold", "warm"):
    t0 = time.time()
    ws = msm_window_sums_streamed(cops, keys22, rows22, 64, 16, None, 1,
                                  block, signed=True)
    jax.block_until_ready(ws)
    dt = time.time() - t0
    print(f"msm22 streamed resident ({rep}): {dt:.1f}s  {n22/dt:,.0f} pps",
          flush=True)
log_device_memory("after resident 2^22 streamed MSM")
