"""Post-kernel upload stall: per-transfer or per-allocation? Does
freeing the MSM result help? Are tiny uploads also hit?"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
base = [hg.to_affine(hg.mul(3 + 7 * i, gen)) for i in range(64)]
base_rows = affine_points_to_rows(base, curve.fq.p, 1)
B = 1 << 21
rows_np = np.tile(base_rows, (B // 64, 1))
rng = np.random.default_rng(17)
k16 = rng.integers(0, 1 << 16, size=(48, B), dtype=np.uint32).astype(np.uint16)

def up(tag, arr):
    t0 = time.time()
    d = jax.device_put(arr)
    jax.block_until_ready(d)
    print(f"  {tag}: {arr.nbytes/2**20:.1f}MB in {time.time()-t0:.2f}s",
          flush=True)
    return d

rows0 = up("rows0", rows_np)
k0 = up("keys0", k16)
t0 = time.time()
ws = msm_window_sums(cops, k0.astype(jnp.uint32), rows0, 64, 16,
                     jnp.zeros((B,), jnp.int32), 1, signed=True)
jax.block_until_ready(ws)
print(f"kernel: {time.time()-t0:.1f}s", flush=True)

tiny = np.ones((1024,), np.uint16)
for i in range(3):
    up(f"tiny[{i}] post-kernel", tiny)
up("big post-kernel", rows_np)
print("del ws + inputs", flush=True)
del ws, rows0, k0
for i in range(2):
    up(f"tiny[{i}] post-del", tiny)
up("big post-del", rows_np)
# does a trivial device op 'reset' the state?
x = jnp.ones((8, 8)); jax.block_until_ready(x + 1)
up("big after tiny-op", rows_np)
