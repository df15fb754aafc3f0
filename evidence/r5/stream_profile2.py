"""Which upload is slow, and is it context-dependent?"""
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
n = 1 << 22
B = 1 << 21
rows_np = np.tile(base_rows, (n // 64, 1))
rng = np.random.default_rng(17)
keys_np = rng.integers(0, 1 << 16, size=(48, n), dtype=np.uint32)


def up(tag, arr):
    t0 = time.time()
    d = jax.device_put(arr)
    jax.block_until_ready(d)
    print(f"  {tag}: {arr.nbytes/2**20:.0f}MB in {time.time()-t0:.2f}s",
          flush=True)
    return d


print("== pristine uploads ==", flush=True)
for i in range(2):
    r = up(f"rows[{i}]", rows_np[i*B:(i+1)*B])
    k = up(f"keys16[{i}]", keys_np[:, i*B:(i+1)*B].astype(np.uint16))
    del r, k

print("== one kernel, then uploads ==", flush=True)
rows0 = up("rows0", rows_np[:B])
k0 = up("keys0", keys_np[:, :B].astype(np.uint16))
t0 = time.time()
ws = msm_window_sums(cops, k0.astype(jnp.uint32), rows0, 64, 16,
                     jnp.zeros((B,), jnp.int32), 1, signed=True)
jax.block_until_ready(ws)
print(f"  kernel: {time.time()-t0:.1f}s", flush=True)
r1 = up("rows1 (post-kernel)", rows_np[B:2*B])
k1 = up("keys1 (post-kernel)", keys_np[:, B:2*B].astype(np.uint16))
t0 = time.time()
ws2 = msm_window_sums(cops, k1.astype(jnp.uint32), r1, 64, 16,
                      jnp.zeros((B,), jnp.int32), 1, signed=True)
jax.block_until_ready(ws2)
print(f"  kernel2: {time.time()-t0:.1f}s", flush=True)
r2 = up("rows0 again (post-kernel2)", rows_np[:B])
k2 = up("keys0 again", keys_np[:, :B].astype(np.uint16))
