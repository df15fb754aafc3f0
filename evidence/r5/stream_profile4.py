"""Size scaling of post-kernel upload slowdown."""
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
B = 1 << 18   # small kernel so compile+run is quick
rows_np = np.tile(base_rows, (B // 64, 1))
rng = np.random.default_rng(17)
k16 = rng.integers(0, 1 << 16, size=(48, B), dtype=np.uint32).astype(np.uint16)

def up(tag, arr):
    t0 = time.time()
    d = jax.device_put(arr)
    jax.block_until_ready(d)
    dt = time.time() - t0
    print(f"  {tag}: {arr.nbytes/2**20:.0f}MB in {dt:.2f}s "
          f"({arr.nbytes/dt/2**20:.0f} MB/s)", flush=True)
    return d

rows0 = up("rows0", rows_np)
k0 = up("keys0", k16)
t0 = time.time()
ws = msm_window_sums(cops, k0.astype(jnp.uint32), rows0, 64, 16,
                     jnp.zeros((B,), jnp.int32), 1, signed=True)
jax.block_until_ready(ws)
print(f"kernel (2^18): {time.time()-t0:.1f}s", flush=True)

big = np.random.randint(0, 1 << 16, size=(1 << 21, 96), dtype=np.uint16)
for mb in (13, 26, 52, 104, 208, 416):
    nrow = mb * 2**20 // 192
    up(f"post-kernel {mb}MB", big[:nrow])
# repeat to confirm steady state
for mb in (52, 416):
    up(f"post-kernel {mb}MB (rep)", big[: mb * 2**20 // 192])
