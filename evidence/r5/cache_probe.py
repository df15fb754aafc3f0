"""Does JAX's persistent compilation cache work under axon? (VERDICT #5)

Run twice in separate processes:  python .scratch/cache_probe.py
First process pays the compile; if the cache works, the second is ~free.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "axon_cache")
import jax
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
# surface cache hit/miss decisions
os.environ.setdefault("JAX_EXPLAIN_CACHE_MISSES", "true")
import jax.numpy as jnp
import numpy as np

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
from gpu_groth16_prover_3x_tpu.ops import limbs as L

ctx = L.MontCtx(MNT4753.fq.p, 16)
a = jnp.asarray(np.random.randint(0, 1 << 16, size=(48, 4096),
                                  dtype=np.uint32))


@jax.jit
def f(a):
    x = a
    for _ in range(4):
        x = L.mont_mul(ctx, x, a)
    return x


t0 = time.time()
r = f(a)
jax.block_until_ready(r)
print(f"compile+first: {time.time()-t0:.1f}s on {jax.devices()[0]}",
      flush=True)
try:
    files = sum(len(fs) for _, _, fs in os.walk(cache_dir))
    print(f"cache dir {cache_dir}: {files} files", flush=True)
except OSError as e:
    print("cache dir error:", e, flush=True)
