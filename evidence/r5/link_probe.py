"""Axon host->device link probe: raw device_put bandwidth, async-ness,
and overlap with compute."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev, flush=True)

a = np.random.randint(0, 1 << 16, size=(1 << 21, 96), dtype=np.uint16)  # 402MB
for rep in range(3):
    t0 = time.time()
    d = jax.device_put(a)
    t_call = time.time() - t0
    jax.block_until_ready(d)
    t_done = time.time() - t0
    print(f"device_put 402MB u16: call {t_call:.2f}s, ready {t_done:.2f}s "
          f"({a.nbytes/t_done/2**20:.0f} MB/s)", flush=True)
    del d

# u32 vs u16 (same element count as keys (48, 2^21))
k32 = np.random.randint(0, 1 << 16, size=(48, 1 << 21), dtype=np.uint32)
k16 = k32.astype(np.uint16)
for arr, tag in ((k32, "u32"), (k16, "u16")):
    t0 = time.time()
    d = jax.device_put(arr)
    jax.block_until_ready(d)
    dt = time.time() - t0
    print(f"keys {tag} {arr.nbytes/2**20:.0f}MB: {dt:.2f}s "
          f"({arr.nbytes/dt/2**20:.0f} MB/s)", flush=True)
    del d

# overlap: launch a long matmul chain, then upload during it
x = jax.device_put(jnp.ones((8192, 8192), jnp.float32))
@jax.jit
def burn(x):
    for _ in range(60):
        x = x @ x * 1e-9
    return x
r = burn(x); jax.block_until_ready(r)   # compile
t0 = time.time()
r = burn(x)                              # async dispatch
t_disp = time.time() - t0
t0 = time.time()
d = jax.device_put(a)
jax.block_until_ready(d)
t_up = time.time() - t0
t0 = time.time()
jax.block_until_ready(r)
t_rest = time.time() - t0
print(f"burn dispatch {t_disp:.2f}s; upload-during-burn {t_up:.2f}s; "
      f"burn remaining wait {t_rest:.2f}s", flush=True)
