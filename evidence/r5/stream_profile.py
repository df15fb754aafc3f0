"""Per-phase timing of the 2^22 streamed MSM (where do 56s go?)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
from gpu_groth16_prover_3x_tpu.host import ec as host_ec
from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops
from gpu_groth16_prover_3x_tpu.ops.msm import (affine_points_to_rows,
                                               msm_window_sums,
                                               combine_window_sums,
                                               pad_rows)
from gpu_groth16_prover_3x_tpu.ops import limbs as L

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

def run(tag):
    t_all = time.time()
    acc = None
    for lo in range(0, n, B):
        t0 = time.time()
        rows = jax.device_put(jnp.asarray(rows_np[lo:lo + B]))
        k16 = keys_np[:, lo:lo + B].astype(np.uint16)
        keys = jax.device_put(jnp.asarray(k16)).astype(jnp.uint32)
        seg = jax.device_put(jnp.zeros((B,), jnp.int32))
        jax.block_until_ready((rows, keys, seg))
        t_up = time.time() - t0
        t0 = time.time()
        ws = msm_window_sums(cops, keys, rows, 64, 16, seg, 1, signed=True)
        jax.block_until_ready(ws)
        t_k = time.time() - t0
        t0 = time.time()
        acc = ws if acc is None else combine_window_sums(cops, acc, ws)
        jax.block_until_ready(acc)
        t_c = time.time() - t0
        print(f"{tag} block@{lo}: upload {t_up:.2f}s kernel {t_k:.2f}s "
              f"combine {t_c:.2f}s", flush=True)
    print(f"{tag} total {time.time()-t_all:.1f}s", flush=True)

run("cold")
run("warm")
