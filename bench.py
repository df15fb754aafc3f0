"""Benchmark: MNT4753 G1 Pippenger MSM throughput (the BASELINE.json
north-star kernel — "G1 MSM points/sec at 2^20").

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "points/sec", "vs_baseline": N}

The reference publishes no numeric MSM throughput (BASELINE.md: qualitative
"3x faster than CPU" only), so vs_baseline is the ratio against the first
recorded TPU number in BASELINE.md (1.0 until a prior round exists).

Env knobs: BENCH_LOG2N (default 20), BENCH_CHUNK (default 64),
BENCH_REPS (default 3).
"""

import json
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# First recorded single-chip number (points/sec): round 1, v5e chip,
# 2^20 points, c=16, chunk 64 (BASELINE.md).  vs_baseline is measured
# against this.
BASELINE_POINTS_PER_SEC = 33642.6


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
    from gpu_groth16_prover_3x_tpu.host import ec as host_ec
    from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops
    from gpu_groth16_prover_3x_tpu.ops.msm import (affine_points_to_rows,
                                                   msm_window_sums)

    log2n = int(os.environ.get("BENCH_LOG2N", "20"))
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    n = 1 << log2n

    curve = MNT4753
    cops = get_curve_ops(curve, "g1")
    hg = host_ec.g1_group(curve)
    gen = host_ec.g1_generator(curve)

    # real curve points (tiled multiples of the generator) + random scalars
    base = [hg.to_affine(hg.mul(3 + 7 * i, gen)) for i in range(64)]
    base_rows = affine_points_to_rows(base, curve.fq.p, 1)
    rows = np.tile(base_rows, (n // 64, 1))
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 16, size=(48, n), dtype=np.uint32)
    keys[47] = 0  # keep scalars < 2^752 < r

    keys_d = jax.device_put(jnp.asarray(keys))
    rows_d = jax.device_put(jnp.asarray(rows))

    # compile + warmup
    t0 = time.time()
    out = msm_window_sums(cops, keys_d, rows_d, chunk)
    jax.block_until_ready(out)
    compile_and_first = time.time() - t0

    times = []
    for _ in range(reps):
        t0 = time.time()
        out = msm_window_sums(cops, keys_d, rows_d, chunk)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    pps = n / best

    vs = pps / BASELINE_POINTS_PER_SEC if BASELINE_POINTS_PER_SEC else 1.0
    print(json.dumps({
        "metric": f"mnt4753_g1_msm_points_per_sec_2^{log2n}",
        "value": round(pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(vs, 3),
        "detail": {
            "n": n, "chunk": chunk, "best_s": round(best, 3),
            "all_s": [round(t, 3) for t in times],
            "compile_and_first_s": round(compile_and_first, 1),
            "device": str(jax.devices()[0]).split(":")[0],
        },
    }))


if __name__ == "__main__":
    main()
