"""Benchmark: MNT4753 G1 Pippenger MSM throughput + full-proof latency.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "points/sec", "vs_baseline": N,
   "detail": {..., "proof": {...}}}

The primary metric stays the BASELINE.json north-star kernel ("G1 MSM
points/sec at 2^20", comparable across rounds via vs_baseline); the
`detail.proof` block adds the reference's primary observable — full
proof wall time with the cuda_prover_piecewise.cu:143-229 phase labels —
for an MNT4753 parameter set of BENCH_PROOF_LOG2D (default 2^16)
constraints.  Proof inputs are generated once with the device setup tool
(models/setup_device.py, byte-identical to the host oracle) and cached
under .bench_cache/ so repeat runs skip generation.

Each leg runs in its OWN SUBPROCESS with one retry: the axon TPU worker
sporadically crashes mid-run ("TPU worker process crashed or restarted",
observed round 2/3 — flaky, the identical program passes on rerun), and
an in-process crash would otherwise take the whole bench down with it.

Env knobs: BENCH_LOG2N (default 20), BENCH_CHUNK (default 64),
BENCH_REPS (default 3), BENCH_PROOF_LOG2D (default 16; 0 disables the
proof leg), BENCH_G2_LOG2N (default 15), BENCH_NTT_LOG2N (default 20),
BENCH_SKIP_PROOF=1, BENCH_SKIP_G2=1, BENCH_SKIP_NTT=1,
BENCH_INPROCESS=1 (no subprocesses).  The proof20 leg (reference-default
MNT4753 2^20 latency) runs only when .bench_cache already holds the 2^20
parameter files (the hardware gate pipeline generates them).
"""

import json
import os
import random
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# First recorded single-chip number (points/sec): round 1, v5e chip,
# 2^20 points, c=16, chunk 64 (BASELINE.md).  vs_baseline is measured
# against this.
BASELINE_POINTS_PER_SEC = 33642.6


def bench_msm() -> dict:
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
    # production config: the TPU prover defaults to signed digits
    signed = bool(int(os.environ.get("BENCH_SIGNED", "1")))
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
    # top window: one live bit, like a real scalar < r ~ 2^753 (a zeroed
    # top window would shave ~2% of the work and flatter the number)
    keys[47] = rng.integers(0, 2, size=n, dtype=np.uint32)

    keys_d = jax.device_put(jnp.asarray(keys))
    rows_d = jax.device_put(jnp.asarray(rows))

    # compile + warmup
    t0 = time.time()
    out = msm_window_sums(cops, keys_d, rows_d, chunk, signed=signed)
    jax.block_until_ready(out)
    compile_and_first = time.time() - t0

    times = []
    for _ in range(reps):
        t0 = time.time()
        out = msm_window_sums(cops, keys_d, rows_d, chunk, signed=signed)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    pps = n / best

    import jax as _jax
    return {
        "log2n": log2n, "n": n, "chunk": chunk, "signed": signed,
        "points_per_sec": round(pps, 1),
        "best_s": round(best, 3),
        "all_s": [round(t, 3) for t in times],
        "compile_and_first_s": round(compile_and_first, 1),
        "device": str(_jax.devices()[0]).split(":")[0],
    }


def bench_g2() -> dict:
    """G2 MSM throughput (MNT6753: the deg-3 tower, the heaviest kernel
    the reference runs on-device, cuda_prover_piecewise.cu:166)."""
    import jax
    import jax.numpy as jnp

    from gpu_groth16_prover_3x_tpu.curves.constants import MNT6753
    from gpu_groth16_prover_3x_tpu.host import ec as host_ec
    from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops
    from gpu_groth16_prover_3x_tpu.ops.msm import (affine_points_to_rows,
                                                   msm_window_sums)

    log2n = int(os.environ.get("BENCH_G2_LOG2N", "15"))
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    n = 1 << log2n

    curve = MNT6753
    cops = get_curve_ops(curve, "g2")
    hg = host_ec.g2_group(curve)
    gen = host_ec.g2_generator(curve)
    base = [hg.to_affine(hg.mul(3 + 7 * i, gen)) for i in range(16)]
    base_rows = affine_points_to_rows(base, curve.fq.p, curve.ext_degree)
    rows = np.tile(base_rows, (n // 16, 1))
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 1 << 16, size=(48, n), dtype=np.uint32)
    keys[47] = rng.integers(0, 2, size=n, dtype=np.uint32)

    keys_d = jax.device_put(jnp.asarray(keys))
    rows_d = jax.device_put(jnp.asarray(rows))
    t0 = time.time()
    out = msm_window_sums(cops, keys_d, rows_d, chunk, signed=True)
    jax.block_until_ready(out)
    compile_and_first = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = msm_window_sums(cops, keys_d, rows_d, chunk, signed=True)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    return {
        "metric": f"mnt6753_g2_msm_points_per_sec_2^{log2n}",
        "g2_points_per_sec": round(n / best, 1),
        "best_s": round(best, 3),
        "all_s": [round(t, 3) for t in times],
        "compile_and_first_s": round(compile_and_first, 1),
    }


def bench_ntt() -> dict:
    """Device NTT (Fr, MNT4753) butterflies/sec — the H-pipeline kernel
    the reference leaves on the CPU (README.md:77) and we run on-chip."""
    import jax
    import jax.numpy as jnp

    from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
    from gpu_groth16_prover_3x_tpu.ops.field import Fel
    from gpu_groth16_prover_3x_tpu.ops.ntt import get_plan, ntt

    log2n = int(os.environ.get("BENCH_NTT_LOG2N", "20"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    n = 1 << log2n
    plan = get_plan(MNT4753.fr, n)
    rng = np.random.default_rng(13)
    # random canonical 16-bit limb columns; the top limbs are zeroed so
    # the value is < p (the NTT is exact mod p for any such input)
    limbs = rng.integers(0, 1 << 16, size=(48, n), dtype=np.uint32)
    limbs[46:] = 0
    x = Fel(jnp.asarray(limbs), 1)
    t0 = time.time()
    out = ntt(plan, x)
    jax.block_until_ready(out.v)
    compile_and_first = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = ntt(plan, x)
        jax.block_until_ready(out.v)
        times.append(time.time() - t0)
    best = min(times)
    return {
        "metric": f"mnt4753_fr_ntt_elems_per_sec_2^{log2n}",
        "ntt_elems_per_sec": round(n / best, 1),
        "best_s": round(best, 3),
        "all_s": [round(t, 3) for t in times],
        "compile_and_first_s": round(compile_and_first, 1),
    }


def bench_proof() -> dict:
    """Full prove_files run (the reference's primary observable).

    Parameter/input files are generated once via the device setup tool
    and cached in .bench_cache/ keyed by curve + size.
    """
    from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
    from gpu_groth16_prover_3x_tpu.models import tpu_prover
    from gpu_groth16_prover_3x_tpu.models import setup as setup_model
    from gpu_groth16_prover_3x_tpu.utils import profiling

    log2d = int(os.environ.get("BENCH_PROOF_LOG2D", "16"))
    return _proof_at(log2d, generate=True)


def bench_proof20() -> dict:
    """Reference-default-scale proof latency (MNT4753 2^20,
    generate_parameters.cpp:127).  Only runs when the 2^20 parameter
    files are already cached (the gate pipeline generates them; cold
    generation takes ~an hour and is not a bench's job)."""
    return _proof_at(20, generate=False)


def _proof_at(log2d: int, generate: bool) -> dict:
    from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
    from gpu_groth16_prover_3x_tpu.models import setup as setup_model
    from gpu_groth16_prover_3x_tpu.models import tpu_prover
    from gpu_groth16_prover_3x_tpu.utils import profiling

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    params_path = os.path.join(cache, f"MNT4753-parameters-{log2d}")
    input_path = os.path.join(cache, f"MNT4753-input-{log2d}")
    output_path = os.path.join(cache, f"MNT4753-output-{log2d}")

    gen_s = None
    if not (os.path.isfile(params_path) and os.path.isfile(input_path)):
        if not generate:
            return {"skipped": f"no cached 2^{log2d} parameter files"}
        t0 = time.time()
        # per-query exponentiation checkpoints: retries after a flaky
        # worker crash resume instead of restarting the five exp scans
        os.environ.setdefault("GROTH16_SETUP_CACHE", cache)
        # write-then-rename: a worker crash mid-generation must not leave
        # truncated files that a retry would mistake for the cache
        setup_model.generate_parameters(MNT4753, log2d,
                                        params_path + ".tmp",
                                        input_path + ".tmp", seed=0xBE7C)
        os.replace(params_path + ".tmp", params_path)
        os.replace(input_path + ".tmp", input_path)
        gen_s = round(time.time() - t0, 1)

    t0 = time.time()
    tpu_prover.prove_files(MNT4753, params_path, input_path, output_path)
    total = time.time() - t0

    # second run: steady-state latency (jit caches warm); its per-block
    # laps are the prover's phase breakdown (print_time parity)
    profiling.clear_laps()
    t0 = time.time()
    tpu_prover.prove_files(MNT4753, params_path, input_path, output_path)
    warm = time.time() - t0

    out = {
        "metric": f"mnt4753_proof_seconds_2^{log2d}",
        "cold_s": round(total, 2),
        "warm_s": round(warm, 2),
        "phases": {k: round(v, 3) for k, v in
                   profiling.last_laps().items()},
    }
    if gen_s is not None:
        out["param_gen_s"] = gen_s
    return out


_LEG_MARK = "BENCH_LEG_RESULT "


def _run_leg(leg: str, attempts: int = 2, timeout_s: int = 3000):
    """Run one bench leg in a subprocess; retry on worker crashes.

    Returns the leg's dict, or {"error": ...} after the last attempt.
    """
    last = None
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg", leg],
                capture_output=True, text=True, timeout=timeout_s,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            for line in r.stdout.splitlines():
                if line.startswith(_LEG_MARK):
                    return json.loads(line[len(_LEG_MARK):])
            tail = (r.stderr or r.stdout or "").strip().splitlines()[-6:]
            last = f"rc={r.returncode} " + " | ".join(tail)[-400:]
        except subprocess.TimeoutExpired:
            last = f"timeout after {timeout_s}s"
        print(f"bench leg {leg} attempt {i + 1} failed: {last}",
              file=sys.stderr, flush=True)
    return {"error": str(last)[:400]}


def main() -> None:
    legs = {"msm": bench_msm, "proof": bench_proof, "g2": bench_g2,
            "ntt": bench_ntt, "proof20": bench_proof20}
    if len(sys.argv) > 2 and sys.argv[1] == "--leg":
        print(_LEG_MARK + json.dumps(legs[sys.argv[2]]()), flush=True)
        return

    inproc = bool(os.environ.get("BENCH_INPROCESS"))

    def leg(name, fn, attempts=2, timeout_s=3000):
        if inproc:
            try:
                return fn()
            except Exception as e:  # pragma: no cover
                return {"error": f"{type(e).__name__}: {e}"[:300]}
        return _run_leg(name, attempts=attempts, timeout_s=timeout_s)

    msm = bench_msm() if inproc else _run_leg("msm")
    if "error" in msm:
        # one more subprocess attempt — NOT in-process: on single-client
        # TPU runtimes an in-process fallback would hold the device and
        # starve the proof-leg subprocesses below
        msm = _run_leg("msm", attempts=1)
    detail = dict(msm)

    # secondary kernel legs (VERDICT r3 #8): G2 tower MSM + device NTT
    if not os.environ.get("BENCH_SKIP_G2"):
        detail["g2"] = leg("g2", bench_g2)
    if not os.environ.get("BENCH_SKIP_NTT"):
        detail["ntt"] = leg("ntt", bench_ntt)

    if not os.environ.get("BENCH_SKIP_PROOF") and \
            int(os.environ.get("BENCH_PROOF_LOG2D", "16")):
        proof = leg("proof", bench_proof, attempts=4, timeout_s=4800)
        if "error" in proof:
            detail["proof_error"] = proof["error"]
        else:
            detail["proof"] = proof
        # reference-default scale (2^20), only if the gate pipeline left
        # its parameter files in .bench_cache
        p20 = leg("proof20", bench_proof20, attempts=2, timeout_s=4800)
        if "error" not in p20 and "skipped" not in p20:
            detail["proof20"] = p20

    if "error" in msm:  # truly last resort, after all subprocess legs
        msm = bench_msm()
        detail.update(msm)

    pps = msm["points_per_sec"]
    vs = pps / BASELINE_POINTS_PER_SEC if BASELINE_POINTS_PER_SEC else 1.0
    print(json.dumps({
        "metric": f"mnt4753_g1_msm_points_per_sec_2^{msm['log2n']}",
        "value": pps,
        "unit": "points/sec",
        "vs_baseline": round(vs, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
