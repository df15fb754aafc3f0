"""Benchmark: MNT4753 G1 Pippenger MSM throughput + full-proof latency.

Streams one cumulative JSON line per completed leg (the driver records
the stdout tail, so every completed leg's numbers survive even if a
later leg times out — the reference likewise prints its timing on every
run, cuda_prover_piecewise.cu:143-229).  The LAST printed line is the
final result:

  {"metric": "...", "value": N, "unit": "points/sec", "vs_baseline": N,
   "detail": {..., "proof20": {...}, "g2": {...}, "ntt": {...}}}

Legs, in value order (highest first; later legs are skipped once the
global deadline BENCH_DEADLINE_S is near):

  msm      G1 MSM points/sec at 2^BENCH_LOG2N (primary metric,
           BASELINE.json north star) — printed the moment it completes
  proof20  reference-default-scale proof latency (MNT4753 2^20,
           generate_parameters.cpp:127): cold + in-process WARM e2e
           with phase split; runs only if .bench_cache already holds
           the 2^20 parameter files (the gate pipeline generates them)
  g2       MNT6753 G2 (Fp3 tower) MSM points/sec
  ntt      device Fr NTT elements/sec
  proof    full 2^BENCH_PROOF_LOG2D proof (generates params if needed)

Each leg group runs in its OWN SUBPROCESS (the axon TPU worker
sporadically crashes mid-run — observed rounds 2-4 — and an in-process
crash would take the whole bench down); the parent reads leg results
live off the child's stdout and re-emits the cumulative JSON line after
every completed leg.

Env knobs: BENCH_DEADLINE_S (default 3300; wall budget — legs that
cannot start before it are recorded {"skipped": "deadline"}),
BENCH_LOG2N (default 20), BENCH_CHUNK (128), BENCH_REPS (3),
BENCH_PROOF_LOG2D (16; 0 disables), BENCH_G2_LOG2N (15),
BENCH_NTT_LOG2N (20), BENCH_SKIP_PROOF/BENCH_SKIP_G2/BENCH_SKIP_NTT,
BENCH_SKIP_PROOF20, BENCH_INPROCESS=1 (no subprocesses).
"""

import json
import os
import queue
import subprocess
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# First recorded single-chip number (points/sec): round 1, v5e chip,
# 2^20 points, c=16, chunk 64 (BASELINE.md).  vs_baseline is measured
# against this.
BASELINE_POINTS_PER_SEC = 33642.6

_START = time.time()


def _deadline_s() -> float:
    return float(os.environ.get("BENCH_DEADLINE_S", "3300"))


def _remaining() -> float:
    return _deadline_s() - (time.time() - _START)


def _enable_compile_cache() -> None:
    """Persistent XLA executable cache (shared with the tpu CLI)."""
    cache = os.environ.get("GROTH16_COMPILE_CACHE")
    if cache == "0":
        return
    try:
        import jax
        jax.config.update(
            "jax_compilation_cache_dir",
            cache or os.path.expanduser(
                "~/.cache/gpu_groth16_prover_3x_tpu/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


def bench_msm() -> dict:
    import jax
    import jax.numpy as jnp

    from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
    from gpu_groth16_prover_3x_tpu.host import ec as host_ec
    from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops
    from gpu_groth16_prover_3x_tpu.ops.field import fq_radix
    from gpu_groth16_prover_3x_tpu.ops.msm import (affine_points_to_rows,
                                                   msm_window_sums)

    log2n = int(os.environ.get("BENCH_LOG2N", "20"))
    chunk = int(os.environ.get("BENCH_CHUNK", "128"))
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

    return {
        "log2n": log2n, "n": n, "chunk": chunk, "signed": signed,
        "fq_radix": fq_radix(),
        "points_per_sec": round(pps, 1),
        "best_s": round(best, 3),
        "all_s": [round(t, 3) for t in times],
        "compile_and_first_s": round(compile_and_first, 1),
        "device": str(jax.devices()[0]).split(":")[0],
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
    chunk = int(os.environ.get("BENCH_CHUNK", "128"))
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
    """Full prove_files run at 2^BENCH_PROOF_LOG2D (params generated on
    demand via the device setup tool, cached in .bench_cache/)."""
    log2d = int(os.environ.get("BENCH_PROOF_LOG2D", "16"))
    return _proof_at(log2d, generate=True)


def bench_proof20() -> dict:
    """Reference-default-scale proof latency (MNT4753 2^20,
    generate_parameters.cpp:127): cold process prove + in-process WARM
    rerun (the steady-state number the reference's "3x" headline is
    about).  Only runs when the 2^20 parameter files are already cached
    (the gate pipeline generates them; cold generation takes ~an hour
    and is not a bench's job)."""
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

    # serving mode (params-resident ProverSession): stage the query rows
    # once, then the steady-state per-proof latency ships only the
    # inputs — the production serving number (models/tpu_prover.py).
    # Programs are warm from the runs above, so this costs ~2 proofs.
    if (os.environ.get("BENCH_SKIP_SERVE", "0") == "0"
            and log2d >= 18 and _remaining() > 600):
        params = tpu_prover.load_params(params_path, MNT4753)
        inputs = tpu_prover.load_input(input_path, MNT4753,
                                       params.d, params.m)
        t0 = time.time()
        sess = tpu_prover.ProverSession(MNT4753, params)
        stage_s = time.time() - t0
        t0 = time.time()
        sess.prove(inputs)      # pays the deferred row conversion
        first_s = time.time() - t0
        t0 = time.time()
        sess.prove(inputs)      # steady state: inputs-only upload
        serve_s = time.time() - t0
        out["serve"] = {"stage_s": round(stage_s, 2),
                        "first_s": round(first_s, 2),
                        "warm_s": round(serve_s, 2)}
    return out


LEGS = {"msm": bench_msm, "proof": bench_proof, "g2": bench_g2,
        "ntt": bench_ntt, "proof20": bench_proof20}

_LEG_MARK = "BENCH_LEG_RESULT "


def _child_main(leg_names) -> None:
    """Run the named legs sequentially in THIS process, printing a
    marked JSON line per completed leg (the parent streams them)."""
    _enable_compile_cache()
    for name in leg_names:
        try:
            res = LEGS[name]()
        except Exception as e:  # noqa: BLE001 — must report, not die
            res = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(_LEG_MARK + json.dumps({"leg": name, "result": res}),
              flush=True)


def _run_group(leg_names, timeout_s: float, on_leg) -> set:
    """One subprocess running `leg_names`; stream results live.

    Calls on_leg(name, result) the moment each leg's marked line
    arrives.  Returns the set of legs that produced a result.  The
    subprocess is killed at timeout_s; stderr passes through to the
    parent's stderr (stdout stays JSON-clean for the driver tail).
    """
    done = set()
    env = dict(os.environ)
    # Stable python string hashing makes the lowered programs (hence the
    # persistent-compile-cache keys) byte-stable across processes: with
    # randomized hashing the big fused-MSM program MISSES the cache every
    # process; with a pinned seed it HITS (measured on the axon backend,
    # .scratch/hm_seed0_*.log — BASELINE.md round 5).
    env.setdefault("PYTHONHASHSEED", "0")
    # the child's _remaining() clock starts at ITS process start: hand it
    # the parent's remaining global budget so in-leg guards (e.g. the
    # proof20 serve extension) see the true deadline
    env["BENCH_DEADLINE_S"] = str(max(60.0, round(_remaining(), 1)))
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--legs", ",".join(leg_names)],
        stdout=subprocess.PIPE, text=True, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    q = queue.Queue()

    def reader():
        for line in proc.stdout:
            q.put(line)
        q.put(None)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    end = time.time() + timeout_s
    try:
        while True:
            try:
                line = q.get(timeout=max(0.1, min(5.0, end - time.time())))
            except queue.Empty:
                if time.time() >= end:
                    print(f"bench group {leg_names}: timeout after "
                          f"{timeout_s:.0f}s, killing", file=sys.stderr,
                          flush=True)
                    proc.kill()
                    break
                continue
            if line is None:
                break
            if line.startswith(_LEG_MARK):
                rec = json.loads(line[len(_LEG_MARK):])
                done.add(rec["leg"])
                on_leg(rec["leg"], rec["result"])
    finally:
        try:
            proc.kill()
        except Exception:
            pass
        proc.wait()
    return done


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--legs":
        _child_main(sys.argv[2].split(","))
        return
    if len(sys.argv) > 2 and sys.argv[1] == "--leg":   # legacy form
        _child_main([sys.argv[2]])
        return

    inproc = bool(os.environ.get("BENCH_INPROCESS"))
    detail = {"deadline_s": _deadline_s()}
    state = {"pps": None, "log2n": int(os.environ.get("BENCH_LOG2N", "20"))}

    def emit():
        pps = state["pps"]
        vs = (pps / BASELINE_POINTS_PER_SEC) if pps else 0.0
        detail["elapsed_s"] = round(time.time() - _START, 1)
        print(json.dumps({
            "metric": f"mnt4753_g1_msm_points_per_sec_2^{state['log2n']}",
            "value": pps if pps else 0.0,
            "unit": "points/sec",
            "vs_baseline": round(vs, 3),
            "detail": detail,
        }), flush=True)

    def on_leg(name, res):
        if name == "msm" and "error" not in res:
            detail.update(res)
            state["pps"] = res.get("points_per_sec")
            state["log2n"] = res.get("log2n", state["log2n"])
        elif name == "msm":
            detail["msm_error"] = res["error"]
        elif name == "proof" and "error" in res:
            detail["proof_error"] = res["error"]
        else:
            detail[name] = res
        emit()

    def run(leg_names, timeout_s):
        timeout_s = min(timeout_s, max(0.0, _remaining()))
        if inproc:
            for name in leg_names:
                try:
                    on_leg(name, LEGS[name]())
                except Exception as e:  # noqa: BLE001
                    on_leg(name, {"error": f"{type(e).__name__}: {e}"[:300]})
            return set(leg_names)
        return _run_group(leg_names, timeout_s, on_leg)

    # -- leg schedule, value order; see module docstring ------------------
    # 1. primary metric first, with one retry on a worker crash
    done = run(["msm"], 1800)
    if "msm" not in done and _remaining() > 600:
        run(["msm"], 1800)

    # 2. the reference's headline observable: warm 2^20 whole-proof
    #    latency (needs the gate pipeline's cached parameter files)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")
    have20 = (os.path.isfile(os.path.join(cache, "MNT4753-parameters-20"))
              and os.path.isfile(os.path.join(cache, "MNT4753-input-20")))
    if os.environ.get("BENCH_SKIP_PROOF20") or not have20:
        detail["proof20"] = {"skipped": "no cached 2^20 parameter files"
                             if not have20 else "BENCH_SKIP_PROOF20"}
    elif _remaining() < 1200:
        detail["proof20"] = {"skipped": "deadline"}
        emit()
    else:
        run(["proof20"], 3600)

    # 3. secondary kernel legs (one shared subprocess)
    kernel_legs = []
    if not os.environ.get("BENCH_SKIP_G2"):
        kernel_legs.append("g2")
    if not os.environ.get("BENCH_SKIP_NTT"):
        kernel_legs.append("ntt")
    if kernel_legs:
        if _remaining() < 300:
            for name in kernel_legs:
                detail[name] = {"skipped": "deadline"}
            emit()
        else:
            run(kernel_legs, 2400)

    # 4. the small-scale proof leg (generates params if missing)
    if not os.environ.get("BENCH_SKIP_PROOF") and \
            int(os.environ.get("BENCH_PROOF_LOG2D", "16")):
        if _remaining() < 900:
            detail["proof"] = {"skipped": "deadline"}
        else:
            run(["proof"], 4800)

    emit()


if __name__ == "__main__":
    main()
