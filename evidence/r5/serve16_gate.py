"""Hardware sha gate + serving measurement for the round-5 session-2
prover (ProverSession refactor, u16 input shipping, serve CLI).

Loads the regenerated MNT4753 2^16 fixtures, stages a ProverSession,
proves the same input 3x, and checks every output against the recorded
CPU-oracle golden sha (rounds 3-4, evidence/r5/gate_r5.sh):
  784ae650d483e2a342d21cd24d107a04c1ef053bbca0ea2bf028146bc0885ca9

prove[0] pays the deferred row conversion + compiles; prove[2] is the
steady-state serving latency (inputs-only upload).
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.expanduser(
    "~/.cache/gpu_groth16_prover_3x_tpu/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753  # noqa: E402
from gpu_groth16_prover_3x_tpu.models import tpu_prover as tp  # noqa: E402
from gpu_groth16_prover_3x_tpu.utils import serialization as ser  # noqa: E402

GOLDEN = "784ae650d483e2a342d21cd24d107a04c1ef053bbca0ea2bf028146bc0885ca9"
B = ".bench_cache"

t0 = time.time()
params = tp.load_params(f"{B}/MNT4753-parameters-16", MNT4753)
inputs = tp.load_input(f"{B}/MNT4753-input-16", MNT4753, params.d, params.m)
print(f"load: {time.time() - t0:.1f}s", flush=True)

t0 = time.time()
sess = tp.ProverSession(MNT4753, params)
print(f"stage params: {time.time() - t0:.1f}s", flush=True)

ok = True
for i in range(3):
    t0 = time.time()
    proof = sess.prove(inputs)
    dt = time.time() - t0
    out = f"{B}/MNT4753-output-16.serve{i}"
    ser.write_output(out, MNT4753, *proof)
    sha = hashlib.sha256(open(out, "rb").read()).hexdigest()
    match = "MATCH" if sha == GOLDEN else f"MISMATCH want={GOLDEN}"
    ok = ok and sha == GOLDEN
    print(f"prove[{i}]: {dt:.1f}s  sha={sha}  {match}", flush=True)
print("GATE serve16:", "PASS" if ok else "FAIL", flush=True)
sys.exit(0 if ok else 1)
