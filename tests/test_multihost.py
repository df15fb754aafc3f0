"""Two-PROCESS jax.distributed execution (parallel/multihost.py): the
same four-step distributed NTT as test_multichip, but with the mesh
spanning two OS processes of 2 virtual devices each — collectives cross
the process boundary through the jax.distributed coordination service.
The reference has no analog (single-host CUDA); this is the multi-host
leg of the BASELINE.md 2^24 target."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(mode: str, ok_marker: str, timeout: int = 1800) -> None:
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)            # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), coordinator, mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" +
                    "\n".join(o or "" for o in outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        assert ok_marker in out


@pytest.mark.slow
def test_two_process_distributed_ntt():
    _run_workers("ntt", "MULTIHOST_OK")


@pytest.mark.slow
def test_two_process_distributed_prove():
    """prove_sharded across a real process boundary (VERDICT r4 #8):
    the full distributed prove step — all five MSMs points-DP + the
    all-to-all NTT H pipeline — on a 2-process x 2-virtual-device mesh,
    oracle-checked bit-exactly in every process."""
    # two workers cold-compile the full distributed-prove phase set
    # concurrently on (possibly) one core: generous ceiling
    _run_workers("prove", "MULTIHOST_PROVE_OK", timeout=5400)
