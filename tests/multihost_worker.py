"""Worker process for tests/test_multihost.py: one jax.distributed
process of a 2-process CPU cluster running the four-step distributed NTT
or (mode=prove) the full distributed prove step.

Run as:  python tests/multihost_worker.py <process_id> <coordinator> [mode]
Prints "MULTIHOST_OK" / "MULTIHOST_PROVE_OK" on success (every process
verifies against the host oracle; collectives cross the process
boundary through the jax.distributed coordination service).
"""

import os
import random
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    coordinator = sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "ntt"

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from gpu_groth16_prover_3x_tpu.parallel import multihost
    multihost.initialize(coordinator=coordinator, num_processes=2,
                         process_id=proc_id)
    mesh = multihost.data_mesh()
    ndev = len(jax.devices())
    assert ndev == 4, f"expected 4 global devices, got {ndev}"

    if mode == "prove":
        return prove_mode(proc_id, mesh)

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
    from gpu_groth16_prover_3x_tpu.host.fft import Radix2Domain
    from gpu_groth16_prover_3x_tpu.ops.ntt import get_plan
    from gpu_groth16_prover_3x_tpu.parallel.sharded import (
        get_sharded_plan, sharded_ntt)
    from gpu_groth16_prover_3x_tpu.utils.serialization import (
        ints_to_u16x48, u16x48_to_ints)

    curve = MNT4753
    fr = curve.fr
    n = 64
    rng = random.Random(0xD15C0)
    vals = [rng.randrange(fr.p) for _ in range(n)]        # same on both
    x_full = ints_to_u16x48(vals, fr.p).T.astype(np.uint32)  # (48, n)

    # global array sharded on the last axis: this process contributes the
    # columns its local devices own
    per = n // 2
    local = x_full[:, proc_id * per:(proc_id + 1) * per]
    x = multihost_utils.host_local_array_to_global_array(
        local, mesh, P(None, "data"))

    plan = get_plan(fr, n)
    splan = get_sharded_plan(plan, ndev)
    out = sharded_ntt(splan, mesh, x)
    out_full = multihost_utils.process_allgather(out, tiled=True)

    got = u16x48_to_ints(np.asarray(out_full).T, fr.p)
    want = Radix2Domain(fr, n).fft(list(vals))
    assert [g % fr.p for g in got] == want, "distributed NTT != host FFT"
    print(f"MULTIHOST_OK proc={proc_id}", flush=True)


def prove_mode(proc_id: int, mesh) -> None:
    """Full distributed prove step with the mesh spanning two processes.

    The last untested link of the BASELINE 2^24 multi-host story
    (SURVEY §2.6): prove_sharded's device_puts target a global mesh —
    valid because every process stages byte-identical host data (same
    deterministic setup seed), the documented multi-process device_put
    contract — and the window-sum outputs come back fully replicated so
    each process can finalize and oracle-check the proof locally.

    Structural configuration (4 low c=4 windows, unsigned) vs the
    host oracle masked to the same 16 scalar bits — the same bounded
    check as __graft_entry__.dryrun_multichip, across a real process
    boundary.
    """
    from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
    from gpu_groth16_prover_3x_tpu.host import groth16 as host_groth16
    from gpu_groth16_prover_3x_tpu.models.tpu_prover import (
        input_from_host, params_from_host)
    from gpu_groth16_prover_3x_tpu.parallel.prover import prove_sharded
    from gpu_groth16_prover_3x_tpu.utils.serialization import (
        Groth16Input, Groth16Params)

    curve = MNT4753
    res = host_groth16.setup(curve, 6, random.Random(0xD15C))
    hp = Groth16Params(res.d, res.m, res.A, res.B1, res.B2, res.L, res.H)
    hi = Groth16Input(res.w, res.ca, res.cb, res.cc, res.r)
    params = params_from_host(curve, hp)
    inputs = input_from_host(curve, hi)

    proof = prove_sharded(curve, params, inputs, mesh, chunk_s=4, c=4,
                          num_windows=4, verbose=(proc_id == 0),
                          hostcall=False)
    expected = host_groth16.prove(curve, hp, hi, mask_bits=16)
    assert proof == expected, "multi-process proof != host oracle proof"
    print(f"MULTIHOST_PROVE_OK proc={proc_id}", flush=True)


if __name__ == "__main__":
    main()
