"""Worker process for tests/test_multihost.py: one jax.distributed
process of a 2-process CPU cluster running the four-step distributed NTT.

Run as:  python tests/multihost_worker.py <process_id> <coordinator>
Prints "MULTIHOST_OK" on success (process 0 verifies against the host
FFT oracle; the other process participates in the collectives).
"""

import os
import random
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    coordinator = sys.argv[2]

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


if __name__ == "__main__":
    main()
