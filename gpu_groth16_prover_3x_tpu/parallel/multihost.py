"""Multi-host runtime wiring (pod slices over ICI + DCN).

The reference is strictly single-host/single-GPU (SURVEY.md §2.6); this
module supplies the jax.distributed glue for the BASELINE.md 2^24
multi-host configs.  All compute lives in parallel/sharded.py /
parallel/prover.py and is topology-agnostic: this file only builds the
process group and the mesh.

Usage (one process per host, e.g. under a pod launcher):

    from gpu_groth16_prover_3x_tpu.parallel import multihost
    mesh = multihost.initialize_and_mesh()     # ("data",) over all chips
    proof = prove_sharded(curve, params, inputs, mesh)

Hierarchical reduction note: sharded MSM window sums travel as one
all-gather of a few hundred bytes per chip; XLA routes intra-slice hops
over ICI and inter-slice hops over DCN automatically for a 1-D mesh built
with jax.make_mesh (device order is ICI-contiguous), which is the
bandwidth-correct layout because the NTT all_to_alls — the only volume
traffic — stay inside the slice axis.
"""

import os
from typing import Optional

import numpy as np


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env fallbacks
    (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID).  No-op when
    single-process."""
    import jax
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ["NUM_PROCESSES"]),
        process_id=process_id if process_id is not None
        else int(os.environ["PROCESS_ID"]),
    )


def data_mesh(axis: str = "data"):
    """1-D mesh over every addressable chip (ICI-contiguous order)."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis,))


def initialize_and_mesh(axis: str = "data"):
    initialize()
    return data_mesh(axis)
