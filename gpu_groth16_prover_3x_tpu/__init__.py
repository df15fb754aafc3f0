"""TPU-native Groth16 prover framework (MNT4753 / MNT6753).

Brand-new JAX/XLA implementation with the capabilities and I/O contracts
of the reference CUDA prover (vezenovm/gpu-groth16-prover-3x); see
SURVEY.md for the architecture map.

Importing the package enables JAX's persistent compilation cache (if the
user hasn't configured one): the 753-bit limb graphs are compile-heavy
and identical across runs, so caching turns repeat CLI invocations from
minutes of XLA work into milliseconds of cache hits — the moral analog of
the reference shipping prebuilt binaries.
"""

import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.expanduser("~/.cache/gpu_groth16_prover_3x_tpu/jax"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# jax may be pre-imported at interpreter startup (this image does), in
# which case some env-read config happened before the setdefaults above:
# pin the cache settings through the config API as well.
try:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["JAX_COMPILATION_CACHE_DIR"])
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    # Platform pin: site customizations on some hosts programmatically
    # set jax_platforms at interpreter start (overriding JAX_PLATFORMS),
    # so the CLI offers its own env knob that wins by running later.
    # GROTH16_PLATFORM=cpu makes host-only commands (generate_parameters,
    # the cpu oracle prover) immune to an unreachable accelerator plugin.
    _plat = _os.environ.get("GROTH16_PLATFORM")
    if _plat:
        _jax.config.update("jax_platforms", _plat)
except Exception:  # pragma: no cover - cache remains best-effort
    pass
