"""Command-line entry points mirroring the reference binaries.

Reference argv contracts (build.sh:5-9):
  generate_parameters [fast]                     (generate_parameters.cpp:125)
  main <CURVE> compute <params> <input> <output> (main.cpp:342-366)
  main <CURVE> preprocess <params>
  cuda_prover_piecewise <CURVE> compute <params> <input> <output>
                                                 (cuda_prover_piecewise.cu:232)

Here:
  python -m gpu_groth16_prover_3x_tpu generate_parameters [fast]
      [--log2-d-4753 N] [--log2-d-6753 N] [--seed S] [--outdir DIR]
  python -m gpu_groth16_prover_3x_tpu cpu <CURVE> compute <params> <input> <output>
  python -m gpu_groth16_prover_3x_tpu cpu <CURVE> preprocess <params>
  python -m gpu_groth16_prover_3x_tpu tpu <CURVE> compute <params> <input> <output>
  python -m gpu_groth16_prover_3x_tpu tpu <CURVE> serve <params> \
      <input> <output> [<input> <output> ...]

`serve` is the params-resident serving mode (beyond-reference): the
parameter set is loaded and staged on device ONCE, then every
<input> <output> pair is proved against it without re-uploading the
~GB of query rows (models/tpu_prover.ProverSession).  The reference
can only re-load its tables per proof (cuda_prover_piecewise.cu:125).
"""

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="gpu_groth16_prover_3x_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    gen = sub.add_parser("generate_parameters",
                         help="trusted setup + input files for both curves")
    gen.add_argument("fast", nargs="?", default=None)
    gen.add_argument("--log2-d-4753", type=int, default=None)
    gen.add_argument("--log2-d-6753", type=int, default=None)
    gen.add_argument("--seed", type=int, default=None)
    gen.add_argument("--outdir", default=".")

    for name, desc in (("cpu", "CPU oracle prover"),
                       ("tpu", "TPU prover")):
        pr = sub.add_parser(name, help=desc)
        pr.add_argument("curve", choices=["MNT4753", "MNT6753"])
        pr.add_argument("mode", choices=["compute", "preprocess", "serve"]
                        if name == "tpu" else ["compute", "preprocess"])
        pr.add_argument("params_path")
        pr.add_argument("input_path", nargs="?")
        pr.add_argument("output_path", nargs="?")
        if name == "tpu":
            pr.add_argument("more_pairs", nargs="*",
                            help="serve mode: extra <input> <output> pairs")

    args = parser.parse_args(argv)

    if args.cmd == "generate_parameters":
        from ..models import setup as setup_model
        setup_model.generate_all(
            fast=(args.fast == "fast"), outdir=args.outdir,
            log2_d_4753=args.log2_d_4753, log2_d_6753=args.log2_d_6753,
            seed=args.seed)
        return 0

    if args.cmd == "cpu":
        from ..models import cpu_prover
        cpu_prover.main_mode(args.curve, args.mode, args.params_path,
                             args.input_path, args.output_path)
        return 0

    if args.cmd == "tpu":
        # persist compiled executables across CLI processes: the 753-bit
        # limb graphs are compile-heavy, and a repeat prove at the same
        # shapes is otherwise ~full compile cost again (XLA:CPU runs
        # especially — the determinism rerun of the verify recipe).
        # GROTH16_COMPILE_CACHE=0 disables; a path overrides the default.
        import os
        cache = os.environ.get("GROTH16_COMPILE_CACHE")
        if cache != "0":
            try:
                import jax
                jax.config.update(
                    "jax_compilation_cache_dir",
                    cache or os.path.expanduser(
                        "~/.cache/gpu_groth16_prover_3x_tpu/jax_cache"))
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 2)
            except Exception:
                pass
        if args.mode == "preprocess":
            from ..curves.constants import CURVES
            from ..models import preprocess_device
            preprocess_device.run_preprocess(
                CURVES[args.curve], args.params_path,
                f"{args.curve}_preprocessed")
            return 0
        from ..models import tpu_prover
        if args.mode == "serve":
            pairs = [args.input_path, args.output_path] + args.more_pairs
            if len(pairs) % 2 or not all(pairs):
                parser.error("serve needs <input> <output> pairs")
            tpu_prover.serve_files(
                args.curve, args.params_path,
                list(zip(pairs[0::2], pairs[1::2])))
            return 0
        tpu_prover.run_prover(args.curve, args.params_path, args.input_path,
                              args.output_path)
        return 0

    return 2
