"""generate_parameters: trusted setup + input generation to files.

File-level equivalent of the reference's `generate_parameters` binary
(libsnark/generate_parameters.cpp:125-137): writes `<CURVE>-parameters` and
`<CURVE>-input` for both curves (default sizes 2^20 / 2^15; `fast` gives
2^14 / 2^10).
"""

import json
import os
import random
from typing import Optional

from ..curves.constants import CURVES, CurveParams
from ..host import groth16
from ..utils import serialization as ser


def generate_parameters(curve: CurveParams, log2_d: int, params_path: str,
                        input_path: str, seed: Optional[int] = None,
                        trapdoor_path: Optional[str] = None,
                        device: Optional[bool] = None) -> None:
    rng = random.Random(seed)
    # The device setup is byte-identical (tests/test_setup_device.py) and
    # the only practical path at the reference's default sizes (2^15+);
    # the pure-python oracle stays the default at tiny sizes.
    if device is None:
        device = log2_d >= 10
    if device:
        from . import setup_device
        result = setup_device.setup(curve, log2_d, rng)
    else:
        result = groth16.setup(curve, log2_d, rng)
    ser.write_params(params_path, curve, result.d, result.m,
                     result.A, result.B1, result.B2, result.L, result.H)
    ser.write_input(input_path, curve, result.w, result.ca, result.cb,
                    result.cc, result.r)
    if trapdoor_path:
        td = result.trapdoor
        with open(trapdoor_path, "w") as f:
            json.dump({
                "t": td.t, "alpha": td.alpha, "beta": td.beta,
                "delta": td.delta, "g1_dlog": td.g1_dlog,
                "zt": td.zt, "at": td.at, "bt": td.bt, "ct": td.ct,
                "d": result.d, "m": result.m,
                "w": result.w, "r": result.r,
            }, f)


def generate_all(fast: bool = False, outdir: str = ".",
                 log2_d_4753: Optional[int] = None,
                 log2_d_6753: Optional[int] = None,
                 seed: Optional[int] = None) -> None:
    """The reference binary's main (generate_parameters.cpp:125-137)."""
    l4 = log2_d_4753 if log2_d_4753 is not None else (14 if fast else 20)
    l6 = log2_d_6753 if log2_d_6753 is not None else (10 if fast else 15)
    for name, log2_d in (("MNT4753", l4), ("MNT6753", l6)):
        generate_parameters(
            CURVES[name], log2_d,
            os.path.join(outdir, f"{name}-parameters"),
            os.path.join(outdir, f"{name}-input"),
            seed=seed,
        )
