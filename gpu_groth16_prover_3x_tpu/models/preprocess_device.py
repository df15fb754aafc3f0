"""Device-accelerated preprocessed-table builder (reference `main
<CURVE> preprocess` mode, libsnark/main.cpp:311-339).

The table is rows [P..], [2P..], ..., [(2^C - 1)P..] for the B1, B2 and L
query points with C = 5 (main.cpp:320, output_g1_multiples:248-277).  The
reference builds it row-by-row with OpenMP; here each row is ONE batched
complete EC add over the whole query vector on the TPU, and the affine
normalization of all rows costs one modular inverse via the native batch
kernel (utils/native.py).

The output file is bit-identical to the reference format: rows of affine
points, row-major by multiple (consumed at cuda_prover_piecewise.cu:125).
The TPU prover itself does not need these tables (its MSM is Pippenger),
but the tool keeps the reference's preprocess/compute contract complete.
"""

from typing import List

import jax.numpy as jnp
import numpy as np

from ..curves.constants import CurveParams
from ..ops import limbs as L
from ..ops.ec import _get_curve_ops


def get_curve_ops(curve, group):
    # pinned radix-16 Fq ops: this tool serializes the reference's
    # R = 2^768 limb formats and builds its device elements at that
    # radix; the GROTH16_FQ_RADIX=15 prover path converts at load
    # (ops/msm.rows_to_radix15), not here
    return _get_curve_ops(curve, group, 16)
from ..ops.msm import pack_affine_rows
from ..utils import native
from ..utils import serialization as ser

PREPROCESS_C = 5


def _multiples_rows_device(curve: CurveParams, group: str,
                           rows_u16: np.ndarray, c: int) -> List[np.ndarray]:
    """Affine base rows -> list of 2^c - 1 Montgomery affine row arrays."""
    cops = get_curve_ops(curve, group)
    F = cops.F
    deg = F.deg
    n = rows_u16.shape[0]
    p = curve.fq.p

    cs = jnp.asarray(rows_u16).T.astype(jnp.uint32).reshape(
        2 * deg, L.NUM_LIMBS, n)
    x = F.from_arrays(tuple(cs[i] for i in range(deg)), 1)
    y = F.from_arrays(tuple(cs[deg + i] for i in range(deg)), 1)
    inf = F.is_zero(y)

    # projective accumulators: row k holds (k+1) * P
    acc = cops.mixed_add(cops.zero((n,)), x, y, q_inf=inf)
    proj_rows = [cops.to_arrays(cops.normalize_k(acc))]
    for _ in range(2, 1 << c):
        acc = cops.mixed_add(acc, x, y, q_inf=inf)
        proj_rows.append(cops.to_arrays(cops.normalize_k(acc)))

    # normalize all rows at once: stack (rows * n) points
    ctx = F.ctx if deg == 1 else F.base.ctx
    out = []
    if deg == 1:
        stacked = [np.concatenate(
            [ser.u16x48_to_u64(np.asarray(
                L.to_canonical(ctx, r[i], cops.coord_k)).T)
             for r in proj_rows]) for i in range(3)]
        ox, oy = native.batch_affine(stacked[0], stacked[1], stacked[2], p)
        for k in range(len(proj_rows)):
            xs = ser.u64_to_u16x48(ox[k * n:(k + 1) * n]).astype(np.uint16)
            ys = ser.u64_to_u16x48(oy[k * n:(k + 1) * n]).astype(np.uint16)
            out.append(np.concatenate([xs, ys], axis=1))
        return out

    # G2: python extension inversion per point (B2 tables are smaller
    # workloads; native ext-field batch inversion is a later optimization)
    from ..host import field as HF
    from ..curves.constants import R
    alpha = curve.non_residue
    rinv = pow(R, -1, p)
    for r in proj_rows:
        coords = []
        for i in range(3 * deg):
            can = np.asarray(L.to_canonical(ctx, r[i], cops.coord_k))
            u64 = ser.u16x48_to_u64(can.T)
            coords.append([int.from_bytes(row.tobytes(), "little")
                           * rinv % p for row in u64])
        row_pts = []
        for j in range(n):
            z = tuple(coords[2 * deg + d][j] for d in range(deg))
            if all(cc % p == 0 for cc in z):
                row_pts.append(((0,) * deg, (0,) * deg))
                continue
            zi = HF.e_inv(z, p, alpha)
            xj = tuple(coords[d][j] for d in range(deg))
            yj = tuple(coords[deg + d][j] for d in range(deg))
            row_pts.append((HF.e_mul(xj, zi, p, alpha),
                            HF.e_mul(yj, zi, p, alpha)))
        arrs = []
        for which in range(2):
            for d in range(deg):
                arrs.append(ser.ints_to_u16x48(
                    [pt[which][d] for pt in row_pts], p))
        out.append(pack_affine_rows(arrs))
    return out


def run_preprocess(curve: CurveParams, params_path: str,
                   output_path: str) -> None:
    """Write `<CURVE>_preprocessed` (B1, B2, L multiples, C=5) using the
    device for the table arithmetic."""
    from .tpu_prover import load_params
    params = load_params(params_path, curve)
    with open(output_path, "wb") as f:
        for rows, grp in ((params.B1, "g1"), (params.B2, "g2"),
                          (params.L, "g1")):
            for row in _multiples_rows_device(
                    curve, grp, rows, PREPROCESS_C):
                ser.u16x48_to_u64(
                    row.reshape(row.shape[0], -1, 48)).tofile(f)
