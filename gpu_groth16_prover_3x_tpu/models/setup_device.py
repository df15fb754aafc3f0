"""Device-accelerated trusted setup (generate_parameters).

The reference generator spends its time in fixed-base windowed
exponentiations over G1/G2 (libff batch_exp, multiexp.tcc:587-680, driven
by r1cs_gg_ppzksnark.tcc:289-345).  The host-exact python version
(host/msm.py) is the oracle but is impractical beyond ~2^10 scalars; this
module runs the exponentiations on the TPU instead (SURVEY.md §2.4 P7:
"table build as a one-time jitted program"):

  fixed-base windowed exponentiation (the device realization of libff's
  get_window_table/batch_exp, multiexp.tcc:587-680): one cached
  projective table T[w][d] = d * 2^(c*w) * base per base (c = 8: 96
  windows x 256 multiples, built by a single 255-step device ladder
  vectorized across windows), then 96 complete adds per scalar — ~12x
  fewer field muls than the 753-step double-and-add scan, which remains
  as the small-n / GROTH16_EXP_WINDOWED=0 fallback.

Only group-element equality matters for the serialized parameters (the
file stores affine points), so the device path is interchangeable with
the oracle — asserted in tests/test_setup_device.py.
"""

import random
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.constants import CurveParams, R
from ..host import ec as host_ec
from ..host import field as HF
from ..host.fft import Radix2Domain
from ..host.groth16 import SetupResult, Trapdoor, qap_instance_evaluation
from ..host.r1cs import generate_r1cs_example_with_field_input, evaluate_lc
from ..ops import limbs as L
from ..ops.ec import _get_curve_ops


def get_curve_ops(curve, group):
    # pinned radix-16 Fq ops: this tool serializes the reference's
    # R = 2^768 limb formats and builds its device elements at that
    # radix; the GROTH16_FQ_RADIX=15 prover path converts at load
    # (ops/msm.rows_to_radix15), not here
    return _get_curve_ops(curve, group, 16)
from ..ops.field import Fel
from ..ops.msm import scalars_to_limbs
from ..utils import native
from ..utils import serialization as ser


@jax.jit
def _bits_from_limbs(limbs):
    """(48, n) u32 16-bit limbs -> (768, n) u32 bit array, LSB first."""
    shifts = jnp.arange(16, dtype=jnp.uint32)[None, :, None]
    bits = (limbs[:, None, :] >> shifts) & 1
    return bits.reshape(-1, limbs.shape[-1])


def _exp_scan(cops, x2, y2, bits):
    """Batched double-and-add: sum over bits (MSB->LSB Horner)."""
    acc0 = cops.to_arrays(cops.zero((bits.shape[-1],)))

    def step(acc_arrs, bit_row):
        acc = cops.from_arrays(acc_arrs)
        acc = cops.dbl(acc)
        added = cops.mixed_add(acc, x2, y2)
        acc = cops.select((bit_row == 0)[None, :], acc, added)
        return cops.to_arrays(cops.normalize_k(acc)), None

    out, _ = jax.lax.scan(step, acc0, jnp.flip(bits, axis=0))
    return out


# fixed-base window width: 16 must be divisible by it (digit extraction
# splits 16-bit limbs); 8 -> 96 windows x 256 table entries
EXP_WINDOW_C = 8
_TABLE_CACHE = {}   # (curve.name, group, affine base) -> device arrays


def _window_table(curve: CurveParams, group: str, base_pt, cops, hg):
    """Projective device table T[w*2^c + d] = d * 2^(c*w) * base.

    The TPU realization of libff's fixed-base window tables
    (multiexp.tcc:587-680 get_window_table): the per-window bases
    2^(c*w)*base are 768 cheap host doublings; the d-multiples ladder is
    ONE device scan of 2^c-1 complete mixed-adds vectorized across all
    windows.  Returned as raw coordinate arrays (48, nwin << c) so the
    consuming exponentiation scan can gather columns by w*2^c + digit.

    Cached per (curve, group, base): every generate_parameters G1 query
    (A/B1/L/H) shares the same base, so the table is built once.
    """
    c = EXP_WINDOW_C
    nwin = 768 // c
    p = curve.fq.p
    deg = cops.F.deg

    bx, by = hg.to_affine(base_pt)
    key = (curve.name, group, bx, by)
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit

    # host: the 96 window bases (768 python doublings — microseconds each)
    cur = base_pt
    win_aff = []
    for _ in range(nwin):
        win_aff.append(hg.to_affine(cur))
        for _ in range(c):
            cur = hg.dbl(cur)

    def fel_cols(vals):
        """list of ints -> (48, nwin) Montgomery Fel."""
        cols = np.stack([L.int_to_limbs(v * R % p) for v in vals], axis=1)
        return Fel(jnp.asarray(cols), 1)

    if deg == 1:
        x2 = fel_cols([a[0] for a in win_aff])
        y2 = fel_cols([a[1] for a in win_aff])
    else:
        x2 = tuple(fel_cols([a[0][i] for a in win_aff]) for i in range(deg))
        y2 = tuple(fel_cols([a[1][i] for a in win_aff]) for i in range(deg))

    # device: d-multiples ladder, collecting every acc (d = 1 .. 2^c - 1)
    zero_arrs = cops.to_arrays(cops.zero((nwin,)))

    def step(acc_arrs, _):
        acc = cops.mixed_add(cops.from_arrays(acc_arrs), x2, y2)
        arrs = cops.to_arrays(cops.normalize_k(acc))
        return arrs, arrs

    _, ladder = jax.lax.scan(step, zero_arrs, None, length=(1 << c) - 1)
    # prepend d=0 (identity; the consuming adds are complete, so no mask)
    tables = tuple(
        jnp.concatenate([z[None], lad], axis=0)        # (2^c, 48, nwin)
           .transpose(1, 2, 0)                         # (48, nwin, 2^c)
           .reshape(L.NUM_LIMBS, nwin << c)
        for z, lad in zip(zero_arrs, ladder))
    tables = jax.block_until_ready(tables)
    _TABLE_CACHE[key] = tables
    return tables


def _digits_from_limbs(limbs):
    """(48, n) u32 16-bit limbs -> (nwin, n) u32 c-bit digits, LSB first."""
    c = EXP_WINDOW_C
    per = 16 // c
    shifts = (jnp.arange(per, dtype=jnp.uint32) * c)[None, :, None]
    digs = (limbs[:, None, :] >> shifts) & ((1 << c) - 1)
    return digs.reshape(-1, limbs.shape[-1])


def _exp_windowed(cops, tables, limbs):
    """Fixed-base windowed exponentiation: 768/c complete adds per scalar
    (vs 768 dbl+masked-add steps for _exp_scan — ~12x fewer field muls).

    Digit 0 gathers the identity column and the RCB15 complete add
    absorbs it branch-free (ops/ec.py module docstring), so there is no
    per-lane masking at all.
    """
    c = EXP_WINDOW_C
    digits = _digits_from_limbs(limbs)            # (nwin, n)
    nwin = digits.shape[0]
    offs = (jnp.arange(nwin, dtype=jnp.uint32) << c)[:, None]
    acc0 = cops.to_arrays(cops.zero((limbs.shape[-1],)))

    def step(acc_arrs, idx_row):
        pt = cops.from_arrays(
            [jnp.take(t, idx_row, axis=1) for t in tables])
        acc = cops.add(cops.from_arrays(acc_arrs), pt)
        return cops.to_arrays(cops.normalize_k(acc)), None

    out, _ = jax.lax.scan(step, acc0, offs + digits)
    return out


def _exp_cache_path(curve, group, base_aff, scalars):
    """Per-query checkpoint path under $GROTH16_SETUP_CACHE (or None).

    The axon TPU worker crashes sporadically mid-run (BASELINE.md round-3
    findings); a 2^16+ setup runs five multi-minute exponentiation scans,
    so without checkpoints a crash-retry loop restarts from zero and may
    never win the race.  Keyed by a digest of (curve, group, base,
    scalars) so any change invalidates; written atomically.
    """
    import hashlib
    import os
    d = os.environ.get("GROTH16_SETUP_CACHE")
    if not d:
        return None
    os.makedirs(d, exist_ok=True)
    h = hashlib.sha256(repr(
        (curve.name, group, base_aff, len(scalars), tuple(scalars))
    ).encode()).hexdigest()[:24]
    return os.path.join(d, f"exp-{curve.name}-{group}-{h}.json")


def batch_exp_device(curve: CurveParams, group: str, base_pt,
                     scalars: Sequence[int]) -> List:
    """scalars * base (host Jacobian base point) -> host affine points.

    Device double-and-add in the Montgomery domain; readback + one host
    batch inversion for the affine normalization (the role of libff's
    batch_to_special_all_non_zeros, mnt4753_g1.cpp:485-503).
    """
    cops = get_curve_ops(curve, group)
    hg = (host_ec.g1_group(curve) if group == "g1"
          else host_ec.g2_group(curve))
    p = curve.fq.p
    deg = cops.F.deg
    n = len(scalars)

    bx, by = hg.to_affine(base_pt)

    import json as _json
    import os as _os
    cache_path = _exp_cache_path(curve, group, (bx, by), scalars)
    if cache_path and _os.path.isfile(cache_path):
        with open(cache_path) as f:
            loaded = _json.load(f)

        def untup(v):
            return tuple(v) if isinstance(v, list) else v
        return [(untup(x), untup(y)) for x, y in loaded]

    # checkpointed runs: big queries proceed in blocks so a mid-query
    # worker crash loses at most one block's work on retry (a whole
    # 2^16 query is ~10 device-minutes — observed round 3, crashes can
    # recur faster than that)
    blk = int(_os.environ.get("GROTH16_EXP_BLOCK", 16384))
    if cache_path and n > blk:
        out = []
        for lo in range(0, n, blk):
            out.extend(batch_exp_device(curve, group, base_pt,
                                        scalars[lo:lo + blk]))
        return _exp_cache_save(cache_path, out)

    limbs = jnp.asarray(scalars_to_limbs([s % curve.fr.p for s in scalars]))
    windowed = _os.environ.get("GROTH16_EXP_WINDOWED", "1") != "0" and n >= 32
    if windowed:
        tables = _window_table(curve, group, base_pt, cops, hg)
        arrs = _exp_windowed(cops, tables, limbs)
    else:
        if deg == 1:
            x2 = Fel(jnp.asarray(L.int_to_limbs(bx * R % p)[:, None]), 1)
            y2 = Fel(jnp.asarray(L.int_to_limbs(by * R % p)[:, None]), 1)
        else:
            x2 = tuple(Fel(jnp.asarray(
                L.int_to_limbs(c * R % p)[:, None]), 1) for c in bx)
            y2 = tuple(Fel(jnp.asarray(
                L.int_to_limbs(c * R % p)[:, None]), 1) for c in by)
        bits = _bits_from_limbs(limbs)
        arrs = _exp_scan(cops, x2, y2, bits)

    # readback: canonical Montgomery limbs
    ctx = cops.F.ctx if deg == 1 else cops.F.base.ctx
    rinv = pow(R, -1, p)
    mont_rows = []    # (n, 12) u64 Montgomery rows per coordinate array
    for a in arrs:
        can = np.asarray(L.to_canonical(ctx, a, cops.coord_k))
        mont_rows.append(ser.u16x48_to_u64(can.T))

    if deg == 1:
        # native batch normalization: ONE modular inverse for the batch
        ox, oy = native.batch_affine(mont_rows[0], mont_rows[1],
                                     mont_rows[2], p)
        xs = native.mont_decode(ox, p)
        ys = native.mont_decode(oy, p)
        out = [(int.from_bytes(x.tobytes(), "little"),
                int.from_bytes(y.tobytes(), "little"))
               for x, y in zip(xs, ys)]
        return _exp_cache_save(cache_path, out)

    def coord(idx):
        cols = []
        for a in mont_rows[idx * deg:(idx + 1) * deg]:
            std = native.mont_decode(a, p)
            cols.append([int.from_bytes(r.tobytes(), "little")
                         for r in std])
        return list(zip(*cols))

    xs, ys, zs = coord(0), coord(1), coord(2)
    alpha = curve.non_residue
    # norm-based batch inversion: inv(z) = conj-ish via norms is messy for
    # deg 3; G2 batches are the same size but field ops are python-cheap
    out = []
    for x, y, z in zip(xs, ys, zs):
        if all(c == 0 for c in z):
            out.append((tuple([0] * deg), tuple([0] * deg)))
            continue
        zi = HF.e_inv(z, p, alpha)
        out.append((HF.e_mul(x, zi, p, alpha), HF.e_mul(y, zi, p, alpha)))
    return _exp_cache_save(cache_path, out)


def _exp_cache_save(cache_path, out):
    if cache_path:
        import json as _json
        import os as _os
        tmp = cache_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(out, f)
        _os.replace(tmp, cache_path)
    return out


def setup(curve: CurveParams, log2_d: int,
          rng: random.Random = None) -> SetupResult:
    """Device-accelerated generate_paramaters
    (libsnark/generate_parameters.cpp:23-123): identical randomness
    consumption and outputs to host/groth16.setup, with the five query
    exponentiations on the TPU."""
    rng = rng or random.Random()
    r_mod = curve.fr.p
    d_plus_1 = 1 << log2_d
    d = d_plus_1 - 1

    cs, primary, auxiliary = generate_r1cs_example_with_field_input(
        r_mod, d - 1, 1, rng)
    full_assignment = primary + auxiliary
    m = cs.num_variables

    cs.swap_ab_if_beneficial()
    t = rng.randrange(1, r_mod)
    alpha = rng.randrange(1, r_mod)
    beta = rng.randrange(1, r_mod)
    delta = rng.randrange(1, r_mod)
    delta_inv = pow(delta, -1, r_mod)

    domain = Radix2Domain(curve.fr, cs.num_constraints + cs.num_inputs + 1)
    at, bt, ct, zt = qap_instance_evaluation(cs, domain, t)

    lt = [(beta * at[i] + alpha * bt[i] + ct[i]) * delta_inv % r_mod
          for i in range(cs.num_inputs + 1, m + 1)]
    zt_dinv = zt * delta_inv % r_mod
    ht, ti = [], 1
    for _ in range(d):
        ht.append(ti * zt_dinv % r_mod)
        ti = ti * t % r_mod

    g1 = host_ec.g1_group(curve)
    g1_dlog = rng.randrange(1, r_mod)
    g1_gen = g1.mul(g1_dlog, host_ec.g1_generator(curve))
    g2_gen = host_ec.g2_generator(curve)

    A_aff = batch_exp_device(curve, "g1", g1_gen, at)
    B1_aff = batch_exp_device(curve, "g1", g1_gen, bt)
    B2_aff = batch_exp_device(curve, "g2", g2_gen, bt)
    L_aff = batch_exp_device(curve, "g1", g1_gen, lt)
    H_aff = batch_exp_device(curve, "g1", g1_gen, ht)

    w = [1] + [x % r_mod for x in full_assignment]
    ca = [0] * d_plus_1
    cb = [0] * d_plus_1
    cc = [0] * d_plus_1
    for i in range(cs.num_inputs + 1):
        ca[i + cs.num_constraints] = (
            1 if i == 0 else full_assignment[i - 1] % r_mod)
    for i, cons in enumerate(cs.constraints):
        ca[i] = (ca[i] + evaluate_lc(cons.a, full_assignment, r_mod)) % r_mod
        cb[i] = (cb[i] + evaluate_lc(cons.b, full_assignment, r_mod)) % r_mod
        cc[i] = (cc[i] + evaluate_lc(cons.c, full_assignment, r_mod)) % r_mod
    r = rng.randrange(r_mod)
    # drawn LAST so the params/input byte streams match pre-vk setups
    gamma = rng.randrange(1, r_mod)

    return SetupResult(
        d=d, m=m, A=A_aff, B1=B1_aff, B2=B2_aff, L=L_aff, H=H_aff,
        w=w, ca=ca, cb=cb, cc=cc, r=r,
        trapdoor=Trapdoor(t, alpha, beta, delta, g1_dlog, at, bt, ct, zt,
                          gamma),
    )
