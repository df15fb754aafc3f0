"""Per-scan-step element-op inventory at both Fq radixes (VERDICT r4 #3).

Walks the jaxpr of (a) the full MSM scan step_core trace and (b) just its
13 Montgomery multiplies, recursing into scan/while bodies with trip
multipliers, tallying per-primitive element counts (product of the
largest output shape).  (a) - (b) = the radix-invariant non-CIOS tax.

Run from the repo root:  python .scratch/opcount_r5.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from collections import Counter

B = 1024   # lanes; all counts reported per point (divided by B)


def count_jaxpr(jaxpr, mult, tally):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "scan":
            inner = eqn.params["jaxpr"].jaxpr
            length = eqn.params["length"]
            count_jaxpr(inner, mult * length, tally)
            continue
        if prim == "while":
            # assume 1 trip for inventory purposes (stitch early-exits)
            count_jaxpr(eqn.params["body_jaxpr"].jaxpr, mult, tally)
            continue
        if prim in ("cond",):
            for br in eqn.params["branches"]:
                count_jaxpr(br.jaxpr, mult, tally)
            continue
        if prim in ("pjit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "remat"):
            sub = eqn.params.get("jaxpr")
            if sub is not None:
                count_jaxpr(getattr(sub, "jaxpr", sub), mult, tally)
            continue
        elems = 0
        for v in eqn.outvars:
            n = 1
            for d in getattr(v.aval, "shape", ()):
                n *= int(d)
            elems = max(elems, n)
        tally[prim] += mult * elems


def inventory(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    tally = Counter()
    count_jaxpr(jaxpr.jaxpr, 1, tally)
    return tally


def fmt(tally, label):
    total = sum(tally.values())
    top = tally.most_common(10)
    print(f"  {label}: total {total/B:,.0f} elem-ops/point")
    for k, v in top:
        print(f"    {k:24s} {v/B:12,.1f}  ({100*v/total:4.1f}%)")
    return total


from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops

for bits in (16, 15):
    os.environ["GROTH16_FQ_RADIX"] = str(bits)
    cops = get_curve_ops(MNT4753, "g1")
    F = cops.F
    nq = cops.nq
    print(f"== radix {bits} (nq={nq}) ==")

    def scan_step(accA, firstA, prevk, haschg, kj, block):
        """Mirror of ops/msm.py step_core (G1, signed off)."""
        from gpu_groth16_prover_3x_tpu.ops import limbs as L
        from gpu_groth16_prover_3x_tpu.ops.msm import _tree_select
        cs = block.reshape((2, nq, B))
        x = F.from_arrays((cs[0],), 1)
        y = F.from_arrays((cs[1],), 1)
        inf = F.is_zero(y)
        one = F.one((B,)); zero = F.zero((B,))
        X = F.select(inf, zero, x); Y = F.select(inf, one, y)
        Z = F.select(inf, zero, one)
        lifted = (X, Y, Z)
        acc = cops.from_arrays(accA)
        summ = cops.mixed_add(acc, x, y, q_inf=inf)
        same = (kj == prevk)[None]
        new_acc = cops.select(same, summ, lifted)
        change = ~same[0]
        emit_valid = change & haschg
        first_now = change & (~haschg)
        newfirst = _tree_select(first_now[None], accA, firstA)
        new_accA = cops.to_arrays(cops.normalize_k(new_acc))
        em_vals = tuple(L.canon(a, cops.qbits).astype(jnp.uint16)
                        for a in accA)
        return (tuple(new_accA) + tuple(newfirst) + em_vals
                + (haschg | change, emit_valid))

    def muls_only(accA, block):
        """Just the 13 Montgomery multiplies of mixed_add at the same
        shapes (layer-batched like ec.mixed_add's 6+2+5 fusion)."""
        cs = block.reshape((2, nq, B))
        x = F.from_arrays((cs[0],), 1)
        y = F.from_arrays((cs[1],), 1)
        X1, Y1, Z1 = cops.from_arrays(accA)
        m = F.mul_batch([(X1, x), (Y1, y), (F.add(X1, Y1), F.add(x, y)),
                         (Z1, x), (Z1, y), (cops._b3, Z1)])
        m2 = F.mul_batch([(m[0], m[1]), (cops._b3, m[2])])
        m3 = F.mul_batch([(m[3], m2[0]), (m[4], m2[1]), (m[5], m[0]),
                          (m[1], m[2]), (m[4], m[5])])
        return tuple(e.v for e in m) + tuple(e.v for e in m2) + \
            tuple(e.v for e in m3)

    accA = tuple(jnp.zeros((nq, B), jnp.uint32) for _ in range(3))
    firstA = tuple(jnp.zeros((nq, B), jnp.uint32) for _ in range(3))
    prevk = jnp.zeros((B,), jnp.uint32)
    haschg = jnp.zeros((B,), jnp.bool_)
    kj = jnp.zeros((B,), jnp.uint32)
    block = jnp.zeros((2 * nq, B), jnp.uint32)

    t_full = inventory(scan_step, accA, firstA, prevk, haschg, kj, block)
    t_muls = inventory(muls_only, accA, block)
    tot_full = fmt(t_full, "full step_core")
    tot_muls = fmt(t_muls, "13 mont_muls only")
    print(f"  non-CIOS tax: {(tot_full-tot_muls)/B:,.0f} elem-ops/point "
          f"({100*(tot_full-tot_muls)/tot_full:.1f}% of step)")
