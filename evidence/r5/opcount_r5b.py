"""Canon/select share of the scan step (companion to opcount_r5.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from collections import Counter

B = 1024


def count_jaxpr(jaxpr, mult, tally):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "scan":
            count_jaxpr(eqn.params["jaxpr"].jaxpr,
                        mult * eqn.params["length"], tally)
            continue
        if prim == "while":
            count_jaxpr(eqn.params["body_jaxpr"].jaxpr, mult, tally)
            continue
        if prim == "pjit":
            count_jaxpr(eqn.params["jaxpr"].jaxpr, mult, tally)
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


from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753
from gpu_groth16_prover_3x_tpu.ops.ec import get_curve_ops
from gpu_groth16_prover_3x_tpu.ops import limbs as L

for bits in (16, 15):
    os.environ["GROTH16_FQ_RADIX"] = str(bits)
    cops = get_curve_ops(MNT4753, "g1")
    F = cops.F
    nq = cops.nq
    accA = tuple(jnp.zeros((nq, B), jnp.uint32) for _ in range(3))

    def canon3(accA):
        return tuple(L.canon(a, cops.qbits).astype(jnp.uint16)
                     for a in accA)

    t = inventory(canon3, accA)
    print(f"radix {bits}: emission canon x3 = "
          f"{sum(t.values())/B:,.0f} elem-ops/pt")

    def selects(accA):
        m = jnp.zeros((1, B), jnp.bool_)
        a = cops.from_arrays(accA)
        b = cops.from_arrays(accA)
        s1 = cops.select(m, a, b)    # new_acc select
        s2 = tuple(jnp.where(m, x, y) for x, y in zip(accA, accA))
        return cops.to_arrays(s1) + s2

    t2 = inventory(selects, accA)
    print(f"radix {bits}: acc+first selects = "
          f"{sum(t2.values())/B:,.0f} elem-ops/pt")

    def lift_only(block):
        cs = block.reshape((2, nq, B))
        x = F.from_arrays((cs[0],), 1)
        y = F.from_arrays((cs[1],), 1)
        inf = F.is_zero(y)
        one = F.one((B,))
        zero = F.zero((B,))
        X = F.select(inf, zero, x)
        Y = F.select(inf, one, y)
        Z = F.select(inf, zero, one)
        return X.v, Y.v, Z.v

    block = jnp.zeros((2 * nq, B), jnp.uint32)
    t3 = inventory(lift_only, block)
    print(f"radix {bits}: lift (is_zero + 3 selects) = "
          f"{sum(t3.values())/B:,.0f} elem-ops/pt")
