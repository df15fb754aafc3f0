"""Device elliptic-curve group ops: complete projective formulas.

TPU-native replacement for the reference's Jacobian device code
(multiexp/curves.cu: mixed_add add-2007-bl at :148-197, add/add_unsafe
:200-266, dbl :268-317).  The reference handles the zero/equal special
cases with per-thread branches and a "add returned zero => re-dispatch to
dbl" fixup (curves.cu:262-265); on a vector machine every lane must take
the same path, so instead we use the **complete homogeneous-projective
formulas of Renes-Costello-Batina 2016** (EPRINT 2015/1060, Algorithms
1-3, general a): one branch-free instruction stream that is correct for
*all* inputs in the odd-order subgroup, including identities, doublings
and inverses — and at 12M+3ma+2mb3 it is no more expensive than the
reference's incomplete 11M+5S mixed add once the special-case handling is
accounted for.

Each formula is scheduled as **three dependency layers of independent
field multiplies**, fused per layer into a single wide Montgomery multiply
(FpOps.mul_batch / ExtOps.mul_batch): the whole group op costs exactly 3
CIOS loop instances regardless of field degree — an order of magnitude
fewer XLA subgraphs than naive per-multiply lowering, and maximal VPU lane
occupancy.  This is the TPU counterpart of the reference packing one limb
per CUDA lane (fixnum.cu:14-17): there the parallel axis is limbs, here it
is (batch x fused-multiply-slots).

Points are (X, Y, Z) homogeneous projective (zero = (0:1:0)), coordinates
are loose-Montgomery field elements (ops/field.py) over Fp (G1) or
Fp2/Fp3 (G2 on the twist).  Affine inputs use the serialized convention
"y == 0 means infinity" (libsnark/serialization.hpp:84-91), handled by a
single select after the mixed add.

Curve-constant folds mirror the reference's mul_<n> chains
(multiexp/arith.cu:81-216, curves.cu:421-425):
  a-mults are small-scalar limb multiplies:
    G1 MNT4753 a=2; G1 MNT6753 a=11; G2 MNT4753 a=(26,0) -> scalar 26;
    G2 MNT6753 a=(0,0,11) -> a*t = (121*t1, 121*t2, 11*t0)
    (the mul_<-1> specialization, arith.cu:204-216)
  b3 = 3b mults are full Montgomery constants folded into the layer batch.
"""

from functools import lru_cache
from typing import Any, Tuple

from ..curves.constants import CurveParams
from ..utils import opcount
from .field import BaseScalar, ExtOps, Fel, FpOps, fq_ops, fqe_ops

Point = Tuple[Any, Any, Any]  # (X, Y, Z), each an Fel (G1) or Fel-tuple (G2)

# Steady-state static value bound (in units of p) of point coordinates
# produced by the formulas below (G1; G2 extension coefficients settle
# higher because Karatsuba cross terms carry k<=10 out of ExtOps.mul).
COORD_K = 4
COORD_K_G2 = 24
# Steady-state limb bound of lazily-carried coordinates (G2 extension
# coefficient chains reach ~8 * 0xffff).
STEADY_LB = 1 << 20


def get_curve_ops(curve: CurveParams, group: str = "g1") -> "CurveOps":
    """Cached per (curve, group, fq radix) so jitted callers share trace
    caches (and a GROTH16_FQ_RADIX flip mid-process gets fresh ops)."""
    from .field import fq_radix
    return _get_curve_ops(curve, group, fq_radix())


@lru_cache(maxsize=None)
def _get_curve_ops(curve: CurveParams, group: str, bits: int) -> "CurveOps":
    # Construct under a pinned radix scope: CurveOps.__init__ reaches
    # fq_ops/fqe_ops which read the ambient radix — without the scope the
    # `bits` key would be advisory only (a direct _get_curve_ops(.., 16)
    # call under GROTH16_FQ_RADIX=15 would silently build radix-15 ops,
    # and the cache could hold an entry whose actual radix contradicts
    # its key).  The setup/preprocess tools rely on this to pin 16.
    from .field import fq_radix_scope
    with fq_radix_scope(bits):
        ops = CurveOps(curve, group)
    assert ops.qbits == bits, (ops.qbits, bits)
    return ops


def _count_ec(kind: str, coord) -> None:
    """Trace-time EC group-op tally (see utils/opcount)."""
    if opcount.enabled():
        batch = coord.batch if isinstance(coord, Fel) else coord[0].batch
        lanes = 1
        for d in batch:
            lanes *= int(d)
        opcount.add(kind, lanes)


class CurveOps:
    """Complete-formula group arithmetic for one group (G1 or G2)."""

    def __init__(self, curve: CurveParams, group: str = "g1"):
        self.curve = curve
        self.group = group
        self.coord_k = COORD_K if group == "g1" else COORD_K_G2
        # base-field (coordinate) limb geometry — msm/straus/pallas layers
        # size their packed rows and canon calls off these, so the Fq
        # radix (GROTH16_FQ_RADIX) threads through without touching the
        # scalar side (keys/digits stay 48 x 16-bit)
        self.fq_ctx = None   # filled below once F exists
        # NOTE: the b3 curve constant is constructed LAZILY (per access)
        # so every trace context builds its own constant from host numpy
        # — a Pallas kernel body (ops/pallas_group.py) must not close
        # over arrays traced outside the kernel.
        if group == "g1":
            self.F = fq_ops(curve)
            a = curve.a
            _F = self.F
            _b3v = 3 * curve.b % curve.fq.p
            self._b3_make = lambda: _F.const(_b3v)
            # no reduction needed: a is tiny (2 or 11), and every a-fold
            # feeds an add chain whose product bounds stay < 2^9 * p^2,
            # far under the ab < R*p Montgomery headroom (MUL_BOUND)
            self._a_mul = lambda t: self.F.small(t, a)
        else:
            self.F = fqe_ops(curve)
            base = self.F.base
            p = curve.fq.p
            if curve.ext_degree == 2:
                alpha = curve.non_residue           # 13
                a26 = curve.a * alpha               # 26
                # b3 = (0, c): single-coefficient constant -> 2 base muls
                # per product instead of Karatsuba 3 (field.BaseScalar)
                _b3v = 3 * curve.twist_b[1] % p
                self._b3_make = lambda: BaseScalar(base.const(_b3v), 1)

                def a_mul(t):
                    return tuple(base.reduce(base.small(x, a26), 2)
                                 for x in t)
            else:
                alpha = curve.non_residue           # 11
                a11 = curve.a                       # 11
                # b3 = (c, 0, 0): base-field scalar -> 3 base muls per
                # product instead of Karatsuba 6 (field.BaseScalar)
                _b3v = 3 * curve.twist_b[0] % p
                self._b3_make = lambda: BaseScalar(base.const(_b3v), 0)

                def a_mul(t):
                    # (0,0,11)*(t0,t1,t2) = (121*t1, 121*t2, 11*t0)
                    return (base.reduce(base.small(t[1], a11 * alpha), 2),
                            base.reduce(base.small(t[2], a11 * alpha), 2),
                            base.reduce(base.small(t[0], a11), 2))

            self._a_mul = a_mul
        self.fq_ctx = (self.F.ctx if self.F.deg == 1 else self.F.base.ctx)
        self.nq = self.fq_ctx.n          # limbs per coordinate coefficient
        self.qbits = self.fq_ctx.bits    # coordinate limb radix

    @property
    def _b3(self):
        return self._b3_make()

    # -- constructors ---------------------------------------------------------

    def zero(self, batch=(1,)) -> Point:
        F = self.F
        return (F.zero(batch), F.one(batch), F.zero(batch))

    def from_affine(self, x, y) -> Point:
        """Lift affine (x, y) field elements to projective; the caller is
        responsible for the y==0-means-infinity convention."""
        batch = x.batch if isinstance(x, Fel) else x[0].batch
        return (x, y, self.F.one(batch))

    # -- group law (RCB15, layer-batched) --------------------------------------

    def add(self, P: Point, Q: Point) -> Point:
        """Complete projective-projective addition (RCB15 Algorithm 1)."""
        from . import pallas_group as PG
        R = PG.maybe_add(self, P, Q)
        if R is not None:
            return R
        F = self.F
        am = self._a_mul
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        _count_ec("ec_add", X1)
        # layer 1: the six symmetric products
        m1, m2, m3, m4, m5, m6 = F.mul_batch([
            (X1, X2), (Y1, Y2), (Z1, Z2),
            (F.add(X1, Y1), F.add(X2, Y2)),
            (F.add(X1, Z1), F.add(X2, Z2)),
            (F.add(Y1, Z1), F.add(Y2, Z2)),
        ])
        t3 = F.sub(m4, F.add(m1, m2))
        t4 = F.sub(m5, F.add(m1, m3))
        t5 = F.sub(m6, F.add(m2, m3))
        t2a = am(t4)
        t1d = F.add(F.add(F.add(m1, m1), m1), am(m3))
        t2c = am(F.sub(m1, am(m3)))
        # layer 2: the b3 folds
        m7, m8 = F.mul_batch([(self._b3, m3), (self._b3, t4)])
        Z3a = F.add(m7, t2a)
        X3 = F.sub(m2, Z3a)
        Z3c = F.add(m2, Z3a)
        t4c = F.add(m8, t2c)
        # layer 3: the output products
        m9, m10, m11, m12, m13, m14 = F.mul_batch([
            (X3, Z3c), (t1d, t4c), (t5, t4c),
            (X3, t3), (t3, t1d), (t5, Z3c),
        ])
        return (F.sub(m12, m11), F.add(m9, m10), F.add(m14, m13))

    def mixed_add(self, P: Point, x2, y2, q_inf=None) -> Point:
        """Complete mixed addition (RCB15 Algorithm 2, Z2 = 1).

        `q_inf`: optional (1, *batch) bool mask; where True the affine
        operand is the identity (serialized as y == 0) and P is returned.
        """
        from . import pallas_group as PG
        R = PG.maybe_mixed_add(self, P, x2, y2, q_inf)
        if R is not None:
            return R
        F = self.F
        am = self._a_mul
        X1, Y1, Z1 = P
        _count_ec("ec_mixed_add", X1)
        m1, m2, m3, m4, m5, m6 = F.mul_batch([
            (X1, x2), (Y1, y2),
            (F.add(X1, Y1), F.add(x2, y2)),
            (Z1, x2), (Z1, y2), (self._b3, Z1),
        ])
        t3 = F.sub(m3, F.add(m1, m2))
        t4 = F.add(m4, X1)
        t5 = F.add(m5, Y1)
        Z3a = F.add(m6, am(t4))
        X3 = F.sub(m2, Z3a)
        Z3c = F.add(m2, Z3a)
        t2 = am(Z1)
        t1d = F.add(F.add(F.add(m1, m1), m1), t2)
        t2c = am(F.sub(m1, t2))
        m7, m8 = F.mul_batch([(X3, Z3c), (self._b3, t4)])
        t4c = F.add(m8, t2c)
        m9, m10, m11, m12, m13 = F.mul_batch([
            (t1d, t4c), (t5, t4c), (X3, t3), (t3, t1d), (t5, Z3c),
        ])
        R = (F.sub(m11, m10), F.add(m7, m9), F.add(m13, m12))
        if q_inf is not None:
            R = self.select(q_inf, P, R)
        return R

    def dbl(self, P: Point) -> Point:
        """Complete doubling (RCB15 Algorithm 3)."""
        from . import pallas_group as PG
        R = PG.maybe_dbl(self, P)
        if R is not None:
            return R
        F = self.F
        am = self._a_mul
        X, Y, Z = P
        _count_ec("ec_dbl", X)
        m1, m2, m3, m4, m5, m6 = F.mul_batch([
            (X, X), (Y, Y), (Z, Z), (X, Y), (X, Z), (Y, Z),
        ])
        t3 = F.add(m4, m4)
        z2 = F.add(m5, m5)
        t2m = am(m3)
        t3c = am(F.sub(m1, t2m))
        t0c = F.add(F.add(F.add(m1, m1), m1), t2m)
        t2c = F.add(m6, m6)
        m7, m8 = F.mul_batch([(self._b3, m3), (self._b3, z2)])
        Y3b = F.add(am(z2), m7)
        X3 = F.sub(m2, Y3b)
        Y3c = F.add(m2, Y3b)
        t3d = F.add(t3c, m8)
        m9, m10, m11, m12, m13 = F.mul_batch([
            (X3, Y3c), (t3, X3), (t0c, t3d), (t2c, t3d), (t2c, m2),
        ])
        Z3 = F.small(m13, 4)
        Z3 = F.reduce(Z3, COORD_K)
        return (F.sub(m10, m12), F.add(m9, m11), Z3)

    # -- structure ------------------------------------------------------------

    def select(self, mask, P: Point, Q: Point) -> Point:
        """mask True -> P, else Q (mask shape (1, *batch))."""
        F = self.F
        return tuple(F.select(mask, a, b) for a, b in zip(P, Q))

    def normalize_k(self, P: Point, k: int = None) -> Point:
        """Pin coordinate bound metadata to fixed (k, lb) so lax.scan /
        while_loop carries see iteration-invariant static state."""
        if k is None:
            k = self.coord_k
        def fix(c):
            if isinstance(c, Fel):
                assert c.k <= k and c.lb <= STEADY_LB, (c.k, c.lb)
                return Fel(c.v, k, STEADY_LB)
            return tuple(fix(x) for x in c)
        return tuple(fix(c) for c in P)

    def canon_point(self, P: Point) -> Point:
        """Resolve lazy carries on every coordinate (e.g. before narrowing
        to uint16 storage)."""
        return tuple(self.F.canon_limbs(c) for c in P)

    # -- raw-array packing (for lax.scan carries / scatter payloads) ----------

    def to_arrays(self, P: Point):
        out = []
        for c in P:
            out.extend(self.F.to_arrays(c))
        return tuple(out)

    def from_arrays(self, arrs, k: int = None, lb: int = STEADY_LB) -> Point:
        if k is None:
            k = self.coord_k
        deg = self.F.deg
        coords = []
        for i in range(3):
            coords.append(self.F.from_arrays(
                arrs[i * deg:(i + 1) * deg], k, lb))
        return tuple(coords)
