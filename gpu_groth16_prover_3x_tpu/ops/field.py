"""Device field arithmetic: Fp and the Fp2/Fp3 towers, loose-Montgomery.

The TPU replacement for the reference's device field layer
(multiexp/arith.cu: Fp CIOS at :289-337, Fp2 Karatsuba :370-462, Fp3
:465-613).  Elements live in *loose Montgomery form*: canonical 16-bit
limbs (ops/limbs.py) whose integer value may exceed p; each `Fel` carries
a static bound `k` meaning value < k*p.  Bounds are checked at trace time
(never at run time) so lazy reduction is provably safe:

  * mont_mul needs a.k * b.k <= MUL_BOUND (ab < R*p) and yields k=2.
  * add/sub accumulate bounds; explicit `reduce` calls (inserted where the
    static asserts would trip) bring a bound back down with
    compare-subtract passes.

Extension fields are coefficient tuples of Fel with the tower non-residue
folded in as a cheap small-scalar multiply (alpha = 13 for MNT4753 Fq2,
11 for MNT6753 Fq3 — mnt4753_init.cpp:105 / mnt6753_init.cpp:109), exactly
mirroring the Karatsuba structure of arith.cu but with lane-dense vectors
instead of warp tiles.
"""

from dataclasses import dataclass
from functools import lru_cache
from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np

from ..curves.constants import CurveParams, FieldParams
from . import limbs as L

# a.k * b.k must stay below this for mont_mul inputs: ab < R*p needs
# k_a*k_b < 2^768/p ~ 56700; at 30000 the reduction result is still
# < p * (1 + 30000 * p / R) < 1.54 p < 2p.
MUL_BOUND = 30000


CANON_LB = 0xFFFF          # limb bound of canonical 16-bit limbs
MAX_LB = (1 << 31) - 1     # uint32 headroom for lazy limb accumulation


@dataclass(frozen=True)
class Fel:
    """One batched field element: limbs + static value/limb bounds.

    `k`  — value < k * p (tracked through lazy modular reduction)
    `lb` — every limb < lb (tracked through lazy carry accumulation;
           adds/subs/small-multiplies DON'T resolve carries — only a
           Montgomery-multiply entry canonicalizes, so the common chains
           cost one vector op per add instead of a full Kogge-Stone pass)
    """
    v: Any          # (48, *batch) uint32
    k: int          # value < k * p
    lb: int = CANON_LB

    @property
    def batch(self):
        return self.v.shape[1:]

    @property
    def canonical_limbs(self):
        return self.lb <= CANON_LB


class FpOps:
    """Prime-field ops over batched limb vectors.

    `bits` picks the limb radix (16 default; 15 enables the one-fold
    CIOS of ops/limbs.py — used for Fq via fq_ops' GROTH16_FQ_RADIX
    knob).  All shape/bound constants derive from the MontCtx so the
    two radixes share every code path.
    """

    deg = 1

    def __init__(self, fp: FieldParams, bits: int = 16):
        self.fp = fp
        self.ctx = L.MontCtx(fp.p, bits)
        self.p = fp.p
        self.nl = self.ctx.n             # limbs per element
        self.canon_lb = self.ctx.mask    # canonical limb bound

    # -- constructors --------------------------------------------------------

    def const(self, x: int, to_mont: bool = True) -> Fel:
        """Host int -> broadcastable (nl,1) constant element."""
        m = (x * self.ctx.r) % self.p if to_mont else x % self.p
        return Fel(jnp.asarray(
            L.int_to_limbs(m, self.nl, self.ctx.bits)[:, None]), 1,
            self.canon_lb)

    def zero(self, batch=(1,)) -> Fel:
        return Fel(jnp.zeros((self.nl,) + tuple(batch), jnp.uint32), 1,
                   self.canon_lb)

    def one(self, batch=None) -> Fel:
        one = jnp.asarray(self.ctx.one_mont)
        if batch is not None:
            one = jnp.broadcast_to(
                one.reshape((self.nl,) + (1,) * len(batch)),
                (self.nl,) + tuple(batch))
        return Fel(one, 1, self.canon_lb)

    def from_numpy(self, arr: np.ndarray, k: int = 1) -> Fel:
        """(n, nl) or (nl, n) uint limb array -> Fel (Montgomery passthrough)."""
        if arr.shape[-1] == self.nl and arr.shape[0] != self.nl:
            arr = np.ascontiguousarray(arr.T)
        return Fel(jnp.asarray(arr.astype(np.uint32)), k, self.canon_lb)

    # -- arithmetic ----------------------------------------------------------
    #
    # add / sub / small are LAZY: one or two raw vector ops, no carry
    # resolution.  Carries resolve exactly once, at Montgomery-multiply
    # entry (canon_limbs), where the CIOS loop needs 16-bit operand limbs.

    def canon_limbs(self, a: Fel) -> Fel:
        if a.lb <= self.canon_lb:
            return a
        return Fel(L.canon(a.v, self.ctx.bits), a.k, self.canon_lb)

    def add(self, a: Fel, b: Fel) -> Fel:
        assert a.lb + b.lb <= MAX_LB
        nd = max(a.v.ndim, b.v.ndim)
        return Fel(self._align(a.v, nd) + self._align(b.v, nd),
                   a.k + b.k, a.lb + b.lb)

    def sub(self, a: Fel, b: Fel) -> Fel:
        """a - b + b.k*p, lazily: a + (C - b) + ((b.k*p - C*U) mod 2^768).

        The 2^768 wrap vanishes at the next canonicalization (the result
        value is in range by the k-bounds), so this is two vector adds.
        """
        c = b.lb
        nd = max(a.v.ndim, b.v.ndim)
        d = jnp.asarray(self.ctx.sub_const(b.k, c)).reshape(
            (self.nl,) + (1,) * (nd - 1))
        assert a.lb + c + self.canon_lb <= MAX_LB
        return Fel(self._align(a.v, nd) + (jnp.uint32(c)
                                           - self._align(b.v, nd)) + d,
                   a.k + b.k, a.lb + c + self.canon_lb)

    @staticmethod
    def _align(v, ndim: int):
        """Left-pad batch dims so (48, 1)-style constants broadcast against
        higher-rank batches (jnp broadcasting is right-aligned)."""
        if v.ndim >= ndim:
            return v
        return v.reshape((v.shape[0],) + (1,) * (ndim - v.ndim)
                         + v.shape[1:])

    def mul(self, a: Fel, b: Fel) -> Fel:
        assert a.k * b.k <= MUL_BOUND, (a.k, b.k)
        a, b = self.canon_limbs(a), self.canon_limbs(b)
        nd = max(a.v.ndim, b.v.ndim)
        return Fel(L.mont_mul(self.ctx, self._align(a.v, nd),
                              self._align(b.v, nd)), 2, self.canon_lb)

    def sqr(self, a: Fel) -> Fel:
        return self.mul(a, a)

    def mul_batch(self, pairs) -> list:
        """Independent products fused into ONE Montgomery multiply.

        The EC formulas have 3 dependency layers of ~6 multiplies each
        (ops/ec.py); stacking them along the batch axis turns ~14 small
        CIOS loop instances per group op into 3 wide ones — an order of
        magnitude fewer XLA subgraphs (compile time) and far fewer, wider
        VPU kernels (runtime).  Lazy operands are canonicalized once per
        stacked side, not per multiply.
        """
        if len(pairs) == 1:
            return [self.mul(*pairs[0])]
        batch = None
        for a, b in pairs:
            assert a.k * b.k <= MUL_BOUND, (a.k, b.k)
            shape = jnp.broadcast_shapes(a.v.shape[1:], b.v.shape[1:])
            batch = shape if batch is None else \
                jnp.broadcast_shapes(batch, shape)
        full = (self.nl,) + tuple(batch)
        nd = len(full)

        def stack(els):
            # Selective entry canonicalization: only the LAZY operands
            # pay the Kogge-Stone pass, as ONE grouped canon over the
            # lazy subset (sliced back afterwards).  A whole-stack canon
            # would re-canonicalize the mul outputs / constants that
            # dominate layers 2-3 of the EC formulas — measured ~12% of
            # the MSM scan step's element ops (.scratch/opcount_r5b.py).
            # Grouped (not per-element) so the canon network isn't
            # duplicated per operand: XLA:CPU's LLVM backend segfaulted
            # on the per-element form's module size at deg 3.
            vs = [jnp.broadcast_to(self._align(e.v, nd), full)
                  for e in els]
            lazy_idx = [i for i, e in enumerate(els)
                        if e.lb > self.canon_lb]
            if lazy_idx:
                cat = L.canon(
                    jnp.concatenate([vs[i] for i in lazy_idx], axis=-1),
                    self.ctx.bits)
                w = batch[-1]
                for j, i in enumerate(lazy_idx):
                    vs[i] = cat[..., j * w:(j + 1) * w]
            return jnp.concatenate(vs, axis=-1)

        A = stack([a for a, _ in pairs])
        B = stack([b for _, b in pairs])
        C = L.mont_mul(self.ctx, A, B)
        w = batch[-1]
        return [Fel(C[..., i * w:(i + 1) * w], 2, self.canon_lb)
                for i in range(len(pairs))]

    def small(self, a: Fel, c: int) -> Fel:
        if c == 1:
            return a
        assert c * a.k <= MUL_BOUND and c * a.lb <= MAX_LB
        return Fel(a.v * jnp.uint32(c), c * a.k, c * a.lb)

    def reduce(self, a: Fel, k_to: int = 2) -> Fel:
        if a.k <= k_to:
            return a
        a = self.canon_limbs(a)
        return Fel(L.reduce_bound(self.ctx, a.v, a.k, k_to), k_to,
                   self.canon_lb)

    def canonical(self, a: Fel) -> Fel:
        return Fel(L.to_canonical(self.ctx, a.v, a.k), 1, self.canon_lb)

    # -- structure -----------------------------------------------------------

    def select(self, mask, a: Fel, b: Fel) -> Fel:
        """mask shape (1, *batch) or broadcastable; True -> a."""
        nd = max(a.v.ndim, b.v.ndim)
        return Fel(jnp.where(mask, self._align(a.v, nd),
                             self._align(b.v, nd)),
                   max(a.k, b.k), max(a.lb, b.lb))

    def is_zero(self, a: Fel):
        """Exact zero test (needs canonical-mod-p input to be exact for
        nonzero multiples of p; used on serialized inputs where k==1)."""
        assert a.k == 1 and a.lb <= self.canon_lb
        return L.is_zero(a.v)

    def broadcast(self, a: Fel, batch) -> Fel:
        return Fel(jnp.broadcast_to(a.v, (self.nl,) + tuple(batch)),
                   a.k, a.lb)

    # pytree-ish helpers (coordinates as raw arrays for scan/scatter)
    def to_arrays(self, a: Fel):
        return (a.v,)

    def from_arrays(self, arrs, k: int, lb: int = None) -> Fel:
        return Fel(arrs[0], k, self.canon_lb if lb is None else lb)


@dataclass(frozen=True)
class BaseScalar:
    """Extension constant c * X^idx with a single base-field coefficient.

    Multiplying by such a constant needs only `deg` base products
    (coefficient-wise scaling + a rotate/alpha-fold) instead of the
    Karatsuba 3 (deg 2) / 6 (deg 3) — the curve constants b3 = 3*b_twist
    have exactly this shape on both curves (mnt4753: (0, c);
    mnt6753: (c, 0, 0)), mirroring how the reference specializes its
    constant multiplications into addition chains (arith.cu:81-216).
    """
    c: Fel          # base-field constant (Montgomery)
    idx: int        # power of X it multiplies


class ExtOps:
    """Degree-2/3 extension tower over FpOps: elements are tuples of Fel.

    Karatsuba multiplication with the non-residue alpha folded in via
    small-scalar multiplies — the vector mirror of Fp2::mul / Fp3::mul
    (multiexp/arith.cu:426-461, :539-612).
    """

    def __init__(self, base: FpOps, deg: int, alpha: int):
        assert deg in (2, 3)
        self.base = base
        self.deg = deg
        self.alpha = alpha

    # -- constructors --------------------------------------------------------

    def const(self, coeffs: Tuple[int, ...], to_mont: bool = True):
        return tuple(self.base.const(c, to_mont) for c in coeffs)

    def zero(self, batch=(1,)):
        return tuple(self.base.zero(batch) for _ in range(self.deg))

    def one(self, batch=None):
        out = [self.base.one(batch)]
        b = batch if batch is not None else (1,)
        out += [self.base.zero(b) for _ in range(self.deg - 1)]
        return tuple(out)

    # -- arithmetic ----------------------------------------------------------

    def add(self, a, b):
        return tuple(self.base.add(x, y) for x, y in zip(a, b))

    def sub(self, a, b):
        return tuple(self.base.sub(x, y) for x, y in zip(a, b))

    def small(self, a, c: int):
        return tuple(self.base.small(x, c) for x in a)

    def reduce(self, a, k_to: int = 2):
        return tuple(self.base.reduce(x, k_to) for x in a)

    def canonical(self, a):
        return tuple(self.base.canonical(x) for x in a)

    def canon_limbs(self, a):
        return tuple(self.base.canon_limbs(x) for x in a)

    def _scalar_mul_pairs(self, s: BaseScalar, b):
        """Base pairs for (c * X^idx) * b — one per coefficient."""
        return [(s.c, b[j]) for j in range(self.deg)]

    def _scalar_mul_assemble(self, s: BaseScalar, rs):
        F = self.base
        alpha_fold = lambda x: F.reduce(F.small(x, self.alpha), 4)
        out = [None] * self.deg
        for j in range(self.deg):
            pos = (j + s.idx) % self.deg
            out[pos] = alpha_fold(rs[j]) if j + s.idx >= self.deg else rs[j]
        return tuple(out)

    def mul(self, a, b):
        # alpha-folded terms are reduced back to k<=2 so extension-mul
        # output bounds stay small enough for the EC formula add chains.
        F = self.base
        alpha_fold = lambda x: F.reduce(F.small(x, self.alpha), 4)
        if isinstance(a, BaseScalar):
            rs = F.mul_batch(self._scalar_mul_pairs(a, b))
            return self._scalar_mul_assemble(a, rs)
        if self.deg == 2:
            a0, a1 = a
            b0, b1 = b
            t0 = F.mul(a0, b0)
            t1 = F.mul(a1, b1)
            t2 = F.mul(F.add(a0, a1), F.add(b0, b1))     # a0b0+a0b1+a1b0+a1b1
            c0 = F.add(t0, alpha_fold(t1))
            c1 = F.sub(t2, F.add(t0, t1))
            return (c0, c1)
        a0, a1, a2 = a
        b0, b1, b2 = b
        t0 = F.mul(a0, b0)
        t1 = F.mul(a1, b1)
        t2 = F.mul(a2, b2)
        s01 = F.sub(F.mul(F.add(a0, a1), F.add(b0, b1)), F.add(t0, t1))
        s02 = F.sub(F.mul(F.add(a0, a2), F.add(b0, b2)), F.add(t0, t2))
        s12 = F.sub(F.mul(F.add(a1, a2), F.add(b1, b2)), F.add(t1, t2))
        c0 = F.add(t0, alpha_fold(s12))
        c1 = F.add(s01, alpha_fold(t2))
        c2 = F.add(s02, t1)
        return (c0, c1, c2)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_batch(self, pairs) -> list:
        """Independent extension products in ONE base Montgomery multiply.

        Every Karatsuba sub-product of every pair is independent, so a
        deg-2 pair contributes 3 base pairs and a deg-3 pair 6; all are
        stacked into a single FpOps.mul_batch call and reassembled with
        the alpha folds."""
        F = self.base
        alpha_fold = lambda x: F.reduce(F.small(x, self.alpha), 4)
        base_pairs = []
        counts = []
        for a, b in pairs:
            if isinstance(a, BaseScalar):
                base_pairs += self._scalar_mul_pairs(a, b)
                counts.append(self.deg)
            elif self.deg == 2:
                a0, a1 = a
                b0, b1 = b
                base_pairs += [(a0, b0), (a1, b1),
                               (F.add(a0, a1), F.add(b0, b1))]
                counts.append(3)
            else:
                a0, a1, a2 = a
                b0, b1, b2 = b
                base_pairs += [
                    (a0, b0), (a1, b1), (a2, b2),
                    (F.add(a0, a1), F.add(b0, b1)),
                    (F.add(a0, a2), F.add(b0, b2)),
                    (F.add(a1, a2), F.add(b1, b2))]
                counts.append(6)
        rs = F.mul_batch(base_pairs)
        out = []
        off = 0
        for (a, b), cnt in zip(pairs, counts):
            r = rs[off:off + cnt]
            off += cnt
            if isinstance(a, BaseScalar):
                out.append(self._scalar_mul_assemble(a, r))
            elif self.deg == 2:
                t0, t1, t01 = r
                c0 = F.add(t0, alpha_fold(t1))
                c1 = F.sub(t01, F.add(t0, t1))
                out.append((c0, c1))
            else:
                t0, t1, t2, u01, u02, u12 = r
                s01 = F.sub(u01, F.add(t0, t1))
                s02 = F.sub(u02, F.add(t0, t2))
                s12 = F.sub(u12, F.add(t1, t2))
                out.append((
                    F.add(t0, alpha_fold(s12)),
                    F.add(s01, alpha_fold(t2)),
                    F.add(s02, t1)))
        return out

    # -- structure -----------------------------------------------------------

    def select(self, mask, a, b):
        return tuple(self.base.select(mask, x, y) for x, y in zip(a, b))

    def is_zero(self, a):
        m = self.base.is_zero(a[0])
        for x in a[1:]:
            m = m & self.base.is_zero(x)
        return m

    def broadcast(self, a, batch):
        return tuple(self.base.broadcast(x, batch) for x in a)

    def to_arrays(self, a):
        return tuple(x.v for x in a)

    def from_arrays(self, arrs, k: int, lb: int = None):
        if lb is None:
            lb = self.base.canon_lb
        return tuple(Fel(v, k, lb) for v in arrs)


@lru_cache(maxsize=None)
def fp_ops(fp: FieldParams, bits: int = 16) -> FpOps:
    return FpOps(fp, bits)


_FQ_RADIX_SCOPE = None   # trace-time override (see fq_radix_scope)


def fq_radix() -> int:
    """Radix for base-field (coordinate) arithmetic: GROTH16_FQ_RADIX
    (15 or 16).  The scalar field always stays 16 (its limbs double as
    MSM window digits and as the serialized NTT layout).

    Default: **15 on accelerator backends** (the one-fold CIOS measured
    +17.5% G1 MSM throughput on v5e and is sha256-gated end-to-end on
    hardware for both curves — BASELINE.md round 4), 16 on XLA:CPU
    (oracle-parity test runs keep their long-lived radix-16 compile
    caches; the proof bytes are radix-invariant either way).  The env
    knob always wins — GROTH16_FQ_RADIX=16 is the escape hatch."""
    import os
    if _FQ_RADIX_SCOPE is not None:
        return _FQ_RADIX_SCOPE
    env = os.environ.get("GROTH16_FQ_RADIX")
    if env is not None:
        return int(env)
    return 16 if L._cpu_backend() else 15


from contextlib import contextmanager


@contextmanager
def fq_radix_scope(bits: int):
    """Pin the Fq radix for code traced inside the scope (overrides the
    env knob).  Used by ec._get_curve_ops so a CurveOps' constructed
    radix always equals its cache key; the device setup/preprocess tools
    pin 16 through it (their wrappers call _get_curve_ops(.., 16)): they
    serialize the reference's R = 2^768 formats and their kernels are
    offline one-offs where the radix-15 win doesn't matter."""
    global _FQ_RADIX_SCOPE
    prev = _FQ_RADIX_SCOPE
    _FQ_RADIX_SCOPE = bits
    try:
        yield
    finally:
        _FQ_RADIX_SCOPE = prev


def fq_ops(curve: CurveParams) -> FpOps:
    return fp_ops(curve.fq, fq_radix())


def fr_ops(curve: CurveParams) -> FpOps:
    return fp_ops(curve.fr)


@lru_cache(maxsize=None)
def _fqe_ops(curve: CurveParams, bits: int) -> ExtOps:
    return ExtOps(fp_ops(curve.fq, bits), curve.ext_degree,
                  curve.non_residue)


def fqe_ops(curve: CurveParams) -> ExtOps:
    return _fqe_ops(curve, fq_radix())
