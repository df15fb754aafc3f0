"""Device (TPU) 753-bit limb arithmetic: the vector analog of the
reference's device bignum stack (multiexp/primitives.cu, fixnum.cu,
arith.cu L0-L2 in SURVEY.md).

TPU-native design — NOT a port of the CUDA code:

  * The GPU spreads one 768-bit integer over a 16-thread tile, one 64-bit
    limb per lane, with hardware carry flags and warp shuffles
    (multiexp/fixnum.cu:14-17, arith.cu:289-337).  TPUs have neither carry
    flags nor a 64x64 multiplier, so here one element is a column of
    **48 x 16-bit limbs stored in uint32 lanes**, shape ``(48, *batch)``:
    limbs ride the sublane axis, the batch rides the 128-wide lane axis,
    so every limb op is a fully dense VPU op over the batch.

  * 16-bit limb products fit exactly in uint32 (no widening multiply
    needed); carries are **lazy**: accumulator limbs grow toward 2^32 and
    are folded down by cheap local passes, with a final Kogge-Stone
    (log-depth prefix) pass producing exact 16-bit limbs.  This replaces
    the warp-ballot carry resolution of fixnum.cu:185-197.

  * Montgomery radix R = 2^768 = (2^16)^48 — exactly the radix of the
    reference's serialized format (libsnark/serialization.hpp:22-32), so
    file limbs map to device limbs by pure bit-rechunking and the whole
    prover pipeline stays in the Montgomery domain end to end.

Values are kept in **loose Montgomery form**: canonical 16-bit limbs, but
the value may exceed p (bound tracked statically in units of p by the
field layer, ops/field.py).  mont_mul tolerates inputs up to ~2^13 * p
because ab < R*p suffices for the reduction bound.

**15-bit radix option (Fq)**: a MontCtx built with bits=15 uses 52 x
15-bit limbs (R = 2^780).  Two 15-bit limb products plus the running
accumulator fit a uint32, so each CIOS iteration needs ONE carry fold
(fused with the limb shift-down) instead of two — ~1/3 fewer vector ops
on the multiply-dominated MSM path — at the cost of 52 iterations
instead of 48 and a Montgomery-domain conversion (R -> R') at the
serialization boundary (the file format stays the reference's 16-bit
R = 2^768 layout, libsnark/serialization.hpp:22-32).  The scalar field
(Fr: NTT, digit extraction) always stays at bits=16.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import opcount

LIMB_BITS = 16
NUM_LIMBS = 48          # 48 * 16 = 768 bits (the scalar/serialization radix)
MASK = jnp.uint32(0xFFFF)
U32 = jnp.uint32


def limb_count(bits: int) -> int:
    """Limbs needed to cover 768 payload bits at the given radix
    (48 @ bits=16, 52 @ bits=15 -> R = 2^780)."""
    return -(-768 // bits)


# -- host-side limb (de)composition ------------------------------------------

def int_to_limbs(x: int, n: int = NUM_LIMBS, bits: int = LIMB_BITS
                 ) -> np.ndarray:
    """Python int -> (n,) uint32 array of `bits`-bit limbs, little-endian."""
    assert 0 <= x < (1 << (bits * n))
    m = (1 << bits) - 1
    return np.array([(x >> (bits * i)) & m for i in range(n)],
                    dtype=np.uint32)

def limbs_to_int(v, bits: int = LIMB_BITS) -> int:
    """(n, ...) limb array (one element; trailing dims squeezed) -> int."""
    arr = np.asarray(v).reshape(np.asarray(v).shape[0], -1)
    assert arr.shape[1] == 1, "limbs_to_int takes a single element"
    return sum(int(d) << (bits * i) for i, d in enumerate(arr[:, 0]))


# -- carry resolution ---------------------------------------------------------

def _shift_up(x, s: int):
    """Limb-axis shift toward higher significance: out[j] = x[j-s]."""
    pad = jnp.zeros((s,) + x.shape[1:], x.dtype)
    return jnp.concatenate([pad, x[:-s]], axis=0)


def lazy_pass(t, bits: int = LIMB_BITS):
    """One local carry fold: t[j] := (t[j] & mask) + (t[j-1] >> bits).

    Any limbs < 2^32 become < 2^bits + 2^(32-bits).  The top limb's
    carry-out moves into the limb above, so callers must size their
    buffers with headroom.
    """
    m = MASK if bits == LIMB_BITS else jnp.uint32((1 << bits) - 1)
    return (t & m) + _shift_up(t >> bits, 1)


def canon(t, bits: int = LIMB_BITS):
    """Exact canonicalization: lazy limbs (< 2^32) -> exact `bits`-bit limbs.

    Local passes bring limbs under 2^(bits+1) (one pass at bits=16, two
    at bits<16), then a Kogge-Stone generate/propagate prefix (log-depth
    doubling steps) resolves the remaining 0/1 carry ripple exactly — the
    TPU analog of fixnum.cu:185-197's ballot trick, with no cross-lane
    traffic at all.

    The carry out of the top limb is ALWAYS discarded (arithmetic mod
    2^(bits*n)): complement-based subtraction relies on the truncation;
    every other caller guarantees the value fits its buffer.
    """
    m = MASK if bits == LIMB_BITS else jnp.uint32((1 << bits) - 1)
    v = lazy_pass(t, bits)         # limbs < 2^bits + 2^(32-bits)
    if bits < LIMB_BITS:
        # second pass: limbs < 2^bits + 2^(32-2*bits) so generate is 0/1
        v = lazy_pass(v, bits)
    lo = v & m
    g = v >> bits                  # generate: 0 or 1
    p = (lo == m).astype(U32)      # propagate
    s = 1
    while s < v.shape[0]:
        g = g | (p & _shift_up(g, s))
        p = p & _shift_up(p, s)
        s *= 2
    carry_in = _shift_up(g, 1)
    return (lo + carry_in) & m


# -- Montgomery context -------------------------------------------------------

class MontCtx:
    """Per-prime device constants for loose-Montgomery limb arithmetic.

    The reference keeps the analogous data in CUDA __constant__ memory
    (multiexp/arith.cu:5-77: MOD_Q/MOD_R, ninv_mod, R^2); here they are
    small host numpy arrays closed over by jitted functions.
    """

    def __init__(self, p: int, bits: int = LIMB_BITS):
        assert bits in (15, 16)
        self.bits = bits
        self.n = limb_count(bits)            # 48 @ 16, 52 @ 15
        n, full = self.n, bits * limb_count(bits)
        self.full_bits = full                # 768 @ 16, 780 @ 15
        self.mask = (1 << bits) - 1
        assert p.bit_length() <= full - 8
        self.p = p
        self.ninv = (-pow(p, -1, 1 << bits)) % (1 << bits)
        self.ninv_full = (-pow(p, -1, 1 << full)) % (1 << full)
        self.r = (1 << full) % p
        self.r2 = (self.r * self.r) % p
        # (n+2,1) zero-padded modulus for the CIOS accumulator
        self.p_limbs_acc = np.concatenate(
            [int_to_limbs(p, n, bits), np.zeros(2, np.uint32)])[:, None]
        self.one_mont = int_to_limbs(self.r, n, bits)[:, None]
        self.r2_limbs = int_to_limbs(self.r2, n, bits)[:, None]
        self._kp_cache = {}

    # radix-16 aliases (historical names used by older call sites/tests)
    @property
    def ninv16(self):
        assert self.bits == 16
        return self.ninv

    @property
    def ninv768(self):
        assert self.bits == 16
        return self.ninv_full

    @property
    def p_limbs50(self):
        assert self.bits == 16
        return self.p_limbs_acc

    def kp_limbs(self, k: int, n: int = None) -> np.ndarray:
        """(n,1) canonical limbs of k*p (subtraction offsets)."""
        n = self.n if n is None else n
        key = (k, n)
        if key not in self._kp_cache:
            v = k * self.p
            assert v < (1 << (self.bits * n))
            self._kp_cache[key] = int_to_limbs(v, n, self.bits)[:, None]
        return self._kp_cache[key]

    def sub_const(self, k: int, c: int) -> np.ndarray:
        """(n,1) limbs of (k*p - c*U) mod 2^full, U = sum_j 2^(bits*j).

        Lazy-operand subtraction: for b with limbs <= c,
           a - b + k*p  ==  a + (c - b_limbs) + sub_const(k, c)  (mod 2^full)
        because sum_j (c - b_j) 2^(bits*j) = c*U - b.  The mod-2^full wrap
        is dropped exactly by canonicalization (result in [0, 2^full) by
        the callers' value bounds), so NO carry resolution is needed.
        """
        key = ("subc", k, c)
        if key not in self._kp_cache:
            u = ((1 << self.full_bits) - 1) // self.mask
            v = (k * self.p - c * u) % (1 << self.full_bits)
            self._kp_cache[key] = int_to_limbs(v, self.n, self.bits)[:, None]
        return self._kp_cache[key]


# -- core ops (all take/return canonical 16-bit limbs, shape (48, *batch)) ----

def _cpu_backend() -> bool:
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return False


_HOSTCALL_SCOPE = None  # tri-state trace-time override (see hostcall_scope)
_KERNEL_MUL = False     # True while tracing INSIDE a Pallas kernel body


from contextlib import contextmanager


@contextmanager
def kernel_mul_scope():
    """Mark code as tracing inside a Pallas kernel body.

    mont_mul then uses the plain unrolled CIOS (`_mont_mul_unrolled`) —
    a nested pallas_call cannot be emitted from within a kernel, and
    Mosaic keeps the straight-line tensor ops register/VMEM-resident,
    which is the whole point of the fused group kernels
    (ops/pallas_group.py).  Also read by the group-kernel dispatch to
    prevent recursive kernel-in-kernel dispatch."""
    global _KERNEL_MUL
    prev = _KERNEL_MUL
    _KERNEL_MUL = True
    try:
        yield
    finally:
        _KERNEL_MUL = prev


def in_kernel_mul() -> bool:
    return _KERNEL_MUL


@contextmanager
def hostcall_scope(on):
    """Force hostcall-mult on/off for code traced inside the scope.

    The multichip dryrun uses callbacks ONLY for the NTT phases (their
    compile is the pathology; their callback/collective interleaving is
    benign) and real XLA kernels for the MSM phases (callbacks inside
    the deep scan/while bodies convoy on the GIL under multi-partition
    CPU execution).  `on=None` restores the env-based default.
    """
    global _HOSTCALL_SCOPE
    prev = _HOSTCALL_SCOPE
    _HOSTCALL_SCOPE = on
    try:
        yield
    finally:
        _HOSTCALL_SCOPE = prev


def _hostcall_mult() -> bool:
    """Dryrun-only mode: route mont_mul through an exact host callback.

    XLA:CPU spends seconds of optimization-pass time on every inlined
    48-iteration CIOS scan instance (a tiny distributed prove step costs
    >15 min of cold compile); with this flag the innermost multiply
    becomes a jax.pure_callback while ALL surrounding structure — mesh,
    shard_map collectives, scans, scatters, EC formulas, digit plumbing —
    still compiles and executes as the real jitted program.  The callback
    computes the *identical* integer REDC result (t = (ab + m*p)/R with
    m = -ab*p^-1 mod R is algorithm-independent), so proofs stay
    bit-exact against the oracle.  Only honored on the CPU backend;
    never on TPU.
    """
    import os
    if _HOSTCALL_SCOPE is not None:
        return _HOSTCALL_SCOPE and _cpu_backend()
    return bool(os.environ.get("GROTH16_HOSTCALL_MULT")) and _cpu_backend()


def _np_mont_mul(p: int, ninv768: int, a: np.ndarray, b: np.ndarray
                 ) -> np.ndarray:
    """Exact host REDC on (48, B) canonical u32 limb arrays.

    Limb<->int conversion rides int.from_bytes/to_bytes (C-speed); the
    768-bit arithmetic is CPython bigints.  Produces the identical
    integer the device CIOS produces: t = (ab + m*p) >> 768 with
    m = -ab*p^-1 mod 2^768.
    """
    shape = a.shape
    a2 = np.ascontiguousarray(a.reshape(NUM_LIMBS, -1).T).astype("<u2")
    b2 = np.ascontiguousarray(b.reshape(NUM_LIMBS, -1).T).astype("<u2")
    n = a2.shape[0]
    ab_bytes = a2.tobytes()
    bb_bytes = b2.tobytes()
    mask = (1 << 768) - 1
    out = bytearray(n * 96)
    for i in range(n):
        ai = int.from_bytes(ab_bytes[i * 96:(i + 1) * 96], "little")
        bi = int.from_bytes(bb_bytes[i * 96:(i + 1) * 96], "little")
        ab = ai * bi
        m = (ab * ninv768) & mask
        t = (ab + m * p) >> 768
        out[i * 96:(i + 1) * 96] = t.to_bytes(96, "little")
    res = np.frombuffer(bytes(out), dtype="<u2").reshape(n, NUM_LIMBS)
    return np.ascontiguousarray(res.T).astype(np.uint32).reshape(shape)


def _mont_mul_hostcall(ctx: MontCtx, a, b):
    from functools import partial as _partial
    fn = _partial(_np_mont_mul, ctx.p, ctx.ninv768)
    out = jax.pure_callback(
        fn, jax.ShapeDtypeStruct(a.shape, jnp.uint32), a, b,
        vmap_method="broadcast_all")
    # callback results carry no shard_map varying-axis tags; re-derive
    # them from the operands so loop carries type-check (the same trick
    # _mont_mul_xla's zero-carry uses)
    return out + a * jnp.uint32(0) + b * jnp.uint32(0)


def mont_mul(ctx: MontCtx, a, b):
    """Montgomery product dispatch: Pallas kernel on TPU, XLA scan
    elsewhere (ops/pallas_kernels.py holds the VMEM-resident version).

    CPU backend: the inline scan form compiles ~0.03s per call site on
    XLA:CPU vs ~1s for the unrolled non-inline variant (CallInliner
    re-inlines the call, so the jit boundary dedupes nothing), so scan
    is the default; GROTH16_CPU_UNROLL_MULT opts small few-site graphs
    (the multichip dryrun) into the unrolled form where thunk dispatch
    dominates runtime.  The truly compile-pathological CPU graphs (NTT
    cascades) use the hostcall path instead (see _hostcall_mult).
    """
    from . import pallas_kernels as PK
    if opcount.enabled():
        lanes = 1
        for d in jnp.broadcast_shapes(a.shape[1:], b.shape[1:]):
            lanes *= int(d)
        opcount.add("fp_mont_mul", lanes)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (ctx.n,) + batch)
    b = jnp.broadcast_to(b, (ctx.n,) + batch)
    if _KERNEL_MUL:
        return _mont_mul_unrolled(ctx, a, b)
    if PK.pallas_available(ctx.bits):
        return PK.mont_mul_pallas(ctx, a, b)
    if _cpu_backend():
        if _hostcall_mult() and ctx.bits == 16:
            # the 15-bit radix has no hostcall form (the byte-view limb
            # (de)composition needs byte-aligned radixes); Fr — the only
            # field the dryrun routes through callbacks — is always 16
            return _mont_mul_hostcall(ctx, a, b)
        import os
        if os.environ.get("GROTH16_CPU_UNROLL_MULT"):
            # measured ~1s of XLA:CPU compile PER CALL SITE (the jit
            # boundary does NOT dedupe — CallInliner re-inlines), so
            # this pays off only for small few-site graphs where thunk
            # dispatch dominates runtime (the multichip dryrun's MSM
            # phases); large compositions (a full G2 MSM kernel) blow
            # past 30 min / 10 GB of compile with it.
            return _mont_mul_xla_call(ctx, a, b)
        return _mont_mul_xla_dyn(ctx, a, b)
    return _mont_mul_xla(ctx, a, b)


def _cios_step16(ctx: MontCtx, t, ai, bpad, p_acc, ninv, mask, batch):
    """One 16-bit CIOS iteration: two lazy folds (a 16-bit product fills
    uint32 exactly, so carries must fold after every product add)."""
    t = t + ai * bpad                    # limbs <= 2^32 - 1 exactly
    t = lazy_pass(t)                     # limbs < 2^17
    m = (t[:1] * ninv) & mask            # (1, batch)
    t = t + m * p_acc
    t = lazy_pass(t)
    # low limb is now 0 mod 2^16 and was fully folded: shift down
    return jnp.concatenate([t[1:], jnp.zeros((1,) + batch, U32)], axis=0)


def _cios_step15(ctx: MontCtx, t, ai, bpad, p_acc, ninv, mask, batch):
    """One 15-bit CIOS iteration: ONE fused fold+shift.

    Two 15-bit limb products (< 2^30 each) plus the running lazy limbs
    (< 2^15 + 2^17) stay under 2^32, so the carry fold happens once per
    iteration, fused with the limb shift-down:
        out[j] = (t[j+1] & mask) + (t[j] >> 15)
    (the carry term needs no limb-axis shift at all — it aligns with the
    shifted-down limb naturally).  m is exact because the uint32 wrap of
    t[0]*ninv preserves the low 15 bits.
    """
    t = t + ai * bpad
    m = (t[:1] * ninv) & mask
    t = t + m * p_acc
    return (jnp.concatenate([t[1:], jnp.zeros((1,) + batch, U32)], axis=0)
            & mask) + (t >> 15)


def _cios_consts(ctx: MontCtx, batch):
    p_acc = jnp.asarray(ctx.p_limbs_acc).reshape(
        (ctx.n + 2,) + (1,) * len(batch))
    return (p_acc, jnp.uint32(ctx.ninv), jnp.uint32(ctx.mask),
            _cios_step16 if ctx.bits == 16 else _cios_step15)


@partial(jax.jit, static_argnums=(0,), inline=True)
def _mont_mul_xla_dyn(ctx: MontCtx, a, b):
    """CIOS with an OPAQUE trip count for the CPU backend.

    XLA:CPU's while-loop unroller sees lax.scan's constant 48-iteration
    bound and fully unrolls every CIOS instance; in a composed kernel
    (an MSM with ~40 multiply sites on 10^5-lane tensors) that explodes
    the optimized module to ~750k lines / >10 GB of compiler RSS and
    >30 min of compile (observed on the MNT6753 G2 kernel).  Deriving
    the bound from an operand (n + a[0,0]*0) makes the trip count
    unprovable, so the loop survives optimization intact.  Compute is
    identical to _mont_mul_xla's scan step.
    """
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (ctx.n,) + batch)
    b = jnp.broadcast_to(b, (ctx.n,) + batch)
    bpad = jnp.concatenate([b, jnp.zeros((2,) + batch, U32)], axis=0)
    p_acc, ninv, mask, step = _cios_consts(ctx, batch)
    # opaque loop bound: value is always ctx.n, provenance is data.
    # a*0 would be constant-folded by XLA's simplifier; a00 >> 31 is
    # unfoldable without range analysis, and every limb representation
    # in this module is < 2^18 (lazy) or < 2^16 (canonical), so bit 31
    # is always clear and the bound is exactly ctx.n.
    nlimb = jnp.uint32(ctx.n) + (a[(0,) * a.ndim] >> jnp.uint32(31))

    def body(st):
        i, t = st
        ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=0)
        t = step(ctx, t, ai, bpad, p_acc, ninv, mask, batch)
        return i + jnp.uint32(1), t

    t0 = bpad * jnp.uint32(0) + a[0:1] * jnp.uint32(0)
    _, t = jax.lax.while_loop(lambda st: st[0] < nlimb, body,
                              (jnp.uint32(0), t0))
    return canon(t, ctx.bits)[:ctx.n]


def _mont_mul_unrolled(ctx: MontCtx, a, b):
    """Plain (undecorated) unrolled CIOS on broadcast-matched operands.

    Used directly inside Pallas kernel bodies (kernel_mul_scope) where
    a jit boundary or nested pallas_call is unavailable, and wrapped by
    `_mont_mul_xla_call` for the CPU dryrun path.  Limb-exact with every
    other mont_mul implementation (the canonical REDC result is unique).
    """
    batch = a.shape[1:]
    bpad = jnp.concatenate([b, jnp.zeros((2,) + batch, U32)], axis=0)
    p_acc, ninv, mask, step = _cios_consts(ctx, batch)
    t = jnp.zeros((ctx.n + 2,) + batch, U32)
    for i in range(ctx.n):
        t = step(ctx, t, a[i:i + 1], bpad, p_acc, ninv, mask, batch)
    return canon(t, ctx.bits)[:ctx.n]


@partial(jax.jit, static_argnums=(0,))
def _mont_mul_xla_call(ctx: MontCtx, a, b):
    """Non-inline, UNROLLED CIOS for the CPU backend (see mont_mul).

    The scan form costs XLA:CPU ~15 thunk dispatches per iteration x 48
    iterations per multiply — with 8 virtual partitions contending on
    few cores that dispatch overhead dominates tiny-shape runs (the
    multichip dryrun).  Unrolled straight-line code fuses into a handful
    of thunks per multiply; the one-off compile (~9s/shape) is shared
    across all same-shape call sites by this jit boundary.
    """
    return _mont_mul_unrolled(ctx, a, b)


@partial(jax.jit, static_argnums=(0,), inline=True)
def _mont_mul_xla(ctx: MontCtx, a, b):
    """CIOS Montgomery product a*b*R^-1 mod-ish p (result < p + ab/R < 2p
    whenever a*b < R*p; exact equality as integers mod p).

    The loop mirrors the mathematical spec of the reference's Fp::mul
    (multiexp/arith.cu:289-337) at radix 2^bits with lazy carries:
      per iteration, add a_i * b, derive m from the low limb, add m * p,
      fold carries and shift the accumulator down one limb (once fused
      at bits=15, twice separately at bits=16 — see _cios_step15/16).
    All per-iteration vector ops act on the full (n+2, batch) block.
    """
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (ctx.n,) + batch)
    b = jnp.broadcast_to(b, (ctx.n,) + batch)
    bpad = jnp.concatenate([b, jnp.zeros((2,) + batch, U32)], axis=0)
    p_acc, ninv, mask, cstep = _cios_consts(ctx, batch)

    def step(t, ai):
        return cstep(ctx, t, ai, bpad, p_acc, ninv, mask, batch), None

    # derive the zero carry from BOTH operands so its varying axes under
    # shard_map match the loop body outputs (scan-vma rule) even when one
    # operand is a replicated closure constant (e.g. twiddle tables)
    t0 = bpad * jnp.uint32(0) + a[0:1] * jnp.uint32(0)
    t, _ = jax.lax.scan(step, t0, a.reshape((ctx.n, 1) + batch))
    return canon(t, ctx.bits)[:ctx.n]


def mont_sqr(ctx: MontCtx, a):
    return mont_mul(ctx, a, a)


def add(a, b, bits: int = LIMB_BITS):
    """Lazy sum -> canonical limbs.  Value bound is the callers' concern."""
    return canon(a + b, bits)


def sub(ctx: MontCtx, a, b, k_b: int):
    """a - b + k_b*p (so the result is nonnegative when b < k_b*p).

    Complement trick: a + (~b) + 1 + k_b*p computed mod 2^full — the
    guaranteed 2^full overflow is dropped by canon's mod-2^full
    truncation.  The +1 is folded into the static kp constant (kp[0] is
    a `bits`-bit value in a u32 lane, so +1 cannot overflow): a
    scatter-add (`.at[0].add(1)`) has no Mosaic lowering inside fused
    Pallas kernels and costs a real scatter on the XLA path.
    """
    kp1 = np.array(ctx.kp_limbs(k_b), dtype=np.uint32)
    kp1[0] += 1
    kp = jnp.asarray(kp1).reshape((ctx.n,) + (1,) * (a.ndim - 1))
    s = a + (jnp.uint32(ctx.mask) - b) + kp
    return canon(s, ctx.bits)


def small_mul(a, c: int, bits: int = LIMB_BITS):
    """a * c for small static c (c <= 2^12): lazy limb scaling + canon.

    The analog of the reference's compile-time mul_<n> addition chains
    (multiexp/arith.cu:81-216) — on the VPU a plain vector multiply is
    one op, so no chains are needed.
    """
    assert 0 < c < (1 << 12)
    return canon(a * jnp.uint32(c), bits)


def cond_sub_kp(ctx: MontCtx, x, k: int):
    """x - k*p if x >= k*p else x (one compare-subtract pass).

    The complement's +1 rides the static (mask - kp) constant — see sub()
    for why (`.at[0].add` is a scatter with no Mosaic lowering).
    """
    batch = x.shape[1:]
    n = ctx.n
    neg1 = np.uint32(ctx.mask) - np.array(ctx.kp_limbs(k), dtype=np.uint32)
    neg1[0] += 1
    neg = jnp.asarray(neg1).reshape((n,) + (1,) * len(batch))
    s = jnp.concatenate([x + neg, jnp.zeros((1,) + batch, U32)], 0)
    s = canon(s, ctx.bits)            # n+1 limbs; limb n == 1 iff x >= k*p
    ge = s[n:n + 1] > 0
    return jnp.where(ge, s[:n], x)


def reduce_bound(ctx: MontCtx, x, k_from: int, k_to: int = 2):
    """Bring a value < k_from*p under k_to*p by halving compare-subtracts.

    Each pass subtracts ceil(k/2)*p when possible, so the bound halves:
    new bound = max(ceil(k/2), k - ceil(k/2)) = ceil(k/2).
    """
    k = k_from
    while k > k_to:
        step = (k + 1) // 2
        x = cond_sub_kp(ctx, x, step)
        k = step
    return x


def to_canonical(ctx: MontCtx, x, k_from: int):
    """Fully reduce below p (for final outputs / equality tests).

    Accepts lazy limbs; first pass canonicalizes the limb form, then
    compare-subtract passes reduce the value below p."""
    x = canon(x, ctx.bits)
    x = reduce_bound(ctx, x, k_from, 2) if k_from > 2 else x
    x = cond_sub_kp(ctx, x, 1)
    return canon(x, ctx.bits)


def select(mask, a, b):
    """Elementwise select on (..., batch) masks broadcast over limbs.

    mask: boolean with shape broadcastable to a/b's batch dims (i.e. a
    leading length-1 limb axis).
    """
    return jnp.where(mask, a, b)


def is_zero(x):
    """Exact zero test for canonical limbs, shape (1, *batch) bool."""
    return jnp.all(x == 0, axis=0, keepdims=True)
