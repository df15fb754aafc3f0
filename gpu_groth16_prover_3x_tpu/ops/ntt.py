"""Device NTT (finite-field FFT) over Fr and the H-polynomial pipeline.

TPU-native replacement for libfqfft's CPU radix-2 evaluation domain
(depends/libfqfft/libfqfft/evaluation_domain/domains/
basic_radix2_domain.tcc and basic_radix2_domain_aux.tcc:167-203): the
reference runs iFFT/cosetFFT/divide-by-Z on OpenMP threads *overlapped
with the GPU MSMs* (cuda_prover_piecewise.cu:14-49, README.md:77); here
the whole pipeline is device-resident so the prover's polynomial work
rides the same chip as the MSMs with no host round-trip.

Algorithm: radix-2 decimation-in-time expressed as pure reshape/concat
stages — the decimation hierarchy S_l[t, g] = x[t*2^l + g] is *exactly* a
row-major reshape, so descending costs nothing and each ascent stage is
one vectorized butterfly over all n/2 lanes:

    E, O  = child[:, 0, :], child[:, 1, :]       (view (M', 2, 2^l))
    t     = O * w     with  w[k] = omega^(2^l * k)  (strided twiddle slice)
    out   = concat(E + t, E - t)

Natural order in, natural order out — no bit-reversal permutation and no
lane gathers at all (the data movement is folded into reshapes/concats
that XLA lowers to cheap relayouts).  This is the single-chip analog of
the two-stage parallel decomposition at basic_radix2_domain_aux.tcc:216-295
whose multi-chip all_to_all version lives in parallel/ntt.py.

Twiddle/coset tables are host-precomputed uint16 Montgomery limb arrays,
cached per (field, size) — the analog of libff's cached root-of-unity
computations (field_utils.tcc get_root_of_unity).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.constants import FieldParams, get_root_of_unity
from . import limbs as L
from .field import Fel, FpOps  # noqa: F401


# -- host-side table precomputation --------------------------------------------

from .field import fp_ops as _fp_ops  # shared per-field instance cache


@lru_cache(maxsize=None)
def _power_table(p: int, r: int, base: int, count: int) -> np.ndarray:
    """(48, count) uint16 Montgomery limbs of base^i, i = 0..count-1."""
    out = np.empty((L.NUM_LIMBS, count), dtype=np.uint16)
    acc = 1
    for i in range(count):
        out[:, i] = L.int_to_limbs(acc * r % p).astype(np.uint16)
        acc = acc * base % p
    return out


@lru_cache(maxsize=None)
def get_plan(fp: FieldParams, n: int) -> "NttPlan":
    """Cached plan per (field, size) so jit sees one static instance."""
    return NttPlan(fp, n)


class NttPlan:
    """Precomputed tables for one (field, n) forward+inverse NTT pair.

    The big tables (twiddles, coset powers — O(n) limb columns, ~300 MB
    total at n = 2^20) are fed to the jitted transforms as ARGUMENTS,
    never closure constants: a closed-over concrete array is embedded in
    the lowered program as an HLO literal, which bloats every compile
    (and overflows the axon tunnel's remote-compile request limit with
    HTTP 413 at reference-default sizes — seen on the 2^20 gate).
    """

    def __init__(self, fp: FieldParams, n: int):
        assert n & (n - 1) == 0
        self.fp = fp
        self.n = n
        self.F = _fp_ops(fp)
        p, r = fp.p, self.F.ctx.r
        omega = get_root_of_unity(fp, n)
        self.omega = omega
        self.tw_fwd = _power_table(p, r, omega, max(n // 2, 1))
        self.tw_inv = _power_table(p, r, pow(omega, -1, p), max(n // 2, 1))
        self.n_inv = self.F.const(pow(n, -1, p))
        g = fp.multiplicative_generator
        self.coset = _power_table(p, r, g, n)
        self.coset_inv = _power_table(p, r, pow(g, -1, p), n)
        # Z(coset pts) = g^n - 1 (constant on the coset): its inverse
        self.z_coset_inv = self.F.const(pow(pow(g, n, p) - 1, -1, p))
        self._dev_tables = None

    def device_tables(self):
        """(tw_fwd, tw_inv, coset, coset_inv) as device arrays, staged
        once per plan — the argument form of the big tables."""
        if self._dev_tables is None:
            self._dev_tables = tuple(
                jnp.asarray(t) for t in (self.tw_fwd, self.tw_inv,
                                         self.coset, self.coset_inv))
        return self._dev_tables


# -- core transform -------------------------------------------------------------

def _ntt(F: FpOps, x: Fel, tw) -> Fel:
    """In-field DFT: y_k = sum_j x_j omega^(jk); x limbs (48, n)."""
    x = F.canon_limbs(x)
    n = x.v.shape[-1]
    logn = n.bit_length() - 1
    v = x.v.reshape((L.NUM_LIMBS, 1, n))  # (limbs, M=1 ... runs, 2^l groups)
    k = x.k
    for l in range(logn - 1, -1, -1):
        limbs, mp, g2 = v.shape            # child: (48, M', 2^(l+1))
        v = v.reshape(limbs, mp, 2, g2 // 2)
        E, O = v[:, :, 0, :], v[:, :, 1, :]
        w = tw[:, :: (1 << l)][:, :mp]      # (48, M') omega^(2^l * k)
        t = F.mul(Fel(O, k), Fel(w[:, :, None].astype(jnp.uint32), 1))
        Ef = Fel(E, k)
        hi = F.add(Ef, t)
        lo = F.sub(Ef, t)
        hi = F.reduce(hi, 2)
        lo = F.reduce(lo, 2)
        v = jnp.concatenate([hi.v, lo.v], axis=1)  # (48, 2M', 2^l)
        k = 2
    return Fel(v.reshape(L.NUM_LIMBS, n), k)


@partial(jax.jit, static_argnums=(0, 2, 3))
def _ntt_jit(plan: NttPlan, xv, k: int, lb: int, tw):
    # lb rides along as a static arg so a lazy-limbed caller input still
    # triggers _ntt's canon_limbs pass (rebuilding with the default lb
    # would silently feed lazy limbs into the CIOS loop)
    return _ntt(plan.F, Fel(xv, k, lb), tw).v


def ntt(plan: NttPlan, x: Fel) -> Fel:
    tw_fwd = plan.device_tables()[0]
    return Fel(_ntt_jit(plan, x.v, x.k, x.lb, tw_fwd),
               2 if plan.n > 1 else x.k)


def intt(plan: NttPlan, x: Fel) -> Fel:
    tw_inv = plan.device_tables()[1]
    y = Fel(_ntt_jit(plan, x.v, x.k, x.lb, tw_inv),
            2 if plan.n > 1 else x.k)
    return plan.F.mul(y, plan.n_inv)


def coset_fft(plan: NttPlan, x: Fel, coset=None) -> Fel:
    """FFT on the coset g*<omega> (basic_radix2_domain.tcc:84-89)."""
    if coset is None:
        coset = plan.device_tables()[2]
    scaled = plan.F.mul(x, Fel(coset.astype(jnp.uint32), 1))
    return ntt(plan, scaled)


def icoset_fft(plan: NttPlan, x: Fel, coset_inv=None) -> Fel:
    """Inverse coset FFT (basic_radix2_domain.tcc:91-97)."""
    if coset_inv is None:
        coset_inv = plan.device_tables()[3]
    y = intt(plan, x)
    return plan.F.mul(y, Fel(coset_inv.astype(jnp.uint32), 1))


def divide_by_z_on_coset(plan: NttPlan, x: Fel) -> Fel:
    """Multiply by Z(g*omega^i)^-1 = (g^n - 1)^-1, constant on the coset
    (basic_radix2_domain.tcc:126-134)."""
    return plan.F.mul(x, plan.z_coset_inv)


# -- the H-polynomial pipeline ----------------------------------------------------

@partial(jax.jit, static_argnums=(0,))
def _compute_h_jit(plan: NttPlan, ca, cb, cc, tw_fwd, tw_inv, coset,
                   coset_inv):
    """The traced H pipeline; the O(n) tables arrive as arguments (see
    NttPlan.device_tables — embedding them as HLO literals overflows the
    compile request at 2^20)."""
    F = plan.F

    def fwd(x: Fel) -> Fel:
        scaled = F.mul(x, Fel(coset.astype(jnp.uint32), 1))
        return Fel(_ntt(F, scaled, tw_fwd).v, 2)

    def inv(x: Fel) -> Fel:
        y = Fel(_ntt(F, x, tw_inv).v, 2)
        return F.mul(y, plan.n_inv)

    a = fwd(inv(Fel(ca, 1)))
    b = fwd(inv(Fel(cb, 1)))
    h = F.mul(a, b)
    c = fwd(inv(Fel(cc, 1)))
    h = F.sub(h, c)
    h = divide_by_z_on_coset(plan, h)
    h = F.mul(inv(h), Fel(coset_inv.astype(jnp.uint32), 1))
    h = F.reduce(h, 2)
    # standard-domain digits for the H MSM: x * R^-1 via mont_mul(x, 1),
    # then one conditional subtract so digits are canonical (< p) like
    # the reference's from_monty (fp.tcc) — mont_mul alone can leave a
    # value in [p, 2p)
    one_std = jnp.zeros((L.NUM_LIMBS, 1), jnp.uint32).at[0, 0].set(1)
    h_std = L.cond_sub_kp(F.ctx, F.mul(h, Fel(one_std, 1)).v, 1)
    return h.v, h_std


def compute_h_device(plan: NttPlan, ca, cb, cc):
    """The witness-map H pipeline, entirely on device.

    Semantics of compute_H (libsnark/main.cpp:89-148 /
    cuda_prover_piecewise.cu:14-49): iFFT -> cosetFFT on a and b,
    pointwise H = a*b - cosetFFT(iFFT(c)), divide by Z on the coset,
    icosetFFT.  Inputs/outputs: (48, n) uint32 Montgomery limbs.

    Returns (h_mont, h_std): Montgomery coefficients and standard-domain
    digit limbs (the MSM keys), both (48, n).
    """
    return _compute_h_jit(plan, ca, cb, cc, *plan.device_tables())
