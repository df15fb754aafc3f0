"""Host-side Groth16: trusted setup, oracle prover, verification.

The three roles mirror the reference:
  - `setup`     ~ r1cs_gg_ppzksnark_generator (r1cs_gg_ppzksnark.tcc:206-379)
                  restricted to what the challenge pipeline consumes
                  (A/B1/B2/L/H queries; vk kept as trapdoor scalars)
  - `compute_h` ~ the iFFT/cosetFFT witness-map pipeline that both provers
                  inline (libsnark/main.cpp:89-148,
                  cuda_prover_piecewise.cu:14-49; semantics from
                  r1cs_to_qap_witness_map with d1=d2=d3=0)
  - `prove`     ~ the challenge CPU prover (libsnark/main.cpp:172-233):
                  5 MSMs and C = Ht + Lt + r*Bt1 (NO s-randomness,
                  main.cpp:219)
  - `verify_with_trapdoor` replaces the pairing check with the equivalent
    exponent-space equation, using the setup trapdoor (t, alpha, beta,
    delta, generator dlogs) kept from setup.  Bit-exactness of the pipeline
    is separately enforced by sha256 golden-file tests.
"""

import random
from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..curves.constants import CurveParams
from . import ec
from .fft import Radix2Domain
from .msm import batch_exp, get_exp_window_size, msm, window_table
from .r1cs import R1CS, evaluate_lc, generate_r1cs_example_with_field_input


@dataclass
class Trapdoor:
    """Setup toxic waste, retained for verification in tests."""
    t: int
    alpha: int
    beta: int
    delta: int
    g1_dlog: int   # g1 generator = g1_dlog * G1::one  (generator is random,
                   # r1cs_gg_ppzksnark.tcc:290)
    at: List[int]  # QAP evaluations A_i(t), post AB-swap
    bt: List[int]
    ct: List[int]
    zt: int


@dataclass
class SetupResult:
    d: int
    m: int
    A: list        # affine G1, len m+1
    B1: list       # affine G1, len m+1
    B2: list       # affine G2, len m+1
    L: list        # affine G1, len m-1
    H: list        # affine G1, len d
    w: List[int]   # m+1 scalars incl. leading 1
    ca: List[int]  # d+1
    cb: List[int]
    cc: List[int]
    r: int
    trapdoor: Trapdoor


def qap_instance_evaluation(cs: R1CS, domain: Radix2Domain, t: int
                            ) -> Tuple[List[int], List[int], List[int], int]:
    """r1cs_to_qap_instance_map_with_evaluation (r1cs_to_qap.tcc:104-174).

    Returns (At, Bt, Ct, Zt); Ht is implicitly [t^i].
    """
    p = cs.p
    nvar = cs.num_variables
    at = [0] * (nvar + 1)
    bt = [0] * (nvar + 1)
    ct = [0] * (nvar + 1)
    u = domain.evaluate_all_lagrange_polynomials(t)
    # input-consistency rows: At[i] = u[num_constraints + i]
    for i in range(cs.num_inputs + 1):
        at[i] = u[cs.num_constraints + i]
    for i, cons in enumerate(cs.constraints):
        for idx, coeff in cons.a:
            at[idx] = (at[idx] + u[i] * coeff) % p
        for idx, coeff in cons.b:
            bt[idx] = (bt[idx] + u[i] * coeff) % p
        for idx, coeff in cons.c:
            ct[idx] = (ct[idx] + u[i] * coeff) % p
    zt = domain.compute_vanishing_polynomial(t)
    return at, bt, ct, zt


def setup(curve: CurveParams, log2_d: int,
          rng: Optional[random.Random] = None) -> SetupResult:
    """generate_paramaters<ppT> (libsnark/generate_parameters.cpp:23-123).

    Builds the synthetic R1CS, runs the Groth16 generator, and assembles
    exactly the data the params/input files carry.
    """
    rng = rng or random.Random()
    r_mod = curve.fr.p
    d_plus_1 = 1 << log2_d
    d = d_plus_1 - 1

    cs, primary, auxiliary = generate_r1cs_example_with_field_input(
        r_mod, d - 1, 1, rng)
    full_assignment = primary + auxiliary
    m = cs.num_variables
    assert m == d + 1

    # ---- generator (r1cs_gg_ppzksnark.tcc:206-379) ----
    cs.swap_ab_if_beneficial()  # :213
    t = rng.randrange(1, r_mod)
    alpha = rng.randrange(1, r_mod)
    beta = rng.randrange(1, r_mod)
    delta = rng.randrange(1, r_mod)
    delta_inv = pow(delta, -1, r_mod)

    domain = Radix2Domain(curve.fr, cs.num_constraints + cs.num_inputs + 1)
    assert domain.m == d_plus_1
    at, bt, ct, zt = qap_instance_evaluation(cs, domain, t)

    # L query scalars: ((beta*At + alpha*Bt + Ct) * delta^-1) for aux vars
    lt = [
        (beta * at[i] + alpha * bt[i] + ct[i]) * delta_inv % r_mod
        for i in range(cs.num_inputs + 1, m + 1)
    ]
    # H query scalars: t^i * Zt * delta^-1, i = 0..d-1 (Ht resized by 2,
    # r1cs_gg_ppzksnark.tcc:281; qap degree = d+1 so len = d)
    zt_dinv = zt * delta_inv % r_mod
    ht = []
    ti = 1
    for _ in range(d):
        ht.append(ti * zt_dinv % r_mod)
        ti = ti * t % r_mod

    # fixed-base exponentiations (the reference uses a random g1 generator,
    # G2::one for the g-side of B; :290,300)
    g1 = ec.g1_group(curve)
    g2 = ec.g2_group(curve)
    g1_dlog = rng.randrange(1, r_mod)
    g1_gen = g1.mul(g1_dlog, ec.g1_generator(curve))
    g2_gen = ec.g2_generator(curve)

    bits = 753
    w1 = get_exp_window_size(3 * (m + 1))
    tbl1 = window_table(g1, bits, w1, g1_gen)
    w2 = get_exp_window_size(m + 1)
    tbl2 = window_table(g2, bits, w2, g2_gen)

    A_q = batch_exp(g1, bits, w1, tbl1, at)
    B1_q = batch_exp(g1, bits, w1, tbl1, bt)
    B2_q = batch_exp(g2, bits, w2, tbl2, bt)
    L_q = batch_exp(g1, bits, w1, tbl1, lt)
    H_q = batch_exp(g1, bits, w1, tbl1, ht)

    A_aff = g1.batch_to_affine(A_q)
    B1_aff = g1.batch_to_affine(B1_q)
    B2_aff = [g2.to_affine(pt) for pt in B2_q]
    L_aff = g1.batch_to_affine(L_q)
    H_aff = g1.batch_to_affine(H_q)

    # ---- input-side data (generate_parameters.cpp:41-57, 88-107) ----
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

    return SetupResult(
        d=d, m=m, A=A_aff, B1=B1_aff, B2=B2_aff, L=L_aff, H=H_aff,
        w=w, ca=ca, cb=cb, cc=cc, r=r,
        trapdoor=Trapdoor(t, alpha, beta, delta, g1_dlog, at, bt, ct, zt),
    )


def compute_h(curve: CurveParams, d: int, ca: List[int], cb: List[int],
              cc: List[int]) -> List[int]:
    """The H-polynomial pipeline (libsnark/main.cpp:89-148).

    iFFT(ca), iFFT(cb) -> cosetFFT both -> pointwise mul -> iFFT/cosetFFT(cc)
    -> subtract -> divide by Z on coset -> icosetFFT.  Returns d+2
    coefficients (domain->m + 1) of which the prover uses the first d.
    """
    dom = Radix2Domain(curve.fr, d + 1)
    a = dom.coset_fft(dom.ifft(list(ca)))
    b = dom.coset_fft(dom.ifft(list(cb)))
    p = curve.fr.p
    h = [x * y % p for x, y in zip(a, b)]
    c = dom.coset_fft(dom.ifft(list(cc)))
    h = [(x - y) % p for x, y in zip(h, c)]
    h = dom.divide_by_z_on_coset(h)
    h = dom.icoset_fft(h)
    return h + [0]  # coefficients_for_H has m+1 entries (main.cpp:136-143)


def prove(curve: CurveParams, params, inputs, mask_bits: int = None):
    """The challenge prover (libsnark/main.cpp:172-233).

    `params` / `inputs` follow utils.serialization.Groth16Params/Input
    (affine points / standard-domain scalars).  Returns affine
    (A, B2, C).

    `mask_bits` masks every MSM scalar to its low bits before the
    multiexps (h is still computed from the full pipeline first).  The
    masked proof equals a partial-low-window device proof exactly (MSMs
    are linear in scalar bits), which is how the multichip dryrun
    value-checks a W-window run without paying for all 96.
    """
    g1 = ec.g1_group(curve)
    g2 = ec.g2_group(curve)
    primary_input_size = 1

    h_coeffs = compute_h(curve, params.d, inputs.ca, inputs.cb, inputs.cc)
    if mask_bits is not None:
        mask = (1 << mask_bits) - 1
        h_coeffs = [x & mask for x in h_coeffs]
        inputs = type(inputs)(
            w=[x & mask for x in inputs.w], ca=inputs.ca, cb=inputs.cb,
            cc=inputs.cc, r=inputs.r)

    A_pts = [g1.from_affine(xy) if xy[1] else g1.zero for xy in params.A]
    B1_pts = [g1.from_affine(xy) if xy[1] else g1.zero for xy in params.B1]
    B2_pts = [
        g2.from_affine(xy) if not g2.fis_zero(xy[1]) else g2.zero
        for xy in params.B2
    ]
    L_pts = [g1.from_affine(xy) if xy[1] else g1.zero for xy in params.L]
    H_pts = [g1.from_affine(xy) if xy[1] else g1.zero for xy in params.H]

    evaluation_At = msm(g1, inputs.w, A_pts)                       # m+1
    evaluation_Bt1 = msm(g1, inputs.w, B1_pts)                     # m+1
    evaluation_Bt2 = msm(g2, inputs.w, B2_pts)                     # m+1
    evaluation_Ht = msm(g1, h_coeffs[:params.d], H_pts)            # d
    evaluation_Lt = msm(
        g1, inputs.w[primary_input_size + 1:], L_pts)              # m-1

    # C = Ht + Lt + r*Bt1 (main.cpp:219 -- no s-terms)
    C = g1.add(g1.add(evaluation_Ht, evaluation_Lt),
               g1.mul(inputs.r, evaluation_Bt1))

    return (g1.to_affine(evaluation_At),
            g2.to_affine(evaluation_Bt2),
            g1.to_affine(C))


def verify_with_trapdoor(curve: CurveParams, result: "SetupResult",
                         proof_a, proof_b, proof_c) -> bool:
    """Exponent-space Groth16 check using the setup trapdoor.

    Expected values (challenge-simplified prover, no s-randomness):
        A = (sum_i w_i At_i) * g1_gen
        B = (sum_i w_i Bt_i) * G2::one
        C = (H(t) Zt + sum_aux w_i (beta At_i + alpha Bt_i + Ct_i)
             + r sum_i w_i Bt_i) * delta^-1 ... expanded exactly as the
        prover's MSMs assemble it.
    Also checks the QAP divisibility A(t)B(t) - C(t) == H(t) Zt.
    """
    r_mod = curve.fr.p
    td = result.trapdoor
    w = result.w
    m = result.m

    a_s = sum(wi * ai for wi, ai in zip(w, td.at)) % r_mod
    b_s = sum(wi * bi for wi, bi in zip(w, td.bt)) % r_mod
    c_qap = sum(wi * ci for wi, ci in zip(w, td.ct)) % r_mod

    h = compute_h(curve, result.d, result.ca, result.cb, result.cc)
    h_at_t = 0
    ti = 1
    for coeff in h[:result.d]:
        h_at_t = (h_at_t + coeff * ti) % r_mod
        ti = ti * td.t % r_mod
    # QAP: A(t)*B(t) - C(t) must equal H(t)*Z(t).  The prover only uses
    # h[0:d] but the degree-d coefficient of H is 0 for honest witnesses
    # (r1cs_gg_ppzksnark.tcc:395-399), so this is exact.
    if (a_s * b_s - c_qap - h_at_t * td.zt) % r_mod:
        return False

    delta_inv = pow(td.delta, -1, r_mod)
    l_s = sum(
        wi * ((td.beta * ai + td.alpha * bi + ci) % r_mod)
        for wi, ai, bi, ci in zip(w[2:], td.at[2:], td.bt[2:], td.ct[2:])
    ) % r_mod
    c_s = ((h_at_t * td.zt + l_s) * delta_inv + result.r * b_s) % r_mod

    g1 = ec.g1_group(curve)
    g2 = ec.g2_group(curve)
    g1_one = ec.g1_generator(curve)
    g2_one = ec.g2_generator(curve)

    exp_a = g1.to_affine(g1.mul(a_s * td.g1_dlog % r_mod, g1_one))
    exp_b = g2.to_affine(g2.mul(b_s, g2_one))
    exp_c = g1.to_affine(g1.mul(c_s * td.g1_dlog % r_mod, g1_one))
    return (exp_a, exp_b, exp_c) == (proof_a, proof_b, proof_c)
