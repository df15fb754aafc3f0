"""Reference-compatible binary serialization.

Implements the exact file format of the reference
(libsnark/serialization.hpp):
  - field elements: 12 x u64 little-endian limbs of the Montgomery
    representation x*R mod p, R = 2^768 (:22-32)
  - G1 points: affine (x, y); the zero point is encoded as x=y=0 and
    recognized on read by y == 0 (:44-54, 84-91)
  - G2 points: affine (x, y) with each coordinate an extension element
    written constant-coefficient first (:35-41, 56-67)
  - size_t: 8-byte little-endian (:113-121)

Three files make up the pipeline contract (layouts below cite the writer):
  params: d, m, A[m+1], B1[m+1], B2[m+1], L[m-1], H[d]
          (libsnark/generate_parameters.cpp:60-85)
  input:  w[m+1] (leading 1), ca[d+1], cb[d+1], cc[d+1], r
          (generate_parameters.cpp:88-107)
  output: A (G1), B (G2), C (G1)   (libsnark/main.cpp:79-85)
"""

import io
import struct
from dataclasses import dataclass
from typing import BinaryIO, List, Sequence, Tuple

import numpy as np

from ..curves.constants import R, CurveParams

FQ_BYTES = 96  # 12 limbs x 8 bytes


# -- scalar-level helpers -----------------------------------------------------

def write_size_t(f: BinaryIO, n: int) -> None:
    f.write(struct.pack("<Q", n))


def _read_exact(f: BinaryIO, n: int) -> bytes:
    """Fail fast on short reads, like the reference's abort() on fread
    mismatch (multiexp/reduce.cu:203-205, prover_reference_functions.cpp
    header checks)."""
    b = f.read(n)
    if len(b) != n:
        raise EOFError(f"short read: wanted {n} bytes, got {len(b)}")
    return b


def check_trailing(f: BinaryIO, what: str) -> None:
    """Diagnose bytes past the expected payload (parity with the
    reference's check_trailing, cuda_prover_piecewise.cu:73-80): a
    trailing byte means the reader's size math and the writer's disagree,
    which would otherwise surface as a confusing wrong-proof later."""
    import sys
    if f.read(1):
        print(f"gpu_groth16_prover_3x_tpu: WARNING: trailing bytes in "
              f"{what} after the expected payload", file=sys.stderr,
              flush=True)


def read_size_t(f: BinaryIO) -> int:
    return struct.unpack("<Q", _read_exact(f, 8))[0]


def fq_to_bytes(x: int, p: int) -> bytes:
    """Standard-domain value -> Montgomery limb dump."""
    return ((x * R) % p).to_bytes(FQ_BYTES, "little")


def fq_from_bytes(b: bytes, p: int) -> int:
    """Montgomery limb dump -> standard-domain value."""
    return int.from_bytes(b, "little") * pow(R, -1, p) % p


def write_fq(f: BinaryIO, x: int, p: int) -> None:
    f.write(fq_to_bytes(x, p))


def read_fq(f: BinaryIO, p: int) -> int:
    return fq_from_bytes(_read_exact(f, FQ_BYTES), p)


def write_fqe(f: BinaryIO, x: Tuple[int, ...], p: int) -> None:
    for c in x:
        write_fq(f, c, p)


def read_fqe(f: BinaryIO, p: int, deg: int) -> Tuple[int, ...]:
    return tuple(read_fq(f, p) for _ in range(deg))


def write_g1(f: BinaryIO, xy: Tuple[int, int], p: int) -> None:
    """`xy` is affine with zero encoded as (0, 0) (Group.to_affine)."""
    write_fq(f, xy[0], p)
    write_fq(f, xy[1], p)


def read_g1_affine(f: BinaryIO, p: int) -> Tuple[int, int]:
    x = read_fq(f, p)
    y = read_fq(f, p)
    return (x, y)  # y == 0 means the zero point (serialization.hpp:87)


def write_g2(f: BinaryIO, xy, p: int) -> None:
    write_fqe(f, xy[0], p)
    write_fqe(f, xy[1], p)


def read_g2_affine(f: BinaryIO, p: int, deg: int):
    x = read_fqe(f, p, deg)
    y = read_fqe(f, p, deg)
    return (x, y)


# -- bulk numpy-level helpers (device-feed path) ------------------------------
#
# The TPU prover keeps elements in the Montgomery domain end to end, so bulk
# reads are raw limb loads with *no* modular math: file u64 limbs are only
# repacked to the device's 16-bit-limb layout (a pure bitcast).

def read_raw_u64(f: BinaryIO, count: int) -> np.ndarray:
    """Read `count` field elements as raw Montgomery limbs, shape (count, 12)."""
    arr = np.fromfile(f, dtype="<u8", count=count * 12)
    if arr.size != count * 12:
        raise EOFError("short read")
    return arr.reshape(count, 12)


def u64_to_u16x48(limbs: np.ndarray) -> np.ndarray:
    """(..., 12) u64 -> (..., 48) uint32 holding 16-bit limbs (bitcast)."""
    u16 = limbs.astype("<u8").view("<u2").reshape(*limbs.shape[:-1], 48)
    return u16.astype(np.uint32)


def u16x48_to_u15x52(arr: np.ndarray) -> np.ndarray:
    """(..., 48) 16-bit limbs -> (..., 52) 15-bit limbs, same integer
    value (pure bit regrouping, vectorized).  The radix-15 device path
    (ops/limbs.py bits=15) loads the reference's R = 2^768 file limbs
    through this before the Montgomery-domain shift R -> R' = 2^780."""
    a = np.asarray(arr).astype(np.uint32)
    outs = []
    for j in range(52):
        bitpos = 15 * j
        k, s = bitpos >> 4, bitpos & 15
        lo = a[..., k] >> s
        hi = (a[..., k + 1] << (16 - s)) if (s and k + 1 < 48) else 0
        outs.append((lo | hi) & 0x7FFF)
    return np.stack(outs, axis=-1)


def u16x48_to_u64(limbs16: np.ndarray) -> np.ndarray:
    """(..., 48) 16-bit limbs (any int dtype) -> (..., 12) u64 (bitcast)."""
    u16 = np.ascontiguousarray(limbs16.astype("<u2"))
    return u16.view("<u8").reshape(*limbs16.shape[:-1], 12)


def ints_to_u16x48(values: Sequence[int], p: int, to_montgomery: bool = True
                   ) -> np.ndarray:
    """Python ints -> (n, 48) device limbs (optionally converting into
    Montgomery form)."""
    out = np.empty((len(values), 48), dtype=np.uint32)
    for i, v in enumerate(values):
        m = (v * R) % p if to_montgomery else v % p
        out[i] = np.frombuffer(m.to_bytes(FQ_BYTES, "little"), dtype="<u2")
    return out


def u16x48_to_ints(arr: np.ndarray, p: int, from_montgomery: bool = True
                   ) -> List[int]:
    rinv = pow(R, -1, p)
    out = []
    flat = arr.reshape(-1, 48)
    for row in flat:
        v = int.from_bytes(row.astype("<u2").tobytes(), "little")
        out.append(v * rinv % p if from_montgomery else v % p)
    return out


# -- pipeline file objects ----------------------------------------------------

@dataclass
class Groth16Params:
    """Mirror of the reference's groth16_parameters (libsnark/main.cpp:27-46)."""
    d: int
    m: int
    A: list      # m+1 affine G1
    B1: list     # m+1 affine G1
    B2: list     # m+1 affine G2
    L: list      # m-1 affine G1
    H: list      # d affine G1


@dataclass
class Groth16Input:
    """Mirror of groth16_input (libsnark/main.cpp:48-68)."""
    w: list      # m+1 scalars (standard domain)
    ca: list     # d+1
    cb: list     # d+1
    cc: list     # d+1
    r: int


def read_params(path: str, curve: CurveParams) -> Groth16Params:
    p, deg = curve.fq.p, curve.ext_degree
    with open(path, "rb") as f:
        d = read_size_t(f)
        m = read_size_t(f)
        A = [read_g1_affine(f, p) for _ in range(m + 1)]
        B1 = [read_g1_affine(f, p) for _ in range(m + 1)]
        B2 = [read_g2_affine(f, p, deg) for _ in range(m + 1)]
        L = [read_g1_affine(f, p) for _ in range(m - 1)]
        H = [read_g1_affine(f, p) for _ in range(d)]
        check_trailing(f, path)
    return Groth16Params(d, m, A, B1, B2, L, H)


def read_input(path: str, curve: CurveParams, d: int, m: int) -> Groth16Input:
    r_mod = curve.fr.p
    with open(path, "rb") as f:
        w = [read_fq(f, r_mod) for _ in range(m + 1)]
        ca = [read_fq(f, r_mod) for _ in range(d + 1)]
        cb = [read_fq(f, r_mod) for _ in range(d + 1)]
        cc = [read_fq(f, r_mod) for _ in range(d + 1)]
        r = read_fq(f, r_mod)
        check_trailing(f, path)
    return Groth16Input(w, ca, cb, cc, r)


def write_output(path: str, curve: CurveParams, a_affine, b_affine, c_affine
                 ) -> None:
    p = curve.fq.p
    with open(path, "wb") as f:
        write_g1(f, a_affine, p)
        write_g2(f, b_affine, p)
        write_g1(f, c_affine, p)


def write_params(path: str, curve: CurveParams, d: int, m: int,
                 A, B1, B2, L, H) -> None:
    """generate_parameters.cpp:60-85 layout (affine inputs)."""
    p = curve.fq.p
    with open(path, "wb") as f:
        write_size_t(f, d)
        write_size_t(f, m)
        assert len(A) == m + 1 and len(B1) == m + 1 and len(B2) == m + 1
        assert len(L) == m - 1 and len(H) == d
        for xy in A:
            write_g1(f, xy, p)
        for xy in B1:
            write_g1(f, xy, p)
        for xy in B2:
            write_g2(f, xy, p)
        for xy in L:
            write_g1(f, xy, p)
        for xy in H:
            write_g1(f, xy, p)


def write_input(path: str, curve: CurveParams, w, ca, cb, cc, r: int) -> None:
    """generate_parameters.cpp:88-107 layout (standard-domain scalars)."""
    rp = curve.fr.p
    with open(path, "wb") as f:
        for x in w:
            write_fq(f, x, rp)
        for vec in (ca, cb, cc):
            for x in vec:
                write_fq(f, x, rp)
        write_fq(f, r, rp)
