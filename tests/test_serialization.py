"""Serialization format tests (libsnark/serialization.hpp contract)."""

import io

import numpy as np
import pytest

from gpu_groth16_prover_3x_tpu.curves.constants import MNT4753, MNT6753, R
from gpu_groth16_prover_3x_tpu.host import ec
from gpu_groth16_prover_3x_tpu.utils import serialization as ser


def test_fq_montgomery_round_trip(rng):
    p = MNT4753.fq.p
    for _ in range(10):
        x = rng.randrange(p)
        b = ser.fq_to_bytes(x, p)
        assert len(b) == 96
        assert ser.fq_from_bytes(b, p) == x
    # the dump IS x*R mod p little-endian
    assert int.from_bytes(ser.fq_to_bytes(1, p), "little") == R % p
    assert ser.fq_to_bytes(0, p) == b"\x00" * 96


def test_one_matches_reference_r_mod_p():
    # Fq::one() is R mod p in the file (fp.tcc Montgomery convention)
    for curve in (MNT4753, MNT6753):
        assert ser.fq_from_bytes((R % curve.fq.p).to_bytes(96, "little"),
                                 curve.fq.p) == 1


@pytest.mark.parametrize("curve", [MNT4753, MNT6753], ids=["4", "6"])
def test_g1_g2_round_trip(curve, rng):
    g1 = ec.g1_group(curve)
    gen1 = ec.g1_generator(curve)
    p = curve.fq.p
    pt = g1.to_affine(g1.mul(rng.randrange(1, 10**9), gen1))
    buf = io.BytesIO()
    ser.write_g1(buf, pt, p)
    buf.seek(0)
    assert ser.read_g1_affine(buf, p) == pt

    g2 = ec.g2_group(curve)
    gen2 = ec.g2_generator(curve)
    pt2 = g2.to_affine(g2.mul(rng.randrange(1, 10**9), gen2))
    buf = io.BytesIO()
    ser.write_g2(buf, pt2, p)
    buf.seek(0)
    assert ser.read_g2_affine(buf, p, curve.ext_degree) == pt2

    # zero encodes as all-zero bytes
    buf = io.BytesIO()
    ser.write_g1(buf, g1.to_affine(g1.zero), p)
    assert buf.getvalue() == b"\x00" * 192


def test_u64_u16_repack(rng):
    p = MNT4753.fq.p
    vals = [rng.randrange(p) for _ in range(7)]
    a16 = ser.ints_to_u16x48(vals, p)
    assert a16.shape == (7, 48) and a16.dtype == np.uint32
    assert (a16 < (1 << 16)).all()
    # bitcast consistency u64 <-> u16
    a64 = ser.u16x48_to_u64(a16)
    assert (ser.u64_to_u16x48(a64) == a16).all()
    # and back to ints
    assert ser.u16x48_to_ints(a16, p) == vals


def test_size_t():
    buf = io.BytesIO()
    ser.write_size_t(buf, 123456789)
    buf.seek(0)
    assert ser.read_size_t(buf) == 123456789
    assert len(buf.getvalue()) == 8
