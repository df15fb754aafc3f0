// Host-side native kernels: 12x64-limb Montgomery arithmetic + batch
// affine normalization primitives for the TPU Groth16 prover.
//
// This is the framework's native runtime counterpart of the reference's
// host C++ stack: the Montgomery multiply mirrors libff's mpn-based
// Fp_model::mul for n=12 (depends/libff/libff/algebra/fields/fp.tcc:26-185)
// and the batch-inversion prefix/suffix walk mirrors
// batch_to_special_all_non_zeros (mnt4753_g1.cpp:485-503).  It is used by
// the Python layer (gpu_groth16_prover_3x_tpu/utils/native.py, via ctypes)
// for bulk host-side conversions around the device pipeline: Montgomery
// encode/decode of whole query tables and the one-inversion-per-batch
// affine normalization of device MSM/setup outputs.
//
// Build: g++ -O3 -shared -fPIC -o libgroth16host.so limb_host.cpp
// (no external dependencies; unsigned __int128 for the 64x64->128 mul).

#include <cstdint>
#include <cstring>

namespace {

constexpr int NL = 12;  // 12 x 64-bit limbs = 768 bits

using u64 = std::uint64_t;
using u128 = unsigned __int128;

// out = a + b, returns carry
inline u64 add_n(u64 *out, const u64 *a, const u64 *b) {
    u128 c = 0;
    for (int i = 0; i < NL; ++i) {
        c += (u128)a[i] + b[i];
        out[i] = (u64)c;
        c >>= 64;
    }
    return (u64)c;
}

// out = a - b, returns borrow
inline u64 sub_n(u64 *out, const u64 *a, const u64 *b) {
    u128 br = 0;
    for (int i = 0; i < NL; ++i) {
        u128 d = (u128)a[i] - b[i] - br;
        out[i] = (u64)d;
        br = (d >> 64) & 1;  // two's complement borrow
    }
    return (u64)br;
}

inline bool geq(const u64 *a, const u64 *b) {
    for (int i = NL - 1; i >= 0; --i) {
        if (a[i] != b[i]) return a[i] > b[i];
    }
    return true;
}

// CIOS Montgomery multiply: out = a * b * 2^-768 mod p  (inputs < p)
inline void mont_mul_one(u64 *out, const u64 *a, const u64 *b,
                         const u64 *p, u64 inv) {
    u64 t[NL + 2] = {0};
    for (int i = 0; i < NL; ++i) {
        // t += a[i] * b
        u128 c = 0;
        for (int j = 0; j < NL; ++j) {
            c += (u128)t[j] + (u128)a[i] * b[j];
            t[j] = (u64)c;
            c >>= 64;
        }
        c += t[NL];
        t[NL] = (u64)c;
        t[NL + 1] += (u64)(c >> 64);
        // m = t[0] * inv mod 2^64; t += m * p; t >>= 64
        u64 m = t[0] * inv;
        c = (u128)t[0] + (u128)m * p[0];
        c >>= 64;
        for (int j = 1; j < NL; ++j) {
            c += (u128)t[j] + (u128)m * p[j];
            t[j - 1] = (u64)c;
            c >>= 64;
        }
        c += t[NL];
        t[NL - 1] = (u64)c;
        t[NL] = t[NL + 1] + (u64)(c >> 64);
        t[NL + 1] = 0;
    }
    if (t[NL] || geq(t, p)) sub_n(t, t, p);
    std::memcpy(out, t, NL * sizeof(u64));
}

}  // namespace

extern "C" {

// Elementwise Montgomery products: out[i] = a[i] * b[i * b_stride] / R.
// b_stride 0 broadcasts a single right operand (encode/decode).
void g16_mont_mul_batch(u64 *out, const u64 *a, const u64 *b,
                        long long n, long long b_stride,
                        const u64 *p, u64 inv) {
    for (long long i = 0; i < n; ++i) {
        mont_mul_one(out + i * NL, a + i * NL, b + i * b_stride * NL,
                     p, inv);
    }
}

// Batch affine normalization, phase 1: prefix products of the z
// coordinates (zeros pass through as ones), all in the Montgomery domain.
// prefix has n+1 entries; prefix[0] must be preloaded with R mod p (the
// Montgomery one).  Returns nothing; caller inverts prefix[n] (one
// modular inverse, host bigint) and calls phase 2.
void g16_batch_inv_prefix(u64 *prefix, const u64 *zs, long long n,
                          const u64 *p, u64 inv) {
    u64 zero[NL] = {0};
    for (long long i = 0; i < n; ++i) {
        const u64 *z = zs + i * NL;
        bool is_zero = std::memcmp(z, zero, sizeof zero) == 0;
        if (is_zero) {
            std::memcpy(prefix + (i + 1) * NL, prefix + i * NL,
                        NL * sizeof(u64));
        } else {
            mont_mul_one(prefix + (i + 1) * NL, prefix + i * NL, z, p, inv);
        }
    }
}

// Phase 2: walk backwards turning the inverted total into per-element
// inverses: zinv[i] = prefix[i] * total_inv; total_inv *= z[i].
// total_inv holds the Montgomery-domain inverse of prefix[n] on entry.
void g16_batch_inv_suffix(u64 *zinvs, u64 *total_inv, const u64 *prefix,
                          const u64 *zs, long long n,
                          const u64 *p, u64 inv) {
    u64 zero[NL] = {0};
    for (long long i = n - 1; i >= 0; --i) {
        const u64 *z = zs + i * NL;
        if (std::memcmp(z, zero, sizeof zero) == 0) {
            std::memset(zinvs + i * NL, 0, NL * sizeof(u64));
        } else {
            mont_mul_one(zinvs + i * NL, prefix + i * NL, total_inv, p, inv);
            mont_mul_one(total_inv, total_inv, z, p, inv);
        }
    }
}

// Affine projection: for homogeneous projective (X:Y:Z) Montgomery rows,
// out_x = X * zinv / R ... (stays in the Montgomery domain):
//   out[i] = in[i] * zinvs[i] / R
void g16_mul_pairwise(u64 *out, const u64 *a, const u64 *zinvs,
                      long long n, const u64 *p, u64 inv) {
    for (long long i = 0; i < n; ++i) {
        mont_mul_one(out + i * NL, a + i * NL, zinvs + i * NL, p, inv);
    }
}

}  // extern "C"
