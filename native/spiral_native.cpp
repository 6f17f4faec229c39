// Host-side native runtime for spiral-tpu.
//
// The TPU compute path is JAX/XLA; this covers the host data path the
// reference implements natively: database ingest (centered lift to CRT
// residues, ref: src/spiral.cpp:1116-1127), the exact two-modulus
// rescale (ref: src/poly.cpp:578-601), and arbitrary-width bit packing
// of responses (ref: src/core.cpp:20-52).  Exposed via plain C symbols
// for ctypes.

#include <cstdint>
#include <cstring>

using u32 = uint32_t;
using u64 = uint64_t;
using i64 = int64_t;
using u128 = unsigned __int128;
using i128 = __int128;

extern "C" {

// pts: n values in [0, p_db). Writes the centered lifts mod p and mod b.
void center_lift(const int16_t *pts, size_t n, u32 p_db, u32 mod_p,
                 u32 mod_b, u32 *limb_p, u32 *limb_b) {
    const i64 half = p_db / 2;
    for (size_t i = 0; i < n; i++) {
        i64 v = pts[i];
        if (v >= half) v -= (i64)p_db;
        limb_p[i] = v < 0 ? (u32)(v + (i64)mod_p) : (u32)v;
        limb_b[i] = v < 0 ? (u32)(v + (i64)mod_b) : (u32)v;
    }
}

// Garner lift of residue pairs to values mod Q = mod_p * mod_b.
// p_inv_mod_b = mod_p^{-1} mod mod_b.
void crt_lift(const u32 *xs, const u32 *ys, size_t n, u32 mod_p, u32 mod_b,
              u64 p_inv_mod_b, u64 *out) {
    for (size_t i = 0; i < n; i++) {
        u64 x = xs[i];
        u64 y = ys[i];
        u64 diff = (y + mod_b - x % mod_b) % mod_b;
        u64 t = (u64)(((u128)diff * p_inv_mod_b) % mod_b);
        out[i] = x + (u64)mod_p * t;
    }
}

// Centered rounded rescale of values mod in_mod down to out_mod
// (truncating division toward zero, matching the reference).
void rescale_vals(const u64 *vals, size_t n, u64 in_mod, u64 out_mod,
                  u64 *out) {
    const i128 half_in = (i128)(in_mod / 2);
    for (size_t i = 0; i < n; i++) {
        i128 v = (i128)(vals[i] % in_mod);
        if (v >= half_in) v -= (i128)in_mod;
        i128 sign = v >= 0 ? 1 : -1;
        i128 num = v * (i128)out_mod + sign * half_in;
        i128 q = num / (i128)in_mod;   // trunc toward zero
        i64 r = (i64)(q % (i128)out_mod);
        if (r < 0) r += (i64)out_mod;
        out[i] = (u64)r;
    }
}

// Bit packing at `width` bits per value (width < 58).
void bit_pack(const u64 *vals, size_t n, int width, uint8_t *out) {
    size_t bit = 0;
    for (size_t i = 0; i < n; i++) {
        u64 v = vals[i] & ((width >= 64) ? ~0ULL : ((1ULL << width) - 1));
        size_t byte = bit >> 3;
        int off = (int)(bit & 7);
        // write up to 9 bytes
        u128 cur = 0;
        memcpy(&cur, out + byte, 9);
        cur |= ((u128)v) << off;
        memcpy(out + byte, &cur, 9);
        bit += width;
    }
}

void bit_unpack(const uint8_t *data, size_t n, int width, u64 *out) {
    const u64 mask = (width >= 64) ? ~0ULL : ((1ULL << width) - 1);
    size_t bit = 0;
    for (size_t i = 0; i < n; i++) {
        size_t byte = bit >> 3;
        int off = (int)(bit & 7);
        u128 cur = 0;
        memcpy(&cur, data + byte, 9);
        out[i] = (u64)((cur >> off) & mask);
        bit += width;
    }
}

}  // extern "C"
