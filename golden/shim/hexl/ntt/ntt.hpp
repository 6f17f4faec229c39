// Minimal drop-in replacement for the Intel HEXL NTT class, used ONLY to
// build the reference Spiral binary as a golden-test oracle on machines
// without HEXL.  The reference uses intel::hexl::NTT exclusively as a
// self-consistent negacyclic transform mod q' (to_ntt_qprime -> pointwise
// multiply -> from_ntt_qprime; ref: src/util.cpp:220-244), so any correct
// negacyclic NTT is interchangeable: the composed convolution results are
// identical.  This is original code (standard psi-twisted iterative
// radix-2 NTT), not derived from HEXL.
#pragma once

#include <cstdint>
#include <stdexcept>
#include <vector>

namespace intel {
namespace hexl {

class NTT {
 public:
  NTT(uint64_t n, uint64_t q) : n_(n), q_(q) {
    if ((q - 1) % (2 * n) != 0) throw std::runtime_error("q != 1 mod 2n");
    uint64_t psi = find_psi();
    psi_pow_.resize(n_);
    inv_psi_pow_.resize(n_);
    uint64_t ipsi = pow_mod(psi, q_ - 2);
    psi_pow_[0] = inv_psi_pow_[0] = 1;
    for (uint64_t i = 1; i < n_; i++) {
      psi_pow_[i] = mul_mod(psi_pow_[i - 1], psi);
      inv_psi_pow_[i] = mul_mod(inv_psi_pow_[i - 1], ipsi);
    }
    w_ = mul_mod(psi, psi);          // primitive n-th root
    inv_w_ = pow_mod(w_, q_ - 2);
    inv_n_ = pow_mod(n_ % q_, q_ - 2);
  }

  // input_mod_factor/output_mod_factor accepted for API compatibility;
  // inputs are reduced and outputs canonical in [0, q).
  void ComputeForward(uint64_t* out, const uint64_t* in, uint64_t,
                      uint64_t) const {
    std::vector<uint64_t> v(n_);
    for (uint64_t i = 0; i < n_; i++)
      v[i] = mul_mod(in[i] % q_, psi_pow_[i]);   // negacyclic twist
    fft(v.data(), w_);
    for (uint64_t i = 0; i < n_; i++) out[i] = v[i];
  }

  void ComputeInverse(uint64_t* out, const uint64_t* in, uint64_t,
                      uint64_t) const {
    std::vector<uint64_t> v(in, in + n_);
    for (uint64_t i = 0; i < n_; i++) v[i] %= q_;
    fft(v.data(), inv_w_);
    for (uint64_t i = 0; i < n_; i++)
      out[i] = mul_mod(mul_mod(v[i], inv_n_), inv_psi_pow_[i]);
  }

 private:
  uint64_t mul_mod(uint64_t a, uint64_t b) const {
    return (uint64_t)(((__uint128_t)a * b) % q_);
  }

  uint64_t pow_mod(uint64_t b, uint64_t e) const {
    uint64_t r = 1;
    b %= q_;
    while (e) {
      if (e & 1) r = mul_mod(r, b);
      b = mul_mod(b, b);
      e >>= 1;
    }
    return r;
  }

  uint64_t find_psi() const {
    // psi = g^((q-1)/2n) for a generator g; accept any candidate whose
    // order is exactly 2n (psi^n == -1)
    for (uint64_t g = 2; g < q_; g++) {
      uint64_t psi = pow_mod(g, (q_ - 1) / (2 * n_));
      if (pow_mod(psi, n_) == q_ - 1) return psi;
    }
    throw std::runtime_error("no 2n-th root found");
  }

  // iterative Cooley-Tukey over a power-of-two length, root `w`
  void fft(uint64_t* a, uint64_t w) const {
    // bit-reversal permutation
    for (uint64_t i = 1, j = 0; i < n_; i++) {
      uint64_t bit = n_ >> 1;
      for (; j & bit; bit >>= 1) j ^= bit;
      j ^= bit;
      if (i < j) std::swap(a[i], a[j]);
    }
    for (uint64_t len = 2; len <= n_; len <<= 1) {
      uint64_t wl = pow_mod(w, n_ / len);
      for (uint64_t i = 0; i < n_; i += len) {
        uint64_t wj = 1;
        for (uint64_t j = 0; j < len / 2; j++) {
          uint64_t u = a[i + j];
          uint64_t t = mul_mod(a[i + j + len / 2], wj);
          a[i + j] = u + t >= q_ ? u + t - q_ : u + t;
          a[i + j + len / 2] = u >= t ? u - t : u + q_ - t;
          wj = mul_mod(wj, wl);
        }
      }
    }
  }

  uint64_t n_, q_, w_, inv_w_, inv_n_;
  std::vector<uint64_t> psi_pow_, inv_psi_pow_;
};

}  // namespace hexl
}  // namespace intel
