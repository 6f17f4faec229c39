"""Encryption primitives (ref: src/client.cpp:48-234).

All ciphertexts are PolyMats in NTT domain.  A scalar-Regev ct of sigma is
(−a, a·s + e + sigma) stacked as rows (0, 1); a matrix ct under S=[Sp|I]
is P + [0; M] with P = [−A; Sp·A + E].
"""
from __future__ import annotations

import jax

from ..core.poly import PolyMat
from ..core.sampling import gaussian_residues, uniform_residues


class Encryptor:
    """Stateful key-splitting wrapper so call sites stay close to the
    reference's free-function shapes."""

    def __init__(self, keys, d: int, nonoise: bool = False):
        self.keys = keys
        self.d = d
        self.nonoise = nonoise

    def _noise(self, key, rows, cols) -> PolyMat:
        import jax.numpy as jnp
        if self.nonoise:
            return PolyMat(
                jnp.zeros((rows, cols, 2, self.d), dtype=jnp.uint32), False)
        return PolyMat(gaussian_residues(key, (rows, cols, self.d)), False)

    def fresh_public_key_raw(self, key, m: int, n_out: int | None = None
                             ) -> PolyMat:
        """P = [-A; Sp·A + E], (k + n_out) x m, coeff domain
        (ref: client.cpp:48-67, testing.cpp:141-160)."""
        Sp = self.keys.Sp
        n_out = Sp.rows if n_out is None else n_out
        k = Sp.cols
        ka, ke = jax.random.split(key)
        A = PolyMat(uniform_residues(ka, (k, m, self.d)), False)
        E = self._noise(ke, n_out, m)
        A_ntt = A.to_ntt()
        B = (Sp.to_ntt() @ A_ntt) + E.to_ntt()
        return PolyMat.vstack(-A, B.from_ntt())

    def encrypt_matrix(self, key, M_ntt: PolyMat, n_out: int | None = None
                       ) -> PolyMat:
        """Enc_S(M): P + [0; M], NTT domain. M is n_out x m."""
        n_out = self.keys.Sp.rows if n_out is None else n_out
        m = M_ntt.cols
        P = self.fresh_public_key_raw(key, m, n_out).to_ntt()
        k = self.keys.Sp.cols
        return P.place(P.pick(k, 0, n_out, m) + M_ntt, k, 0)

    def regev_sample(self, key) -> PolyMat:
        """(−a; a·sr + e), 2 x 1 NTT (ref: client.cpp:147-163)."""
        ka, ke = jax.random.split(key)
        a = PolyMat(uniform_residues(ka, (1, 1, self.d)), False)
        e = self._noise(ke, 1, 1)
        b = (a.to_ntt() @ self.keys.sr.to_ntt()) + e.to_ntt()
        return PolyMat.vstack((-a).to_ntt(), b)

    def regev_sample_matrix(self, key, m: int) -> PolyMat:
        """2 x m matrix of independent Regev samples (ref: client.cpp:165-174)."""
        ka, ke = jax.random.split(key)
        a = PolyMat(uniform_residues(ka, (1, m, self.d)), False)
        e = self._noise(ke, 1, m)
        # a (1 x m) scalar-multiplied by sr: a·s per column
        b = a.to_ntt().scalar_mul(self.keys.sr.to_ntt()) + e.to_ntt()
        return PolyMat.vstack((-a).to_ntt(), b)

    def encrypt_simple_regev(self, key, sigma: PolyMat) -> PolyMat:
        """Scalar Regev enc of a 1x1 coeff poly (ref: client.cpp:176-192)."""
        P = self.regev_sample(key)
        return P.place(P.pick(1, 0, 1, 1) + sigma.to_ntt(), 1, 0)

    def encrypt_gsw_direct(self, key, bit: int, G2: PolyMat) -> PolyMat:
        """GSW ct of a bit: fresh zero encryption + bit*G2 (n1 x m2, NTT).

        Matches the invariant produced by regevToGSW (S·Q = E + bit·S·G2);
        used for testing and for direct GSW upload paths.
        """
        P = self.fresh_public_key_raw(key, G2.cols).to_ntt()
        if bit:
            return P + G2.to_ntt()
        return P

    def encrypt_simple_regev_matrix(self, key, M_ntt: PolyMat) -> PolyMat:
        """Row-vector message enc under sr: 2 x m
        (ref: client.cpp:215-234)."""
        m = M_ntt.cols
        P = self.regev_sample_matrix(key, m)
        return P.place(P.pick(1, 0, 1, m) + M_ntt, 1, 0)


def decrypt(S_ntt: PolyMat, C_ntt: PolyMat) -> PolyMat:
    """S·C, NTT domain (ref: client.cpp:138-145)."""
    return S_ntt @ C_ntt
