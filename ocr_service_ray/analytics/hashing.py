"""Deterministic, process-stable hashing for dedup/sketch operators.

Python's builtin ``hash`` is salted per process (PYTHONHASHSEED), which
would make any distributed sketch nondeterministic across workers — a
correctness bug under the span-equality/determinism discipline
(FIXTURES.md §7). Everything here derives from blake2b, which is stable
everywhere, and exposes vectorized numpy paths for the hot loops.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_WS = re.compile(r"\s+")

# Mersenne prime for universal hashing (fits comfortably in int64 math
# when done in object/uint64 space below).
_MERSENNE = np.uint64(2305843009213693951)  # 2^61 - 1


def normalize_text(text: str | None) -> str:
    """Dedup normalization: lowercase, trim, collapse whitespace.

    Mirrors the SQL form ``regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')``
    used by the DuckDB oracles, so both sides group identically.
    """
    return _WS.sub(" ", (text or "").lower().strip())


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def stable_hash64(token: str) -> int:
    """Stable unsigned 64-bit hash of a string."""
    return int.from_bytes(hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "big")


def hash_tokens(tokens: list[str]) -> np.ndarray:
    """Vector of stable uint64 hashes (one blake2b call per distinct token)."""
    return np.fromiter((stable_hash64(t) for t in tokens), dtype=np.uint64, count=len(tokens))


def md5_hash64(token: str) -> int:
    """Lower-64-bit md5 hash, matching DuckDB's ``md5_number_lower``
    (bytes 8..16 of the digest, little-endian) so sketches built on it
    are SQL-oracle-able."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[8:16], "little")


def md5_hash_tokens(tokens: list[str]) -> np.ndarray:
    return np.fromiter((md5_hash64(t) for t in tokens), dtype=np.uint64, count=len(tokens))


def shingles(text: str, k: int = 5) -> list[str]:
    """Word k-shingles of the normalized text (the MinHash item set)."""
    words = normalize_text(text).split()
    if len(words) <= k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


class MinHasher:
    """num_perm universal hash functions h_i(x) = (a_i*x + b_i) mod (2^61-1).

    Built once per actor (warm state); ``signature`` is one vectorized
    numpy broadcast per document.
    """

    def __init__(self, num_perm: int = 64, seed: int = 1):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def signature(self, item_hashes: np.ndarray) -> np.ndarray:
        """uint64[num_perm] MinHash signature of a set of item hashes."""
        if item_hashes.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = item_hashes.astype(np.uint64) % _MERSENNE
        # (num_perm, n) broadcast in python-int-free uint64 modular space:
        # split multiply to avoid overflow: use object math only if needed.
        # 61-bit operands: a*x can overflow 64 bits -> do it in float128-free
        # way via np.uint64 high/low split.
        prod = self._mulmod(self.a[:, None], x[None, :])
        sig = (prod + self.b[:, None]) % _MERSENNE
        return sig.min(axis=1)

    @staticmethod
    def _mulmod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """(a*b) mod (2^61-1) for uint64 arrays without 128-bit ints.

        Split a = a_hi*2^31 + a_lo; reduce 2^61 ≡ 1 (mod p) pieces.
        """
        p = _MERSENNE
        a_hi = a >> np.uint64(31)
        a_lo = a & np.uint64(0x7FFFFFFF)
        # a_lo * b fits: 31b * 61b = 92b -> still overflows; split b too.
        b_hi = b >> np.uint64(31)
        b_lo = b & np.uint64(0x7FFFFFFF)
        # a*b = a_hi*b_hi*2^62 + (a_hi*b_lo + a_lo*b_hi)*2^31 + a_lo*b_lo
        # 2^61 ≡ 1 (mod p) -> 2^62 ≡ 2; 2^31 stays.
        t_hh = (a_hi * b_hi) % p  # fits: 30b*30b=60b
        t_mid = (a_hi * b_lo + a_lo * b_hi) % p  # 61b+61b fits in 64
        t_ll = (a_lo * b_lo) % p  # 62b fits
        res = (t_hh * np.uint64(2)) % p
        # t_mid * 2^31 mod p: do shift-and-reduce (31 doublings is slow;
        # instead split t_mid again)
        m_hi = t_mid >> np.uint64(30)
        m_lo = t_mid & np.uint64(0x3FFFFFFF)
        # t_mid*2^31 = m_hi*2^61 + m_lo*2^31 ≡ m_hi + m_lo*2^31 (mod p)
        res = (res + m_hi + ((m_lo << np.uint64(31)) % p)) % p
        res = (res + t_ll) % p
        return res


def simhash64(token_hashes: np.ndarray, counts: np.ndarray | None = None) -> int:
    """64-bit SimHash from token hashes (optionally weighted by counts)."""
    if token_hashes.size == 0:
        return 0
    bits = np.unpackbits(
        token_hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int32)
    w = counts if counts is not None else np.ones(len(token_hashes))
    score = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
    out_bits = (score > 0).astype(np.uint8)
    return int(np.packbits(out_bits, bitorder="little").view(np.uint64)[0])


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


class HyperLogLog:
    """Classic HLL (Flajolet et al.) over md5-lower64 hashes.

    Registers are a numpy uint8 array; ``add_hashes`` is vectorized;
    ``merge`` is elementwise max — the shape a distributed AggregateFn
    needs. Deterministic: same inputs -> same registers -> same estimate.
    """

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> "HyperLogLog":
        h = hashes.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining 64-p bits, top-aligned
        # rank = position of the leftmost 1-bit in the remaining bits
        rank = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        found = np.zeros(len(h), dtype=bool)
        for r in range(1, 64 - self.p + 2):
            hit = (~found) & ((rest & mask) != 0)
            rank[hit] = r
            found |= hit
            rest = rest << np.uint64(1)
            if found.all():
                break
        rank[~found] = 64 - self.p + 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)

    def estimate_rounded(self) -> int:
        """Deterministic SQL-replicable estimate (rounded to an int).

        The register sum Z = Σ 2^-M_j is computed as an EXACT integer
        (every term is dyadic: Σ 2^(S-M_j) with S = 64-p+1, arbitrary-
        precision Python int == DuckDB HUGEINT), so the only float ops
        are the final alpha/division/ln — each a single IEEE-double op
        identical between numpy/libm and DuckDB. The matching SQL lives
        in pipeline/entry_api.oracle_sql()['approx_distinct_users'];
        operation ORDER there mirrors this method token for token.
        """
        import math

        S = 64 - self.p + 1
        m_f = float(self.m)
        vals, cnts = np.unique(self.registers, return_counts=True)
        z_int = sum(int(c) << (S - int(v)) for v, c in zip(vals, cnts))
        alpha = 0.7213 / (1.0 + 1.079 / m_f)
        e = (alpha * (m_f * m_f)) * float(1 << S) / float(z_int)
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m_f and zeros > 0:
            e = m_f * math.log(m_f / zeros)
        return int(math.floor(e + 0.5))  # DuckDB round(): half away from zero
