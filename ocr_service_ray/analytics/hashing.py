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

# EXACT DuckDB semantics, not approximate: RE2's \s is ASCII-only
# (Python's default \s is unicode-aware — a latent divergence on any
# unicode-whitespace input), and DuckDB trim() strips Unicode SPACE
# SEPARATORS (category Zs: space, NBSP, EN/EM spaces, ideographic
# space) but NOT \t / \x1c / NEL / LS. Parity is fuzz-pinned vs DuckDB
# in tests/test_analytics.py on arbitrary unicode text.
# RE2's \s is exactly [ \t\n\f\r] — note NO \x0b (vertical tab),
# which even Python's re.ASCII \s includes; spell the class out.
_WS = re.compile(r"[ \t\n\f\r]+")
_ZS = (
    " \xa0\u1680\u2000\u2001\u2002\u2003\u2004\u2005"
    "\u2006\u2007\u2008\u2009\u200a\u202f\u205f\u3000"
)

# Mersenne prime for universal hashing (fits comfortably in int64 math
# when done in object/uint64 space below).
_MERSENNE = np.uint64(2305843009213693951)  # 2^61 - 1


def normalize_text(text: str | None) -> str:
    """Dedup normalization: lowercase, collapse ASCII whitespace, trim
    Zs spaces — character-exact with the SQL form
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))`` used by the
    DuckDB oracles, so both sides group identically on ANY input.
    """
    return _WS.sub(" ", (text or "").lower()).strip(_ZS)


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
    """Vector of md5-lower64 hashes. Short tokens (<= 55 utf-8 bytes —
    the overwhelming majority of words) go through the fully-vectorized
    single-block numpy MD5; longer ones fall back to hashlib."""
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    enc = [t.encode("utf-8") for t in tokens]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
    short = lens <= 55
    out = np.zeros(len(enc), dtype=np.uint64)
    if short.any():
        digests = md5_batch([b for b, s in zip(enc, short) if s])
        # bytes 8..16 little-endian == DuckDB md5_number_lower
        out[short] = digests[:, 8:16].copy().view(np.uint64).ravel()
    for i in np.flatnonzero(~short):
        out[i] = md5_hash64(tokens[i])
    return out


# ----------------------------------------------------------------------
# Vectorized single-block MD5 (messages <= 55 bytes -> one 64-byte
# block). The hot per-row hashlib loops (hash sampling over int ids,
# SimHash word hashing) become a handful of numpy passes; parity with
# hashlib.md5 is fuzz-pinned in tests/test_analytics.py.

_MD5_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_MD5_K = np.array(
    [int(abs(np.sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_MD5_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)


def _md5_compress(M: np.ndarray) -> np.ndarray:
    """One MD5 compression over n parallel 16-word blocks -> (n,4) uint32.

    In-place temporaries: each round is ~6 elementwise passes over the
    n-vector instead of ~12 fresh allocations. The block matrix is
    transposed once so each round's message word is a contiguous row
    (the strided (n,16) column gather was the cache hot spot).

    Measured honestly (BENCH note): ~parity with a hashlib-C per-row
    loop at 400k rows (~0.3 µs/row both) — the win over the PREVIOUS
    code is removing the per-row str/hexdigest/compare overhead (~2x on
    hash_sample's filter stage), not beating OpenSSL's md5."""
    M = np.ascontiguousarray(M.T)  # (16, n)
    n = M.shape[1]
    a = np.full(n, 0x67452301, np.uint32)
    b = np.full(n, 0xEFCDAB89, np.uint32)
    c = np.full(n, 0x98BADCFE, np.uint32)
    d = np.full(n, 0x10325476, np.uint32)
    a0, b0, c0, d0 = a.copy(), b.copy(), c.copy(), d.copy()
    f = np.empty(n, np.uint32)
    t = np.empty(n, np.uint32)
    for i in range(64):
        if i < 16:
            # (b & c) | (~b & d)  ==  d ^ (b & (c ^ d))
            np.bitwise_xor(c, d, out=f); np.bitwise_and(f, b, out=f)
            np.bitwise_xor(f, d, out=f)
        elif i < 32:
            # (d & b) | (~d & c)  ==  c ^ (d & (b ^ c))
            np.bitwise_xor(b, c, out=f); np.bitwise_and(f, d, out=f)
            np.bitwise_xor(f, c, out=f)
        elif i < 48:
            np.bitwise_xor(b, c, out=f); np.bitwise_xor(f, d, out=f)
        else:
            # c ^ (b | ~d)
            np.bitwise_not(d, out=f); np.bitwise_or(f, b, out=f)
            np.bitwise_xor(f, c, out=f)
        np.add(f, a, out=f)
        np.add(f, _MD5_K[i], out=f)
        np.add(f, M[_MD5_G[i]], out=f)
        s = int(_MD5_S[i])
        np.right_shift(f, np.uint32(32 - s), out=t)
        np.left_shift(f, np.uint32(s), out=f)
        np.bitwise_or(f, t, out=f)
        np.add(f, b, out=f)
        a, d, c, b, f = d, c, b, f, a  # rotate registers; old a becomes scratch
    return np.stack([a0 + a, b0 + b, c0 + c, d0 + d], axis=1)


def md5_batch(msgs: list[bytes]) -> np.ndarray:
    """md5 digests of short messages (each <= 55 bytes) -> (n,16) uint8."""
    n = len(msgs)
    if n == 0:
        return np.zeros((0, 16), dtype=np.uint8)
    lens = np.fromiter((len(m) for m in msgs), dtype=np.int64, count=n)
    if (lens > 55).any():
        raise ValueError("md5_batch: message exceeds single-block limit (55 bytes)")
    block = np.zeros((n, 64), dtype=np.uint8)
    flat = np.frombuffer(b"".join(msgs), dtype=np.uint8)
    rows = np.repeat(np.arange(n), lens)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    cols = np.arange(len(flat)) - np.repeat(offs, lens)
    block[rows, cols] = flat
    block[np.arange(n), lens] = 0x80  # padding bit
    bitlen = (lens * 8).astype(np.uint64)
    block[:, 56:64] = bitlen[:, None].view(np.uint8).reshape(n, 8)  # LE length
    M = block.view(np.uint32)  # (n, 16) little-endian words
    return _md5_compress(M).view(np.uint8).reshape(n, 16)


def md5_batch_int_ids(ids: np.ndarray) -> np.ndarray:
    """md5 digests of the DECIMAL-STRING form of integer ids (the exact
    bytes ``md5(CAST(id AS VARCHAR))`` hashes) -> (n,16) uint8, with the
    digit rendering itself vectorized (no per-row str())."""
    ids = np.asarray(ids, dtype=np.int64)
    if (ids < 0).any():
        raise ValueError("md5_batch_int_ids: negative ids unsupported")
    n = len(ids)
    if n == 0:
        return np.zeros((0, 16), dtype=np.uint8)
    # decimal length without float log10 edge cases: compare to 10^k
    pows = np.array([10**k for k in range(1, 19)], dtype=np.int64)
    lens = 1 + (ids[:, None] >= pows[None, :]).sum(axis=1)
    maxlen = int(lens.max())
    # right-aligned digit matrix (one column op per digit), then ONE
    # gather shifts each row left-aligned into the message block
    digits = np.empty((n, maxlen), dtype=np.uint8)
    rem = ids.copy()
    for j in range(maxlen):
        digits[:, maxlen - 1 - j] = rem % 10
        rem //= 10
    digits += 0x30
    src_col = (maxlen - lens)[:, None] + np.arange(maxlen)[None, :]
    aligned = np.take_along_axis(digits, np.minimum(src_col, maxlen - 1), axis=1)
    block = np.zeros((n, 64), dtype=np.uint8)
    valid = np.arange(maxlen)[None, :] < lens[:, None]
    block[:, :maxlen] = np.where(valid, aligned, 0)
    block[np.arange(n), lens] = 0x80
    bitlen = (lens * 8).astype(np.uint64)
    block[:, 56:64] = bitlen[:, None].view(np.uint8).reshape(n, 8)
    return _md5_compress(block.view(np.uint32)).view(np.uint8).reshape(n, 16)


def split_words(text: str | None) -> list[str]:
    """Words of the normalized text, split on the SINGLE space the
    normalization guarantees — exactly ``string_split(normed, ' ')``
    minus empties (Python's bare .split() would additionally split on
    unicode whitespace the ASCII collapse leaves in place)."""
    norm = normalize_text(text)
    return [w for w in norm.split(" ") if w] if norm else []


def shingles(text: str, k: int = 5) -> list[str]:
    """Word k-shingles of the normalized text (the MinHash item set)."""
    words = split_words(text)
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


# ----------------------------------------------------------------------
# Bloom filter over int64 keys (the big-big semi-join prefilter)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wraparound is the
    defined numpy behavior for unsigned ints — no Python loop)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class BloomFilter:
    """Fixed-size blocked-free Bloom filter for int64 keys with
    double hashing (Kirsch–Mitzenmacher: idx_j = h1 + j*h2 mod m).

    Built distributedly: each block of the build side produces its own
    bit array via :meth:`add_many`; arrays are OR-merged (``merge``) —
    a few KB per block regardless of key count, so the merge never
    materializes the key set anywhere. ``m_bits`` must be a power of
    two (mask instead of modulo).
    """

    def __init__(self, m_bits: int = 1 << 17, n_hashes: int = 5):
        assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
        self.m_bits = m_bits
        self.n_hashes = n_hashes
        self.bits = np.zeros(m_bits // 8, dtype=np.uint8)

    def _indices(self, keys: np.ndarray) -> np.ndarray:
        """(n_hashes, len(keys)) bit positions."""
        x = keys.astype(np.int64).view(np.uint64)
        h1 = _splitmix64(x)
        h2 = _splitmix64(x ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
        j = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return ((h1[None, :] + j * h2[None, :]) & np.uint64(self.m_bits - 1)).astype(
            np.int64
        )

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        idx = self._indices(np.asarray(keys))
        np.bitwise_or.at(self.bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership mask (true = maybe present; false =
        definitely absent — the one-sided Bloom guarantee)."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices(np.asarray(keys))
        hit = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m_bits == other.m_bits and self.n_hashes == other.n_hashes
        self.bits |= other.bits
        return self
