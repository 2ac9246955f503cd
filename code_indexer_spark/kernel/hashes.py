"""Portable content hashes: MinHash, SimHash, shingles, fingerprints.

Every hash here is derived from md5 hex strings so the exact same values
are computable in PySpark (``F.md5``), DuckDB (``md5()``) and plain
Python — which is what lets the driver's DuckDB oracle verify the Spark
implementations value-for-value.

MinHash uses the *lexicographic minimum of seeded md5 hex digests* as
the per-permutation minimum. That is a standard min-wise independent
scheme: ``h_i(s) = md5(str(i) + '|' + s)`` and the signature component
is ``min_s h_i(s)``. Collision probability of a band equals the usual
banding estimate, and the Jaccard estimator E[frac of equal components]
= J(A,B) holds exactly as for integer minhash.

Reference analog: content-addressed dedup via sha256 content hashes
(``/root/reference/src/code_indexer/services/file_chunking_manager.py:376-387``,
``docs/algorithms.md:100-113``); MinHash-LSH blocking is the north-star
scale-out replacement for pairwise comparison.
"""

from __future__ import annotations

import hashlib

DEFAULT_NUM_HASHES = 32
DEFAULT_BANDS = 16  # -> rows_per_band = 2


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def char_shingles(text: str, k: int = 5) -> set[str]:
    """k-char shingles over the lowercased text (set semantics)."""
    t = text.lower()
    if len(t) < k:
        return {t} if t else set()
    return {t[i : i + k] for i in range(len(t) - k + 1)}


def word_shingles(tokens: list[str], k: int = 3) -> set[str]:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def minhash_signature(
    shingles: set[str], num_hashes: int = DEFAULT_NUM_HASHES
) -> list[str]:
    """Signature of lexicographic-min seeded md5 digests."""
    if not shingles:
        return ["" for _ in range(num_hashes)]
    return [
        min(md5_hex(f"{i}|{s}") for s in shingles) for i in range(num_hashes)
    ]


def lsh_bands(
    signature: list[str], bands: int = DEFAULT_BANDS
) -> list[tuple[int, str]]:
    """Split a signature into (band_id, band_key) bucket keys."""
    rows = len(signature) // bands
    return [
        (b, md5_hex("|".join(signature[b * rows : (b + 1) * rows])))
        for b in range(bands)
    ]


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def simhash_bits(tokens: list[str], bits: int = 32) -> int:
    """SimHash where bit j's per-token contribution is the parity of the
    j-th hex char of md5(token) — portable to SQL as ascii(substr(md5(t),
    j+1, 1)) % 2. bits <= 32 (md5 hex has 32 chars)."""
    acc = [0] * bits
    for tok in tokens:
        h = md5_hex(tok)
        for j in range(bits):
            acc[j] += 1 if (ord(h[j]) % 2) else -1
    out = 0
    for j in range(bits):
        if acc[j] > 0:
            out |= 1 << (bits - 1 - j)
    return out


def hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def fingerprint(tokens: list[str], k: int = 3, keep: int = 4) -> str:
    """Winnowing-style document fingerprint: the `keep` smallest md5
    digests of k-word shingles, concatenated. Portable to SQL."""
    digests = sorted(md5_hex(s) for s in word_shingles(tokens, k))
    return "|".join(digests[:keep])
