"""MinHash / SimHash signature kernels (vectorized numpy).

MinHash (128 perms, ``list<uint64>``) is the analog of the reference's
Enhanced 1024-bit perceptual hash
(/root/reference/crates/image-deduper-core/src/processing/core.rs:109-154,
``PHash::Enhanced([u64;16])`` at src/processing/types.rs:8-15); SimHash
(64-bit) is the analog of the Standard 8x8 u64 pHash (core.rs:37-104).
Estimated Jaccard = mean(sig_a == sig_b) plays the role of
``PHash::distance`` Hamming comparison (processing/types.rs:22-43).

Permutations are the cheap universal-ish family h -> a*h + b over
uint64 wraparound with odd ``a`` — deterministic from the config seed,
identical in engine and oracle.
"""

from __future__ import annotations

import numpy as np


def make_perms(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) coefficient vectors, a forced odd. Built once per actor
    (__init__), never per batch."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perms, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perms, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray,
                      chunk: int = 65536) -> np.ndarray:
    """(num_perms,) uint64 signature = min over shingles of a*h+b.

    Chunked over the shingle axis so a pathological row (millions of
    shingles) never allocates a num_perms x n matrix bigger than
    num_perms x chunk.
    """
    num_perms = len(a)
    if len(shingles) == 0:
        return np.full(num_perms, np.iinfo(np.uint64).max, dtype=np.uint64)
    sig = np.full(num_perms, np.iinfo(np.uint64).max, dtype=np.uint64)
    for s in range(0, len(shingles), chunk):
        block = shingles[s : s + chunk]
        # (P, n) = a[:,None]*h[None,:] + b[:,None]  (uint64 wraparound)
        m = a[:, None] * block[None, :]
        m += b[:, None]
        np.minimum(sig, m.min(axis=1), out=sig)
    return sig


_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash64(shingles: np.ndarray) -> int:
    """64-bit SimHash over the shingle-hash set: per-bit +-1 vote."""
    if len(shingles) == 0:
        return 0
    bits = (shingles[:, None] >> _SHIFTS[None, :]) & np.uint64(1)
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(shingles)
    out = np.uint64(0)
    set_bits = np.nonzero(votes > 0)[0]
    for i in set_bits:
        out |= np.uint64(1) << np.uint64(i)
    return int(out)


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """MinHash Jaccard estimate (the PHash::is_similar analog,
    processing/types.rs:47-58)."""
    return float(np.mean(sig_a == sig_b))


def est_jaccard_matrix(sigs: np.ndarray) -> np.ndarray:
    """All-pairs estimate within a (n, P) signature matrix — used inside
    small LSH buckets. Returns (n, n) float."""
    n = sigs.shape[0]
    eq = (sigs[:, None, :] == sigs[None, :, :])
    return eq.mean(axis=2)


def hamming64(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vector popcount(x XOR y) for uint64 arrays (the reference's
    XOR+count_ones at processing/types.rs:22-31)."""
    v = np.bitwise_xor(x, y)
    return np.unpackbits(v.view(np.uint8)).reshape(len(v), 8 * 8).sum(axis=1)


def cross_variant_similarity(sig_a: np.ndarray | None, sig_b: np.ndarray | None,
                             simhash_a: int, simhash_b: int,
                             num_perms: int) -> tuple[float, str]:
    """Cross-variant comparison rule — the analog of the reference's
    Enhanced<->Standard downgrade (PHash::distance compares only the
    SHARED 64 bits when the variants differ,
    /root/reference/crates/image-deduper-core/src/processing/types.rs:34-43).

    Two full MinHash signatures compare at full width (est-Jaccard);
    if EITHER side carries only the Standard 64-bit SimHash (rows
    resumed from an older checkpoint schema, or a fallback variant),
    the comparison downgrades to the shared 64 bits:
    similarity = 1 - hamming/64. Returns (similarity, basis)."""
    if sig_a is not None and sig_b is not None \
            and len(sig_a) == num_perms and len(sig_b) == num_perms:
        return float(np.mean(sig_a == sig_b)), "minhash"
    d = bin(int(simhash_a) ^ int(simhash_b)).count("1")
    return 1.0 - d / 64.0, "simhash64"
