"""Vectorized batch signature kernel (the hot path at 100 TB).

The scalar path (tokenize.py + hashing.py) runs a Python loop per row:
regex findall, per-token dict/blake2b hashing, per-row MinHash. This
module computes the SAME pipeline shape for a WHOLE batch with numpy:

  bytes -> byte-class LUT -> token boundaries (segmented scans)
        -> polynomial token hashes (add.reduceat)
        -> k-gram shingles with row-validity masks
        -> per-row unique (one sort + boundary scan)
        -> MinHash via minimum.reduceat per permutation
        -> SimHash via per-bit add.reduceat votes

Token semantics (byte-level, shared by engine AND oracle when
``cfg.vectorized_signatures`` is on — recall vs the oracle is exact by
construction because both call THIS code):
  identifier = [A-Za-z_ or byte>=0x80][A-Za-z0-9_ or byte>=0x80]*
  number     = [0-9]+
  punct      = any other non-space byte, one token per byte
A number run followed by letters starts a NEW identifier token
("12ab" -> "12", "ab"), matching the scalar regex
``[A-Za-z_]\\w*|\\d+|[^\\w\\s]`` on ASCII input. Rows are joined with a
forced space so no token spans rows.
"""

from __future__ import annotations

import numpy as np

# --- byte classes ---
_SPACE, _ALPHA, _DIGIT, _PUNCT = 0, 1, 2, 3
_LUT = np.full(256, _PUNCT, dtype=np.uint8)
for _b in (9, 10, 11, 12, 13, 32):
    _LUT[_b] = _SPACE
_LUT[48:58] = _DIGIT
_LUT[65:91] = _ALPHA
_LUT[97:123] = _ALPHA
_LUT[95] = _ALPHA          # _
_LUT[128:] = _ALPHA        # UTF-8 continuation/lead bytes: identifier-ish

# polynomial base powers (mod 2^64), exponent taken mod 64
_P = np.uint64(0x100000001B3)
with np.errstate(over="ignore"):
    _POW = np.empty(64, dtype=np.uint64)
    _POW[0] = np.uint64(1)
    for _i in range(1, 64):
        _POW[_i] = _POW[_i - 1] * _P

_U64_MAX = np.iinfo(np.uint64).max


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def token_hashes_batch(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """-> (token_hash: uint64[n_tokens], token_row: int64[n_tokens]) for
    a batch of already-normalized row texts."""
    if not texts:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    encoded = [t.encode("utf-8", "surrogatepass") for t in texts]
    joined = b" ".join(encoded) + b" "
    arr = np.frombuffer(joined, dtype=np.uint8)
    # byte -> row: rows separated by the forced space
    row_ends = np.cumsum([len(e) + 1 for e in encoded])  # exclusive
    cls = _LUT[arr]
    is_alpha = cls == _ALPHA
    is_digit = cls == _DIGIT
    is_punct = cls == _PUNCT
    alnum = is_alpha | is_digit

    prev_alnum = np.zeros(len(arr), dtype=bool)
    prev_alnum[1:] = alnum[:-1]
    run_start = alnum & ~prev_alnum
    # digit-run -> alpha boundary: first alpha in an alnum run that
    # started with a digit opens a new (identifier) token
    run_id = np.cumsum(run_start, dtype=np.int32)          # 1-based over alnum bytes, 0 before
    cs_alpha = np.cumsum(is_alpha, dtype=np.int32)
    run_start_pos = np.flatnonzero(run_start)
    # alpha count before each byte's run start
    base_alpha = np.zeros(len(arr), dtype=np.int64)
    if len(run_start_pos):
        starts_cs = cs_alpha[run_start_pos] - is_alpha[run_start_pos]
        base_alpha[alnum] = starts_cs[run_id[alnum] - 1]
    alpha_before_in_run = cs_alpha - is_alpha - base_alpha
    digit_run_started = np.zeros(len(arr), dtype=bool)
    if len(run_start_pos):
        digit_run_started[alnum] = is_digit[run_start_pos][run_id[alnum] - 1]
    num_to_ident = is_alpha & digit_run_started & (alpha_before_in_run == 0)

    tok_start = is_punct | run_start | num_to_ident
    is_tok = alnum | is_punct

    tok_positions = np.flatnonzero(is_tok)
    if len(tok_positions) == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    starts_f = np.flatnonzero(tok_start[is_tok])
    # token id per token byte (in filtered space)
    tid = np.cumsum(tok_start[is_tok], dtype=np.int32) - 1
    # token end (exclusive, filtered space): start of next token or end
    ends_f = np.empty(len(starts_f), dtype=np.int64)
    ends_f[:-1] = starts_f[1:]
    ends_f[-1] = len(tok_positions)
    # punct bytes adjacent to alnum runs: a punct byte always ends its
    # own token because the next byte is a new token start or non-token.
    # BUT a punct byte followed directly by an alnum byte: that alnum
    # byte has run_start=True => new token. A punct followed by punct:
    # each punct is tok_start. So ends are correct.
    byte_pos_in_tok = np.arange(len(tok_positions)) - starts_f[tid]
    tok_len = ends_f - starts_f
    exp = (tok_len[tid] - 1 - byte_pos_in_tok) % 64
    with np.errstate(over="ignore"):
        contrib = arr[tok_positions].astype(np.uint64) * _POW[exp]
        th = np.add.reduceat(contrib, starts_f)
        th = _splitmix64(th + np.uint64(0xABCD) * tok_len.astype(np.uint64))
    tok_row = np.searchsorted(row_ends, tok_positions[starts_f],
                              side="right").astype(np.int64)
    return th, tok_row


def shingles_batch(th: np.ndarray, tok_row: np.ndarray, n_rows: int,
                   k: int) -> tuple[np.ndarray, np.ndarray]:
    """k-gram rolling shingle hashes per row, deduped per row.
    Rows with 1..k-1 tokens get ONE shingle over all their tokens
    (scalar-path semantics). -> (shingle: uint64, row: int64), sorted by
    (row, shingle)."""
    n = len(th)
    if n == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    counts = np.bincount(tok_row, minlength=n_rows)
    with np.errstate(over="ignore"):
        sh_vals = []
        sh_rows = []
        if n >= k:
            m = n - k + 1
            h = th[:m].copy()
            for i in range(1, k):
                h *= _P
                h += th[i: m + i]
            valid = tok_row[:m] == tok_row[k - 1:]
            sh_vals.append(h[valid])
            sh_rows.append(tok_row[:m][valid])
        # short rows: single shingle over all tokens
        short = np.flatnonzero((counts > 0) & (counts < k))
        if len(short):
            row_starts = np.zeros(n_rows + 1, dtype=np.int64)
            np.cumsum(counts, out=row_starts[1:])
            vals = np.empty(len(short), dtype=np.uint64)
            for j, r in enumerate(short):  # rare path; tiny rows
                seg = th[row_starts[r]: row_starts[r + 1]]
                h = seg[0]
                for x in seg[1:]:
                    h = h * _P + x
                vals[j] = h
            sh_vals.append(vals)
            sh_rows.append(short.astype(np.int64))
    if not sh_vals:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    sh = np.concatenate(sh_vals)
    rows = np.concatenate(sh_rows)
    order = np.lexsort((sh, rows))
    sh, rows = sh[order], rows[order]
    keep = np.ones(len(sh), dtype=bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (sh[1:] != sh[:-1])
    return sh[keep], rows[keep]


def minhash_simhash_batch(sh: np.ndarray, rows: np.ndarray, n_rows: int,
                          a: np.ndarray, b: np.ndarray
                          ) -> tuple[np.ndarray, np.ndarray]:
    """-> (sig: uint64[n_rows, P] with empty rows = U64_MAX,
    simhash: uint64[n_rows]) from per-row-unique shingles sorted by row."""
    P = len(a)
    sig = np.full((n_rows, P), _U64_MAX, dtype=np.uint64)
    simh = np.zeros(n_rows, dtype=np.uint64)
    if len(sh) == 0:
        return sig, simh
    seg = np.ones(len(rows), dtype=bool)
    seg[1:] = rows[1:] != rows[:-1]
    seg_starts = np.flatnonzero(seg)
    seg_rows = rows[seg_starts]
    with np.errstate(over="ignore"):
        for p in range(P):
            vals = a[p] * sh + b[p]
            sig[seg_rows, p] = np.minimum.reduceat(vals, seg_starts)
        n_per = np.diff(np.append(seg_starts, len(sh)))
        votes_thresh = n_per.astype(np.int64)
        for bit in range(64):
            bits = ((sh >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
            ones = np.add.reduceat(bits, seg_starts)
            hits = (2 * ones - votes_thresh) > 0
            simh[seg_rows[hits]] |= np.uint64(1) << np.uint64(bit)
    return sig, simh
