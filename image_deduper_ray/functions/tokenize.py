"""Content normalization + tokenization (the lang-keyed registry).

Analog of the reference's per-format handler registry and dispatch
(/root/reference/crates/image-deduper-core/src/processing/formats/mod.rs:1-13,
src/processing/file_processing.rs:15-41): instead of jpeg/png/tiff/heic
parsers, a ``lang``-keyed normalizer applied before shingling, plus the
corrupt-input recovery path (junk-prefix stripping, the analog of the
JPEG SOI byte-scan at src/processing/formats/jpeg.rs:34-66) and binary
sniffing (the analog of HEIC magic-byte sniffing at
src/processing/formats/heic.rs:84-110).

These functions are THE shared definition of the signature semantics:
both the distributed engine (stages/signatures.py) and the
single-process oracle (pipelines/oracle.py) call them, so dup-pair
recall vs the oracle is measured at identical shingle config
(BASELINE.md target: recall >= 0.99).
"""

from __future__ import annotations

import re

# identifiers / numbers / single punctuation marks; whitespace never
# produces a token, so whitespace-only reformatting is signature-invariant
# (the analog of JPEG-compression leaving pHash distance 0,
# processing_tests.rs:144-145).
_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|\d+|[^\w\s]")

# line-comment prefixes per language family; comment churn is then also
# signature-invariant (FIXTURES.md "compress" analog).
_LINE_COMMENT: dict[str, str] = {
    "py": "#",
    "sh": "#",
    "rb": "#",
    "js": "//",
    "ts": "//",
    "go": "//",
    "rs": "//",
    "c": "//",
    "cpp": "//",
    "java": "//",
}

# junk-prefix recovery: BOM and leading NUL/control garbage before the
# first printable character (formats/jpeg.rs:34-66 analog).
_JUNK_PREFIX_RE = re.compile(r"^[﻿\x00-\x08\x0b\x0c\x0e-\x1f]+")


_NONPRINT_RE = re.compile(r"[\x00-\x08\x0e-\x1f]")


def is_binary(content: str) -> bool:
    """Magic-byte-style sniffing (heic.rs:84-110 analog): treat content
    with embedded NULs or a high non-printable ratio as binary. One C
    substring check + one compiled-regex scan — no per-char Python."""
    if not content:
        return False
    probe = content[:4096]
    if "\x00" in probe:
        return True
    return len(_NONPRINT_RE.findall(probe)) > len(probe) * 0.3


_COMMENT_RES: dict[str, re.Pattern] = {
    p: re.compile(re.escape(p) + r"[^\n]*")
    for p in set(_LINE_COMMENT.values())
}


def normalize(content: str, lang: str) -> str:
    """Strip junk prefix and per-lang line comments (marker to EOL, one
    compiled-regex sub — C speed). Deterministic and byte-stable
    (SURVEY.md §7.4 'unicode/whitespace normalization must be
    byte-stable')."""
    content = _JUNK_PREFIX_RE.sub("", content)
    prefix = _LINE_COMMENT.get(lang)
    if prefix is None:
        return content
    return _COMMENT_RES[prefix].sub("", content)


def tokenize(content: str, lang: str) -> list[str]:
    """Normalize then tokenize. Binary-ish content returns [] — the
    caller routes such rows to the fallback signature (M8,
    file_processing.rs:182-200 analog)."""
    if is_binary(content):
        return []
    return _TOKEN_RE.findall(normalize(content, lang))
