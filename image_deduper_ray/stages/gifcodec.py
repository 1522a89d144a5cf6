"""Pure-Python GIF codec — the sixth codec-less decode branch.

The reference delegates every image decode to the ``image`` crate,
whose format surface includes GIF (the crate's reader dispatches on
magic bytes the same way our ``DecodeStage._real_decode`` does); the
reference's own format enum keeps an open tail for it
(``crates/image-deduper-core/src/types.rs:14-21`` — ``Other(String)``)
and its extension parser maps ``.gif`` through that tail
(``types.rs:24-35``). This module closes that branch without an
imaging library, from the public GIF87a/GIF89a specification only.

Scope:

- ``decode_gif``: header + logical-screen descriptor, global AND local
  color tables, extension blocks (GCE / comment / application)
  skipped, first image frame decoded — variable-width LSB-first LZW
  (width bump validated empirically against real-world GIFs: the
  decoder widens when the table length reaches ``1 << width``, capped
  at 12 bits), 4-pass interlace undone, palette-mapped to RGB.
  Truncated streams are tolerated the way real decoders (Tk, browsers)
  tolerate them: the LZW read clamps at EOF and missing trailing
  pixels pad with the background color — a real-world ``earth.gif``
  whose final sub-block runs past EOF decodes here too.
- ``encode_gif``: the synthesis/test partner — builds a palette from
  the unique pixels (≤256), optional interlace, optional local color
  table, GIF87a or GIF89a with a Graphic Control Extension.
- GIF LZW differs from the TIFF LZW already in ``multimodal.py`` in
  every convention that matters: LSB-first bit packing (TIFF is
  MSB-first), no early-change width bump (TIFF widens one code
  early), variable minimum code size (TIFF fixes 8), and 255-byte
  sub-block framing — hence a separate codec, not a flag.
- ``synth_gif_table``: deterministic VALID payloads whose decoded RGB
  bytes are exactly ``unhex(repeat(sha256('gif-i-seed'), 3))`` —
  palette indexing is lossless, so the same digest-hex ``px_sum``
  oracle the other five real-codec branches use applies unchanged.
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAX_WIDTH = 12                      # GIF LZW codes never exceed 12 bits
_TABLE_RESET = 4094                  # encoder emits Clear before overflow


def gif_lzw_decode(data: bytes, mcs: int) -> bytes:
    """Decode a GIF LZW stream (sub-block framing already removed).

    ``mcs`` is the image descriptor's LZW minimum code size. Width
    starts at ``mcs + 1`` and bumps when the table length reaches
    ``1 << width`` (empirically validated against real-world GIFs —
    the other convention desynchronizes immediately), capping at 12.
    A stream that ends mid-code returns the pixels decoded so far
    (callers decide whether short output is tolerable)."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad GIF LZW minimum code size {mcs}")
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: list[bytes] = []
    prev: bytes | None = None
    out = bytearray()
    acc = n_acc = 0
    i, n = 0, len(data)
    while True:
        while n_acc < width:
            if i >= n:                      # truncated: clamp at EOF
                return bytes(out)
            acc |= data[i] << n_acc         # LSB-first packing
            n_acc += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_acc -= width
        if code == eoi:
            return bytes(out)
        if code == clear:
            table = [bytes([j]) for j in range(1 << mcs)] + [b"", b""]
            width, prev = mcs + 1, None
            continue
        if not table:
            raise ValueError("GIF LZW stream must start with Clear")
        if prev is None:
            if code >= clear:
                raise ValueError(f"bad first GIF LZW code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < (1 << _MAX_WIDTH):
                table.append(prev + entry[:1])
        elif code == len(table):            # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(
                f"GIF LZW code {code} beyond table {len(table)}")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < _MAX_WIDTH:
            width += 1


def gif_lzw_encode(indices: bytes, mcs: int) -> bytes:
    """Encode palette indices as a GIF LZW stream (no sub-block
    framing). Emits Clear first and EOI last; the width bump mirrors
    ``gif_lzw_decode`` — checked against the table size BEFORE the
    new entry is appended, because the decoder appends its entry one
    code behind the encoder (the KwKwK asymmetry)."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad GIF LZW minimum code size {mcs}")
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = n_acc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n_acc
        acc |= code << n_acc
        n_acc += width
        while n_acc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8

    def fresh() -> tuple[dict[bytes, int], int]:
        return ({bytes([j]): j for j in range(1 << mcs)}, (1 << mcs) + 2)

    width = mcs + 1
    emit(clear, width)
    table, nxt = fresh()
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if nxt == (1 << width) and width < _MAX_WIDTH:
            width += 1                      # pre-append check: decoder parity
        table[cand] = nxt
        nxt += 1
        prefix = bytes([b])
        if nxt >= _TABLE_RESET:
            emit(table[prefix], width)
            emit(clear, width)
            width = mcs + 1
            table, nxt = fresh()
            prefix = b""
    if prefix:
        emit(table[prefix], width)
        if nxt == (1 << width) and width < _MAX_WIDTH:
            width += 1
    emit(eoi, width)
    if n_acc:
        out.append(acc & 0xFF)
    return bytes(out)


def _interlace_rows(height: int) -> np.ndarray:
    """GIF 4-pass interlace: the order rows appear in the stream."""
    return np.concatenate([np.arange(start, height, step) for start, step
                           in ((0, 8), (4, 8), (2, 4), (1, 2))])


def _skip_subblocks(payload: bytes, pos: int) -> int:
    while True:
        if pos >= len(payload):
            return pos                      # truncated extension: tolerate
        sz = payload[pos]
        pos += 1 + sz
        if sz == 0:
            return pos


def decode_gif(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode the first frame of a GIF87a/GIF89a payload to RGB.

    Returns ``(width, height, pixels)`` with ``pixels`` shaped
    ``(height, width, 3)`` uint8 — palette-mapped, interlace undone.
    Transparency is ignored (the frame's palette RGB is authoritative
    for content hashing). Truncated pixel data pads with the
    background color, matching real-decoder tolerance."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a magic)")
    if len(payload) < 13:
        raise ValueError("GIF truncated in logical screen descriptor")
    packed, bg_idx = payload[10], payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 0x07)
        if pos + ncol * 3 > len(payload):
            raise ValueError("GIF truncated in global color table")
        gct = np.frombuffer(payload, np.uint8, ncol * 3,
                            pos).reshape(ncol, 3)
        pos += ncol * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:                   # trailer
            break
        if block == 0x21:                   # extension: label + sub-blocks
            pos = _skip_subblocks(payload, pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("GIF truncated in image descriptor")
        _l, _t, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = gct
        if ipacked & 0x80:                  # local color table
            ncol = 2 << (ipacked & 0x07)
            if pos + ncol * 3 > len(payload):
                raise ValueError("GIF truncated in local color table")
            pal = np.frombuffer(payload, np.uint8, ncol * 3,
                                pos).reshape(ncol, 3)
            pos += ncol * 3
        if pal is None:
            raise ValueError("GIF image has no color table")
        if iw == 0 or ih == 0:
            raise ValueError("GIF image has zero dimension")
        if pos >= len(payload):
            raise ValueError("GIF truncated before LZW code size")
        mcs = payload[pos]
        pos += 1
        chunks = []
        while pos < len(payload):           # clamp at EOF: tolerance
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            chunks.append(payload[pos:pos + sz])
            pos += sz
        idx = np.frombuffer(gif_lzw_decode(b"".join(chunks), mcs),
                            np.uint8)
        n_px = iw * ih
        if idx.size < n_px:                 # truncated frame: pad with bg
            fill = bg_idx if bg_idx < len(pal) else 0
            idx = np.concatenate(
                [idx, np.full(n_px - idx.size, fill, np.uint8)])
        idx = idx[:n_px]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF index beyond color table")
        grid = idx.reshape(ih, iw)
        if ipacked & 0x40:                  # interlaced: undo 4-pass order
            out = np.empty_like(grid)
            out[_interlace_rows(ih)] = grid
            grid = out
        return int(iw), int(ih), pal[grid]
    raise ValueError("GIF has no image descriptor")


def encode_gif(pixels: np.ndarray, *, interlace: bool = False,
               local_palette: bool = False, version: bytes = b"GIF89a",
               with_gce: bool = False) -> bytes:
    """Encode an RGB uint8 image (h, w, 3) with ≤256 unique colors.

    The palette lists unique colors in first-appearance (row-major)
    order, padded to the next power of two ≥ 4 (GIF's minimum LZW code
    size is 2). ``local_palette`` moves the table from the logical
    screen to the image descriptor; ``with_gce`` prepends a Graphic
    Control Extension (exercises the decoder's extension skipping)."""
    px = np.ascontiguousarray(pixels, np.uint8)
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF needs ≤256 colors, got {len(colors)}")
    # np.unique sorts; remap to first-appearance order for determinism
    # that is independent of the sort
    first = np.full(len(colors), len(flat), np.int64)
    np.minimum.at(first, inverse, np.arange(len(flat)))
    order = np.argsort(first, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    palette = colors[order]
    indices = rank[inverse].astype(np.uint8)
    size_bits = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    pal_bytes = palette.tobytes() + b"\x00" * 3 * (
        (1 << size_bits) - len(palette))
    mcs = size_bits

    out = bytearray(version)
    lsd_packed = (0x80 | (size_bits - 1)) if not local_palette else 0
    out += struct.pack("<HHBBB", w, h, lsd_packed, 0, 0)
    if not local_palette:
        out += pal_bytes
    if with_gce:
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"      # no-op GCE
        out += b"\x21\xfe\x05synth\x00"                 # comment ext
    ipacked = (0x80 | (size_bits - 1)) if local_palette else 0
    if interlace:
        ipacked |= 0x40
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local_palette:
        out += pal_bytes
    grid = indices.reshape(h, w)
    if interlace:
        grid = grid[_interlace_rows(h)]
    lzw = gif_lzw_encode(grid.tobytes(), mcs)
    out.append(mcs)
    for off in range(0, len(lzw), 255):
        chunk = lzw[off:off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def synth_gif_table(n: int = 64, seed: int = 42,
                    width: int = 8, height: int = 4):
    """Deterministic VALID GIFs for the real-decode branch: decoded RGB
    bytes are exactly ``unhex(repeat(sha256('gif-i-seed'), 3))`` so the
    shared digest-hex ``px_sum`` oracle applies unchanged (palette
    mapping is lossless). Variants cycle by media_id — GIF89a + GCE /
    GIF87a bare, global / local color table, sequential / 4-pass
    interlaced — so every decoder branch is driver-exercised."""
    import pyarrow as pa

    from .multimodal import MEDIA_SCHEMA

    n_px_bytes = width * height * 3
    assert n_px_bytes % 32 == 0
    repeats = n_px_bytes // 32
    rows = []
    for i in range(n):
        hx = hashlib.sha256(f"gif-{i}-{seed}".encode()).hexdigest() * repeats
        px = np.frombuffer(bytes.fromhex(hx), np.uint8) \
            .reshape(height, width, 3)
        rows.append(encode_gif(
            px,
            interlace=bool(i % 2),
            local_palette=bool((i // 2) % 2),
            version=b"GIF87a" if (i // 4) % 2 else b"GIF89a",
            with_gce=(i // 4) % 2 == 0))
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(["image"] * n, pa.string()),
        "payload": pa.array(rows, pa.binary()),
        "meta": pa.array(['{"claimed": "gif"}'] * n, pa.string()),
    }, schema=MEDIA_SCHEMA)
