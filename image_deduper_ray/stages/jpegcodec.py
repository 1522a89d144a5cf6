"""Pure-Python baseline JPEG (JFIF) codec — the fifth codec-less
real-format branch.

The reference's most-exercised format path is JPEG
(crates/image-deduper-core/src/processing/formats/jpeg.rs:8-31),
including a corruption-recovery scan that hunts for the 0xFFD8 SOI
marker inside damaged payloads and retries the decode from there
(jpeg.rs:34-66). The reference delegates the actual decode to the
``image`` crate; this module implements baseline sequential DCT
(ITU-T.81) from the public spec so the branch runs with no imaging
library at all, mirroring the PNG/TIFF/PPM built-ins in
``multimodal.py``:

- ``decode_jpeg``: markers (SOI/APPn/COM/DQT/SOF0/SOF1/DHT/DRI/SOS/
  EOI), canonical Huffman tables from DHT, byte-unstuffed entropy
  scan with restart-marker segments, DC prediction + AC run-length,
  dequant + dezigzag, one vectorized numpy IDCT per component,
  chroma upsampling for any (h,v) in {1,2}^2 (4:4:4 / 4:2:2 / 4:2:0),
  JFIF YCbCr->RGB. Grayscale replicates to 3 channels so every
  decoder in the registry returns (h, w, 3) uint8.
- ``encode_jpeg``: the synthesis/test partner (flat-quant default).
  With unit quant tables and per-8x8-flat luma the roundtrip is
  BIT-EXACT (a flat block has only a DC coefficient, stored as the
  integer 8*(v-128)), which is what makes the lossy format
  digest-hex oracle-able: ``synth_jpeg_table`` payloads decode to
  exactly the sha256 bytes they were built from.
- ``decode_jpeg_recover``: the jpeg.rs:34-66 analog — try the direct
  decode, then scan for embedded 0xFFD8 candidates and retry from
  each; callers fall back to the M8 fallback-hash discipline when
  nothing decodes.

Entropy decode is a sequential bit-level loop by definition (every
Huffman symbol's length depends on the previous ones) — the stage is
batch-parallel across payloads like the PNG Paeth path, and the
IDCT / upsample / color-convert steps are vectorized numpy.
"""

from __future__ import annotations

import hashlib

import numpy as np

# ---------------------------------------------------------------- tables

def _zigzag() -> np.ndarray:
    """ZZ[k] = row-major flat index of the k-th zigzag coefficient."""
    out = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(7, s) + 1)]
        if s % 2 == 0:                  # even diagonals run bottom-left up
            diag = diag[::-1]
        out.extend(r * 8 + c for r, c in diag)
    return np.array(out, np.int64)


_ZZ = _zigzag()

# orthonormal 8-point DCT-II basis: M[u,x] = c(u)/2 * cos((2x+1)u*pi/16)
# with c(0)=1/sqrt(2); forward S = M s M^T, inverse s = M^T S M
_DCT_M = np.array([[((1 / np.sqrt(2)) if u == 0 else 1.0) / 2.0
                    * np.cos((2 * x + 1) * u * np.pi / 16)
                    for x in range(8)] for u in range(8)])

# example Huffman tables from the public JPEG spec (Annex K) — the
# encoder writes these into DHT, the decoder always reads DHT, so the
# codec never depends on them being hardwired on the read side
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _build_decode_table(bits: list[int], vals: list[int]
                        ) -> dict[tuple[int, int], int]:
    """Canonical Huffman assignment: {(length, code) -> symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    if k != len(vals):
        raise ValueError("DHT counts do not match value list length")
    return table


def _build_encode_table(bits: list[int], vals: list[int]
                        ) -> dict[int, tuple[int, int]]:
    """{symbol -> (code, length)} — inverse of the decode table."""
    return {v: (c, l) for (l, c), v in
            _build_decode_table(bits, vals).items()}


# ---------------------------------------------------------------- decoder

class _BitReader:
    """MSB-first bit reader over one byte-unstuffed entropy segment."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def bit(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise ValueError("JPEG entropy data truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.bits(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _entropy_segments(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the scan's entropy data on restart markers, unstuffing
    FF00 -> FF. Returns (segments, position of the terminating marker's
    FF byte)."""
    segs, cur = [], bytearray()
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            break
        m = payload[pos + 1]
        if m == 0x00:                   # stuffed FF
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:         # RSTn: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:                           # real marker ends the scan
            break
    segs.append(bytes(cur))
    return segs, pos


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline sequential JFIF decode. Returns (width, height,
    (h, w, 3) uint8 RGB). Raises ValueError on anything that is not a
    well-formed baseline JPEG (progressive, 12-bit, arithmetic coding,
    >2 sampling factors, truncation...)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI marker)")
    pos = 2
    n = len(payload)
    qt: dict[int, np.ndarray] = {}      # id -> 64 ints, zigzag order
    huff: dict[tuple[int, int], dict] = {}   # (class, id) -> decode table
    frame = None                        # (h, w, comps)
    restart_interval = 0
    segs = None

    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while pos < n and payload[pos] == 0xFF:
            pos += 1                    # fill bytes are legal
        if pos >= n:
            raise ValueError("JPEG truncated at marker")
        marker = payload[pos]
        pos += 1
        if marker == 0xD9:              # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                    # standalone markers
        if pos + 2 > n:
            raise ValueError("JPEG segment length truncated")
        seglen = int.from_bytes(payload[pos:pos + 2], "big")
        body = payload[pos + 2:pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("JPEG segment body truncated")
        pos += seglen

        if marker == 0xDB:              # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body[i:i + 64], np.uint8)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i:i + 128],
                                        ">u2")
                    i += 128
                if len(tbl) != 64:
                    raise ValueError("JPEG DQT truncated")
                qt[tq] = tbl.astype(np.int64)
        elif marker in (0xC0, 0xC1):    # SOF0/1: baseline huffman
            if body[0] != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError("only 1- or 3-component JPEG supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
                if not (1 <= comps[-1]["h"] <= 2
                        and 1 <= comps[-1]["v"] <= 2):
                    raise ValueError("unsupported JPEG sampling factor")
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xC4:            # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("JPEG DHT truncated")
                huff[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:            # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:            # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                comp = next((x for x in frame[2] if x["id"] == cs), None)
                if comp is None:
                    raise ValueError("JPEG scan names unknown component")
                scan.append((comp, tdta >> 4, tdta & 15))
            segs, pos = _entropy_segments(payload, pos)
            break                       # single-scan baseline
        # APPn / COM / others with length: skipped

    if frame is None or segs is None:
        raise ValueError("JPEG missing SOF or SOS")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("JPEG has zero dimension")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    # per-component coefficient store, zigzag order, filled MCU by MCU
    coef = [np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
            for c in comps]

    seg_i = 0
    br = _BitReader(segs[0])
    preds = [0] * len(scan)
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_i += 1                  # RSTn: next segment, reset DC
            if seg_i >= len(segs):
                raise ValueError("JPEG missing restart segment")
            br = _BitReader(segs[seg_i])
            preds = [0] * len(scan)
        my, mx = divmod(m, mcus_x)
        for ci, (comp, td, ta) in enumerate(scan):
            dctab = huff.get((0, td))
            actab = huff.get((1, ta))
            if dctab is None or actab is None:
                raise ValueError("JPEG scan uses undefined Huffman table")
            idx = comps.index(comp)
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    s = br.huff(dctab)
                    preds[ci] += br.receive_extend(s)
                    blk = coef[idx][my * comp["v"] + by,
                                    mx * comp["h"] + bx]
                    blk[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = br.huff(actab)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break       # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overrun")
                        blk[k] = br.receive_extend(s)
                        k += 1

    # dequant + dezigzag + IDCT + upsample: vectorized per component
    planes = []
    for idx, comp in enumerate(comps):
        q = qt.get(comp["tq"])
        if q is None:
            raise ValueError("JPEG component uses undefined quant table")
        by, bx, _ = coef[idx].shape
        zz = coef[idx].reshape(-1, 64).astype(np.float64) * q
        nat = np.empty_like(zz)
        nat[:, _ZZ] = zz
        blocks = nat.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT_M, blocks, _DCT_M)
        plane = spatial.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(by * 8, bx * 8) + 128.0
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], axis=0),
                          hmax // comp["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        g = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return w, h, np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return w, h, np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def decode_jpeg_recover(payload: bytes) -> tuple[int, int, np.ndarray]:
    """The reference's corrupt-JPEG recovery (jpeg.rs:34-66): try the
    direct decode; on failure scan the payload for 0xFFD8 SOI
    candidates and retry the decode from each offset (garbage prefixes
    from truncated copies / filesystem damage are the common corpus
    case). Raises ValueError when no offset decodes — callers then
    apply the M8 fallback-hash discipline, like the reference's
    generate_fallback_hash."""
    try:
        return decode_jpeg(payload)
    except ValueError:
        pass
    start = 0
    tried = 0
    while tried < 64:                   # bounded: 64 candidate SOIs
        i = payload.find(b"\xff\xd8", start + 1)
        if i < 0:
            break
        tried += 1
        start = i
        try:
            return decode_jpeg(payload[i:])
        except ValueError:
            continue
    raise ValueError("JPEG recovery failed: no decodable SOI offset")


# ---------------------------------------------------------------- encoder

class _BitWriter:
    """MSB-first bit writer with FF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nacc += length
        while self.nacc >= 8:
            b = (self.acc >> (self.nacc - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nacc -= 8
        self.acc &= (1 << self.nacc) - 1

    def flush(self) -> bytes:
        if self.nacc:
            self.write(0xFF, 8 - self.nacc)    # pad with 1-bits
        return bytes(self.out)


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    """Huffman-encode one quantized block (zigzag order); returns the
    new DC predictor."""
    diff = int(zz[0]) - pred
    s = int(diff).bit_length() if diff else 0
    if s > 11:
        raise ValueError("JPEG DC difference out of baseline range")
    code, length = dc_tab[s]
    bw.write(code, length)
    if s:
        v = diff if diff > 0 else diff + (1 << s) - 1
        bw.write(v, s)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        a = int(zz[k])
        if a == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]         # ZRL
            bw.write(code, length)
            run -= 16
        s = abs(a).bit_length()
        if s > 10:
            raise ValueError("JPEG AC coefficient out of baseline-table "
                             "range — use coarser quant tables")
        code, length = ac_tab[(run << 4) | s]
        bw.write(code, length)
        v = a if a > 0 else a + (1 << s) - 1
        bw.write(v, s)
        run = 0
    if last_nz < 63:
        code, length = ac_tab[0x00]             # EOB
        bw.write(code, length)
    return int(zz[0])


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane -> (H/8 * W/8, 64) int32 quantized zigzag."""
    hh, ww = plane.shape
    blocks = plane.reshape(hh // 8, 8, ww // 8, 8) \
        .transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
    coef = np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M)
    zz = coef.reshape(-1, 64)[:, _ZZ]
    return np.rint(zz / q).astype(np.int32)


def encode_jpeg(pixels: np.ndarray, *, subsampling: str = "444",
                quant: tuple[np.ndarray, np.ndarray] | None = None,
                restart_interval: int = 0,
                ycbcr: bool = False) -> bytes:
    """Baseline JFIF writer — the synthesis/roundtrip partner of
    ``decode_jpeg`` (like ``encode_png``/``encode_tiff_rgb``), not a
    general imaging tool: dimensions must be MCU-aligned (8, or 16 on
    subsampled axes). ``pixels`` is (h, w) / (h, w, 1) grayscale or
    (h, w, 3); with ``ycbcr=True`` a 3-channel input is taken as
    already-YCbCr planes (the synth tables use flat neutral chroma so
    the decode is arithmetic-exact). Default quant tables are all-ones,
    which makes per-8x8-flat content roundtrip bit-exactly."""
    px = np.asarray(pixels)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be 444, 422 or 420")
    ch = 2 if subsampling in ("422", "420") else 1
    cv = 2 if subsampling == "420" else 1
    if gray:
        ch = cv = 1
    if h % (8 * cv) or w % (8 * ch):
        raise ValueError("encode_jpeg requires MCU-aligned dimensions")

    ql = np.ones(64, np.int64) if quant is None else \
        np.asarray(quant[0], np.int64).reshape(64)
    qc = np.ones(64, np.int64) if quant is None else \
        np.asarray(quant[1], np.int64).reshape(64)

    if gray:
        planes = [px.astype(np.float64)]
    else:
        p = px.astype(np.float64)
        if ycbcr:
            y, cb, cr = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        else:
            r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
            cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        # chroma subsampling: box average over the sampling window
        cb = cb.reshape(h // cv, cv, w // ch, ch).mean(axis=(1, 3))
        cr = cr.reshape(h // cv, cv, w // ch, ch).mean(axis=(1, 3))
        planes = [y, cb, cr]

    # quantized zigzag blocks per component
    zz = [_fdct_quant(planes[0], ql)]
    if not gray:
        zz += [_fdct_quant(planes[1], qc), _fdct_quant(planes[2], qc)]

    dc_l = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") \
            + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(ql.astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc.astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    sof += bytes([1, (ch << 4) | cv, 0])
    if not gray:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA_BITS)
               + bytes(_DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA_BITS)
               + bytes(_AC_LUMA_VALS))
    if not gray:
        out += seg(0xC4, bytes([0x01]) + bytes(_DC_CHROMA_BITS)
                   + bytes(_DC_CHROMA_VALS))
        out += seg(0xC4, bytes([0x11]) + bytes(_AC_CHROMA_BITS)
                   + bytes(_AC_CHROMA_VALS))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    out += seg(0xDA, sos + bytes([0, 63, 0]))

    mcus_x, mcus_y = w // (8 * ch), h // (8 * cv)
    lum_bx = w // 8                     # luma blocks per row
    chroma_bx = w // (8 * ch)
    bw = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            out += bw.flush()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for by in range(cv):
            for bx in range(ch):
                bi = (my * cv + by) * lum_bx + (mx * ch + bx)
                preds[0] = _encode_block(bw, zz[0][bi], preds[0],
                                         dc_l, ac_l)
        if not gray:
            bi = my * chroma_bx + mx
            preds[1] = _encode_block(bw, zz[1][bi], preds[1], dc_c, ac_c)
            preds[2] = _encode_block(bw, zz[2][bi], preds[2], dc_c, ac_c)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------- synth table

def synth_jpeg_table(n: int = 64, seed: int = 42):
    """Deterministic VALID baseline JPEGs whose decode is BIT-EXACT and
    digest-hex oracle-able despite the lossy format: every 8x8 luma
    block is FLAT at one sha256 digest byte (a flat block has only a DC
    coefficient, an exact integer under unit quant tables), and color
    variants carry flat NEUTRAL chroma (Cb=Cr=128: subsampling averages
    128 to 128, and YCbCr->RGB degenerates to R=G=B=Y exactly). Decoded
    pixels are therefore the 32 digest bytes as an 8x4 grid of 8x8
    tiles (64x32 px), replicated over 3 channels:
    ``px_sum = 3 * 64 * sum(digest bytes)``.

    Variants cycle by media_id so the driver exercises every decoder
    path: grayscale / color 4:4:4 / color 4:2:0 / color 4:2:0 with
    restart markers; every 8th payload gets a garbage PREFIX (the
    reference's corrupt-JPEG case, jpeg.rs:34-66) so the 0xFFD8
    scan-and-retry recovery is driver-gated too."""
    import pyarrow as pa

    from .multimodal import MEDIA_SCHEMA

    rows = []
    for i in range(n):
        digest = hashlib.sha256(f"jpeg-{i}-{seed}".encode()).digest()
        tiles = np.frombuffer(digest, np.uint8).reshape(4, 8)
        y = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)  # 32 x 64
        variant = i % 4
        if variant == 0:
            payload = encode_jpeg(y)
        else:
            ycc = np.stack([y, np.full_like(y, 128),
                            np.full_like(y, 128)], axis=2)
            payload = encode_jpeg(
                ycc, ycbcr=True,
                subsampling="444" if variant == 1 else "420",
                restart_interval=3 if variant == 3 else 0)
        if i % 8 == 0:                  # corrupt prefix: recovery path
            payload = b"\x00corrupt-prefix\x01\x02" + payload
        rows.append(payload)
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(["image"] * n, pa.string()),
        "payload": pa.array(rows, pa.binary()),
        "meta": pa.array(['{"claimed": "jpeg"}'] * n, pa.string()),
    }, schema=MEDIA_SCHEMA)
