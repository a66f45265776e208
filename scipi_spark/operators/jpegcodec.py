"""Pure-numpy baseline JPEG (ITU-T T.81 / ISO 10918-1) codec — no
codec library, no C extension: an encoder and decoder for baseline
sequential DCT, 8-bit, Huffman-coded JPEG/JFIF streams.

Scope (the baseline profile every camera/browser JPEG uses):

- encode: RGB (or single-channel grayscale) -> JFIF with 4:4:4,
  4:2:2 or 4:2:0 chroma subsampling, quality-scaled quantization tables (the
  IJG 0-100 quality curve over the Annex K example luminance/
  chrominance tables), level shift + 8x8 forward DCT (exact float64
  matrix form), zigzag, DC-difference + AC run-length entropy coding,
  byte stuffing, and self-contained DHT segments.
- decode: full marker parse (SOI/APP*/COM skipped, DQT/SOF0/DHT/SOS/
  DRI honored), canonical Huffman reconstruction FROM THE STREAM'S OWN
  DHT (so any spec-valid table decodes, not just ours), entropy decode
  incl. restart markers, dequantize, inverse zigzag, IDCT, chroma
  upsample by block replication, YCbCr->RGB with clipping.

Huffman tables: rather than transcribing the (public) Annex K example
code tables, the encoder BUILDS canonical tables — all DC symbols at
4 bits, all AC symbols at 8 bits — which are spec-valid (no all-ones
code is assigned) and embedded in DHT segments like any other JPEG's.
The decoder never assumes them: it reconstructs whatever DHT declares,
exactly as it must for foreign files. Compression is a few percent
worse than the optimized Annex K tables; correctness is identical.

Exactness model (what the driver gate pins): JPEG is lossy, but the
loss is fully characterized — for an image that is CONSTANT within
each 8x8 block (16x16 macroblock under 4:2:0) with neutral chroma,
every AC coefficient quantizes to zero and the reconstruction error is
exactly the DC quantization error; at quality 75 the luma DC step is
8 = the DC scaling factor, so such images round-trip BIT-EXACTLY
(``tests/test_io_multimodal.py`` also bounds the general-image error).
Reference behavior being re-expressed: the reference engine's image
ingestion treats JPEG via a codec library (out of container here);
this is the zero-dependency stand-in with a real bitstream.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: quant tables, zigzag, DCT basis
# ---------------------------------------------------------------------------

#: Annex K.1/K.2 example quantization tables (public spec constants)
_QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

_QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _zigzag_order() -> np.ndarray:
    """Generate the 8x8 zigzag scan order programmatically (no typo
    surface): entries sorted by anti-diagonal, alternating direction —
    even diagonals run bottom-left -> top-right."""
    order = []
    for s in range(15):
        diag = [(u, s - u) for u in range(8) if 0 <= s - u < 8]
        if s % 2 == 0:
            diag.reverse()  # even: row decreasing (up-right)
        order.extend(diag)
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_ZIGZAG = _zigzag_order()  # flat index of the k-th zigzag element
_UNZIGZAG = np.argsort(_ZIGZAG)

# Orthonormal DCT-II basis: block_dct = C @ B @ C.T
_DCT_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _DCT_C[_u, _x] = np.sqrt((1 if _u else 0.5) / 4.0) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling (the libjpeg-compatible 1-100 curve) of the
    Annex K tables -> (luma, chroma) int tables clamped to [1, 255].
    quality=75 yields a luma DC step of exactly 8 — the DC scaling
    factor — which is what makes block-constant fixtures round-trip
    bit-exactly (module docstring)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    luma = np.clip((_QUANT_LUMA * scale + 50) // 100, 1, 255)
    chroma = np.clip((_QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return luma, chroma


# ---------------------------------------------------------------------------
# Huffman tables (canonical, fixed-length codes — see module docstring)
# ---------------------------------------------------------------------------

#: DC symbols = size categories 0..11; AC symbols = (run<<4)|size for
#: run 0..15, size 1..10, plus 0x00 (EOB) and 0xF0 (ZRL)
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """(BITS counts-per-length, HUFFVAL symbol list) -> symbol ->
    (code, length), per the spec's canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _fixed_table(symbols: list[int], length: int) -> tuple[list[int], list[int]]:
    """All-same-length canonical table (spec-valid: the all-ones code
    is never assigned because len(symbols) < 2^length)."""
    if len(symbols) >= (1 << length):
        raise ValueError("too many symbols for fixed code length")
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, list(symbols)


_DC_BITS, _DC_VALS = _fixed_table(_DC_SYMBOLS, 4)
_AC_BITS, _AC_VALS = _fixed_table(_AC_SYMBOLS, 8)
_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)

# progressive AC alphabet: the baseline symbols plus EOBn (r<<4, size 0
# for r = 1..14) — the end-of-band RUN codes spectral-selection scans
# use to skip whole all-zero-band block runs in O(1) bits
_AC_SYMBOLS_PROG = (
    [0x00, 0xF0]
    + [r << 4 for r in range(1, 15)]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_AC_BITS_PROG, _AC_VALS_PROG = _fixed_table(_AC_SYMBOLS_PROG, 8)
_AC_CODES_PROG = _canonical_codes(_AC_BITS_PROG, _AC_VALS_PROG)


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (0xFF -> 0xFF
    0x00) and a 1-padded flush."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int) -> None:
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def restart(self, n: int) -> None:
        """Pad to a byte boundary with 1-bits and emit RSTn (raw marker
        bytes, never stuffed)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (n & 7)])

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


def _size_cat(v: int) -> int:
    """DC/AC size category: bit length of |v| (0 for v == 0)."""
    return int(abs(v)).bit_length()


def _amplitude(v: int, size: int) -> int:
    """JPEG signed-amplitude encoding: negatives are stored in ones'
    complement of |v| within ``size`` bits."""
    return v if v >= 0 else v + (1 << size) - 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> float64 Y/Cb/Cr planes (JFIF full-range
    BT.601)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(h, w) -> (n_blocks_y, n_blocks_x, 8, 8), edge-padded by
    replication to multiples of 8."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)


def _encode_blocks(
    writer: _BitWriter, blocks: np.ndarray, quant: np.ndarray, prev_dc: int
) -> int:
    """Entropy-encode a sequence of (8, 8) pixel blocks (already level
    shifted): forward DCT, quantize, zigzag, DC diff + AC run-length.
    Returns the updated DC predictor."""
    for block in blocks:
        coef = _DCT_C @ block @ _DCT_C.T
        qc = np.round(coef / quant).astype(np.int64)
        zz = qc.ravel()[_ZIGZAG]
        diff = int(zz[0]) - prev_dc
        prev_dc = int(zz[0])
        size = _size_cat(diff)
        code, width = _DC_CODES[size]
        writer.write(code, width)
        if size:
            writer.write(_amplitude(diff, size), size)
        nz = np.nonzero(zz[1:])[0]
        pos = 1
        for idx in nz:
            k = int(idx) + 1
            run = k - pos
            while run >= 16:
                code, width = _AC_CODES[0xF0]  # ZRL: 16 zeros
                writer.write(code, width)
                run -= 16
            v = int(zz[k])
            size = _size_cat(v)
            code, width = _AC_CODES[(run << 4) | size]
            writer.write(code, width)
            writer.write(_amplitude(v, size), size)
            pos = k + 1
        if pos <= 63:
            code, width = _AC_CODES[0x00]  # EOB
            writer.write(code, width)
    return prev_dc


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(v) for v in table.ravel()[_ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) RGB or (h, w)/(h, w, 1) grayscale uint8 -> baseline
    JFIF bytes. ``subsampling``: "444" (full chroma), "422" (2x1) or "420"
    (2x2 chroma decimation by block mean — no dimension requirement;
    edges are replication-padded). Grayscale input emits a
    single-component scan. ``restart_interval`` > 0 emits a DRI segment
    and an RSTn marker (with DC-predictor reset) every that many MCUs —
    the error-resilience feature real encoders use so a corrupted scan
    only loses one restart span."""
    arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2 or arr.shape[-1] == 1
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError(f"expected (h, w, 1|3), got {arr.shape}")
    if subsampling not in ("444", "422", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = arr.shape[:2]
    # chroma decimation factors: (horizontal, vertical)
    sx = 1 if subsampling == "444" else 2
    sy = 2 if subsampling == "420" else 1
    luma_q, chroma_q = quality_tables(quality)
    if gray:
        planes = [arr[..., 0].astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        if sx > 1 or sy > 1:
            for c in (1, 2):
                p = planes[c]
                ph, pw = -(-h // sy) * sy, -(-w // sx) * sx
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                planes[c] = (
                    p.reshape(ph // sy, sy, pw // sx, sx).mean(axis=(1, 3))
                )
    n_comp = 1 if gray else 3
    hy, vy = (1, 1) if gray else (sx, sy)  # Y sampling factors

    out = bytearray(b"\xff\xd8")  # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    out += _dqt_segment(0, luma_q)
    if not gray:
        out += _dqt_segment(1, chroma_q)
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    sof += bytes([1, (hy << 4) | vy, 0])  # Y: id, HxV sampling, quant 0
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALS)
    out += _dht_segment(1, 0, _AC_BITS, _AC_VALS)
    if not gray:
        out += _dht_segment(0, 1, _DC_BITS, _DC_VALS)
        out += _dht_segment(1, 1, _AC_BITS, _AC_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([n_comp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    blocks = [_blockify(p - 128.0) for p in planes]
    writer = _BitWriter()
    dc = [0, 0, 0]
    n_mcu = 0
    rst = 0

    def maybe_restart() -> bool:
        nonlocal n_mcu, rst
        fire = restart_interval and n_mcu and n_mcu % restart_interval == 0
        if fire:
            writer.restart(rst)
            rst = (rst + 1) & 7
        n_mcu += 1
        return bool(fire)

    if gray:
        by, bx = blocks[0].shape[:2]
        for block in blocks[0].reshape(by * bx, 8, 8):
            if maybe_restart():
                dc[0] = 0
            dc[0] = _encode_blocks(writer, block[None], luma_q, dc[0])
    else:
        # MCU order: interleaved components, Y blocks raster-within-MCU
        cb_blocks, cr_blocks = blocks[1], blocks[2]
        yb = blocks[0]
        mcu_y, mcu_x = cb_blocks.shape[:2]
        # pad Y block grid to sampling-factor multiples (replicate edge)
        need_y, need_x = mcu_y * vy, mcu_x * hy
        if yb.shape[0] < need_y or yb.shape[1] < need_x:
            yb = np.pad(
                yb,
                (
                    (0, need_y - yb.shape[0]),
                    (0, need_x - yb.shape[1]),
                    (0, 0),
                    (0, 0),
                ),
                mode="edge",
            )
        for my in range(mcu_y):
            for mx in range(mcu_x):
                if maybe_restart():
                    dc = [0, 0, 0]
                ys = [
                    yb[my * vy + dy, mx * hy + dx]
                    for dy in range(vy)
                    for dx in range(hy)
                ]
                dc[0] = _encode_blocks(writer, np.stack(ys), luma_q, dc[0])
                dc[1] = _encode_blocks(
                    writer, cb_blocks[my, mx][None], chroma_q, dc[1]
                )
                dc[2] = _encode_blocks(
                    writer, cr_blocks[my, mx][None], chroma_q, dc[2]
                )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (SOF2)
# ---------------------------------------------------------------------------


def _sos_segment(comps: list[tuple[int, int, int]], ss: int, se: int,
                 ah: int, al: int) -> bytes:
    """SOS header for one progressive scan: ``comps`` =
    [(component_id, dc_table, ac_table)], plus the spectral band
    (Ss..Se) and successive-approximation bit positions (Ah, Al)."""
    body = bytes([len(comps)])
    for cid, tdc, tac in comps:
        body += bytes([cid, (tdc << 4) | tac])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


def _enc_ac_first(
    writer: _BitWriter, blocks: list[np.ndarray], ss: int, se: int, al: int
) -> None:
    """First AC scan of one component (spec G.1.2.2): band Ss..Se of
    each block at point transform Al (AC divides toward zero), with
    EOB RUNS — consecutive all-zero-band blocks collapse into one EOBn
    symbol + extension bits instead of one EOB each."""
    eobrun = 0

    def flush_eobrun() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, width = _AC_CODES_PROG[r << 4]
            writer.write(code, width)
            if r:
                writer.write(eobrun - (1 << r), r)
            eobrun = 0

    for zz in blocks:
        band = [int(v) // (1 << al) if v >= 0 else -((-int(v)) >> al)
                for v in zz[ss : se + 1]]
        nz = [i for i, v in enumerate(band) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eobrun()
            continue
        flush_eobrun()
        pos = 0
        for i in nz:
            run = i - pos
            while run >= 16:
                code, width = _AC_CODES_PROG[0xF0]
                writer.write(code, width)
                run -= 16
            v = band[i]
            size = _size_cat(v)
            code, width = _AC_CODES_PROG[(run << 4) | size]
            writer.write(code, width)
            writer.write(_amplitude(v, size), size)
            pos = i + 1
        if pos <= se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eobrun()
    flush_eobrun()


def _enc_ac_refine(
    writer: _BitWriter, blocks: list[np.ndarray], ss: int, se: int, al: int
) -> None:
    """AC successive-approximation refinement scan (spec G.1.2.3 /
    libjpeg ``encode_mcu_AC_refine``): newly-significant coefficients
    (|coef| >> Al == 1) are coded as run/size-1 symbols with a sign
    bit; already-significant ones contribute one raw correction bit
    each, buffered and appended after the next symbol (or the EOBn
    that closes a run of symbol-free blocks)."""
    eobrun = 0
    pending: list[int] = []  # correction bits riding the open EOB run

    def flush_eobrun() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, width = _AC_CODES_PROG[r << 4]
            writer.write(code, width)
            if r:
                writer.write(eobrun - (1 << r), r)
        eobrun = 0
        for b in pending:
            writer.write(b, 1)
        pending.clear()

    for zz in blocks:
        band = [int(v) for v in zz[ss : se + 1]]
        t = [abs(v) >> al for v in band]
        # EOB position: past the LAST newly-significant coefficient —
        # correction bits beyond it ride the EOB run
        eob = 0
        for i, ti in enumerate(t):
            if ti == 1:
                eob = i + 1
        run = 0
        br: list[int] = []  # correction bits since the last symbol
        emitted = False
        for i in range(len(band)):
            if t[i] == 0:
                run += 1
                continue
            # ZRL flush sits BEFORE the t>1 branch (libjpeg
            # encode_mcu_AC_refine): the decoder's ZRL walk consumes
            # exactly 16 zero-HISTORY positions, so a correction bit
            # whose position lies beyond that span must be emitted
            # after a LATER symbol — flushing only at newly-significant
            # coefficients would misplace it and desync the stream
            while run > 15 and i < eob:
                flush_eobrun()
                code, width = _AC_CODES_PROG[0xF0]
                writer.write(code, width)
                run -= 16
                for b in br:
                    writer.write(b, 1)
                br.clear()
            if t[i] > 1:  # already significant: one correction bit
                br.append(t[i] & 1)
                continue
            # newly significant (t == 1; i < eob by construction)
            flush_eobrun()
            code, width = _AC_CODES_PROG[(run << 4) | 1]
            writer.write(code, width)
            writer.write(1 if band[i] > 0 else 0, 1)
            for b in br:
                writer.write(b, 1)
            br.clear()
            run = 0
            emitted = True
        if run > 0 or br or not emitted:
            # trailing zeros / correction bits (or a symbol-free block)
            # ride the EOB run; their bits flush with its EOBn symbol
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFE or len(pending) > 900:
                flush_eobrun()
    flush_eobrun()


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 75) -> bytes:
    """(h, w, 3) RGB or (h, w)/(h, w, 1) grayscale uint8 -> PROGRESSIVE
    (SOF2) JFIF bytes, 4:4:4 chroma. The scan script exercises every
    progressive mechanism a real libjpeg file uses: an interleaved DC
    first scan at Al=1, spectral-selection AC first scans (luma split
    into 1-5 / 6-63 bands, chroma 1-63) at Al=1 with EOB runs, a DC
    refinement scan, and AC successive-approximation refinement scans
    down to Al=0. All coefficient bits are eventually transmitted, so
    decoding reproduces exactly the baseline-encode pixels for the same
    quantized coefficients (progressive is a lossless reordering of the
    entropy layer)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2 or arr.shape[-1] == 1
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError(f"expected (h, w, 1|3), got {arr.shape}")
    h, w = arr.shape[:2]
    luma_q, chroma_q = quality_tables(quality)
    if gray:
        planes = [arr[..., 0].astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    n_comp = len(planes)
    quants = [luma_q] + [chroma_q] * (n_comp - 1)

    # quantized zigzag coefficients per component: (nby, nbx, 64)
    coefs = []
    for p, q in zip(planes, quants):
        b = _blockify(p - 128.0)
        nby, nbx = b.shape[:2]
        zz = np.zeros((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                c = _DCT_C @ b[by, bx] @ _DCT_C.T
                zz[by, bx] = np.round(c / q).astype(np.int64).ravel()[_ZIGZAG]
        coefs.append(zz)

    out = bytearray(b"\xff\xd8")
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    out += _dqt_segment(0, luma_q)
    if not gray:
        out += _dqt_segment(1, chroma_q)
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    sof += bytes([1, 0x11, 0])
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALS)
    out += _dht_segment(1, 0, _AC_BITS_PROG, _AC_VALS_PROG)
    if not gray:
        out += _dht_segment(0, 1, _DC_BITS, _DC_VALS)
        out += _dht_segment(1, 1, _AC_BITS_PROG, _AC_VALS_PROG)

    ids = list(range(1, n_comp + 1))
    tbl = [0] + [1] * (n_comp - 1)  # table assignment per component

    # scan 1: DC first, interleaved, Al=1 (4:4:4 -> MCU == one block per
    # component, raster order)
    out += _sos_segment([(ids[c], tbl[c], 0) for c in range(n_comp)],
                        0, 0, 0, 1)
    writer = _BitWriter()
    pred = [0] * n_comp
    nby, nbx = coefs[0].shape[:2]
    for by in range(nby):
        for bx in range(nbx):
            for c in range(n_comp):
                shifted = int(coefs[c][by, bx, 0]) >> 1
                diff = shifted - pred[c]
                pred[c] = shifted
                size = _size_cat(diff)
                code, width = _DC_CODES[size]
                writer.write(code, width)
                if size:
                    writer.write(_amplitude(diff, size), size)
    out += writer.flush()

    def blocks_of(c: int) -> list[np.ndarray]:
        z = coefs[c]
        return [z[by, bx] for by in range(z.shape[0])
                for bx in range(z.shape[1])]

    # scans 2..: AC first, per component, Al=1 (luma band-split)
    ac_first = [(0, 1, 5), (0, 6, 63)] + [
        (c, 1, 63) for c in range(1, n_comp)
    ]
    for c, ss, se in ac_first:
        out += _sos_segment([(ids[c], 0, tbl[c])], ss, se, 0, 1)
        writer = _BitWriter()
        _enc_ac_first(writer, blocks_of(c), ss, se, 1)
        out += writer.flush()

    # DC refinement, interleaved, Ah=1 -> Al=0: one raw bit per block
    out += _sos_segment([(ids[c], tbl[c], 0) for c in range(n_comp)],
                        0, 0, 1, 0)
    writer = _BitWriter()
    for by in range(nby):
        for bx in range(nbx):
            for c in range(n_comp):
                writer.write(int(coefs[c][by, bx, 0]) & 1, 1)
    out += writer.flush()

    # AC refinement, per component, Ah=1 -> Al=0
    for c in range(n_comp):
        out += _sos_segment([(ids[c], 0, tbl[c])], 1, 63, 1, 0)
        writer = _BitWriter()
        _enc_ac_refine(writer, blocks_of(c), 1, 63, 0)
        out += writer.flush()

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data: un-stuffs 0xFF 0x00,
    stops at markers (restart markers are consumed by the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        # bounds-checked so a truncated stream surfaces as the same
        # ValueError contract the GIF/PPM decoders follow, not a raw
        # IndexError from deep inside the entropy loop (round-9 advice)
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG stream")
        byte = self.data[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                return False  # restart marker: caller resyncs
            else:
                return False  # EOI or other marker
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("JPEG entropy data exhausted")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker and reset bit alignment."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG stream")
        if not (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


class _HuffDecoder:
    """Canonical Huffman decoder built from a DHT's (BITS, HUFFVAL):
    min/max code per length, spec F.2.2.3 DECODE procedure."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, reader: _BitReader) -> int:
        code = reader.read_bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("invalid JPEG Huffman code")
            code = (code << 1) | reader.read_bit()
        return self.vals[self.valptr[length] + code - self.mincode[length]]


def _extend(v: int, size: int) -> int:
    """Invert :func:`_amplitude`."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(
    reader: _BitReader,
    dc_table: _HuffDecoder,
    ac_table: _HuffDecoder,
    quant: np.ndarray,
    prev_dc: int,
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    size = dc_table.decode(reader)
    diff = _extend(reader.read_bits(size), size)
    dc = prev_dc + diff
    zz[0] = dc
    k = 1
    while k <= 63:
        rs = ac_table.decode(reader)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run overflows block")
        zz[k] = _extend(reader.read_bits(size), size)
        k += 1
    coef = (zz * quant.ravel()[_ZIGZAG])[_UNZIGZAG].reshape(8, 8)
    block = _DCT_C.T @ coef.astype(np.float64) @ _DCT_C
    return block, dc


def _decode_prog_scan(
    payload: bytes,
    pos: int,
    scan: list[tuple[int, int, int]],
    frame,
    coefs: dict[int, np.ndarray],
    huff_dc: dict[int, _HuffDecoder],
    huff_ac: dict[int, _HuffDecoder],
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> int:
    """Decode ONE progressive scan's entropy data into the coefficient
    accumulators and return the stream position of the next marker.

    DC scans (Ss == 0) may be interleaved (MCU order with sampling
    sub-blocks) or single-component; first scans (Ah == 0) are DPCM at
    point transform Al, refinements read one raw bit per block. AC
    scans are single-component by spec, iterated over the component's
    own block grid, with EOB-run skipping (first scans) and the
    correction-bit walk of G.1.2.3 (refinements). Restart markers reset
    DC predictors and the open EOB run."""
    h, w, comps = frame
    by_id = {c[0]: c for c in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    reader = _BitReader(payload, pos)
    preds = {cid: 0 for cid, _t, _a in scan}
    eobrun = 0
    n_unit = 0  # restart-interval unit counter (MCU or block)

    def maybe_restart() -> None:
        nonlocal n_unit, eobrun
        if restart_interval and n_unit and n_unit % restart_interval == 0:
            reader.sync_restart()
            for cid in preds:
                preds[cid] = 0
            eobrun = 0
        n_unit += 1

    def dec_dc(zz: np.ndarray, cid: int, tdc: int) -> None:
        if ah == 0:
            size = huff_dc[tdc].decode(reader)
            diff = _extend(reader.read_bits(size), size)
            preds[cid] += diff
            zz[0] = preds[cid] << al
        elif reader.read_bit():
            zz[0] |= 1 << al

    def dec_ac_first(zz: np.ndarray, tac: int) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = huff_ac[tac].decode(reader)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL: 16 zero coefficients
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("JPEG AC band overrun")
            zz[k] = _extend(reader.read_bits(s), s) << al
            k += 1

    p1, m1 = 1 << al, -1 << al

    def correct(zz: np.ndarray, k: int) -> None:
        # one correction bit for an already-nonzero coefficient
        if reader.read_bit() and (int(zz[k]) & p1) == 0:
            zz[k] += p1 if zz[k] > 0 else m1

    def dec_ac_refine(zz: np.ndarray, tac: int) -> None:
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = huff_ac[tac].decode(reader)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s == 0:
                    if r < 15:  # EOBn: close this and r extension blocks
                        eobrun = (1 << r)
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    # ZRL: pass 16 zero-history positions
                elif s == 1:
                    val = p1 if reader.read_bit() else m1
                else:
                    raise ValueError("bad JPEG AC refinement symbol")
                while True:
                    if k > se:
                        raise ValueError("JPEG AC refinement band overrun")
                    if zz[k] != 0:
                        correct(zz, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if zz[k] != 0:
                    correct(zz, k)
                k += 1
            eobrun -= 1

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("JPEG DC scan with nonzero Se")
        if len(scan) > 1:  # interleaved MCU order
            mcu_x = -(-w // (8 * hmax))
            mcu_y = -(-h // (8 * vmax))
            for _my in range(mcu_y):
                for _mx in range(mcu_x):
                    maybe_restart()
                    for cid, tdc, _tac in scan:
                        _, ch_, cv, _tq = by_id[cid]
                        for dy in range(cv):
                            for dx in range(ch_):
                                dec_dc(
                                    coefs[cid][_my * cv + dy, _mx * ch_ + dx],
                                    cid,
                                    tdc,
                                )
        else:
            cid, tdc, _tac = scan[0]
            _, ch_, cv, _tq = by_id[cid]
            bw = -(-(-(-w * ch_ // hmax)) // 8)
            bh = -(-(-(-h * cv // vmax)) // 8)
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart()
                    dec_dc(coefs[cid][by, bx], cid, tdc)
    else:  # AC scan: single component over its own block grid
        if len(scan) != 1:
            raise ValueError("interleaved JPEG AC scan is not allowed")
        cid, _tdc, tac = scan[0]
        _, ch_, cv, _tq = by_id[cid]
        bw = -(-(-(-w * ch_ // hmax)) // 8)
        bh = -(-(-(-h * cv // vmax)) // 8)
        dec = dec_ac_first if ah == 0 else dec_ac_refine
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                dec(coefs[cid][by, bx], tac)

    # step past any padding bits (and spec-legal 0xFF fill bytes — a
    # marker is the first non-FF byte after a run of FFs, B.1.1.2) to
    # the position of the 0xFF that introduces the next marker
    p = reader.pos
    while p + 1 < len(payload):
        if payload[p] != 0xFF:
            p += 1
        elif payload[p + 1] == 0x00:  # stuffed entropy byte
            p += 2
        elif payload[p + 1] == 0xFF:  # fill byte
            p += 1
        else:
            return p
    raise ValueError("truncated JPEG stream")


def _reconstruct_progressive(
    frame, coefs: dict[int, np.ndarray], quant: dict[int, np.ndarray]
) -> np.ndarray:
    """Dequantize + IDCT the accumulated progressive coefficients and
    assemble the final image (upsample subsampled chroma, crop to the
    frame size, YCbCr -> RGB) — the same tail as the baseline scan."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, ch_, cv, tq in comps:
        z = coefs[cid]
        nby, nbx = z.shape[:2]
        qz = quant[tq].ravel()[_ZIGZAG]
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        for by in range(nby):
            for bx in range(nbx):
                coef = (z[by, bx] * qz)[_UNZIGZAG].reshape(8, 8)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT_C.T @ coef.astype(np.float64) @ _DCT_C
                )
        plane += 128.0
        if ch_ < hmax or cv < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // cv, axis=0), hmax // ch_, axis=1
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return gray[..., None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF/JPEG bytes -> (h, w, 3) uint8 RGB (or (h, w, 1) for
    single-component grayscale scans). Supports 8-bit baseline
    sequential DCT (SOF0) — 1 or 3 components, any HxV sampling factors
    in {1, 2} (4:4:4, 4:2:2, 4:2:0), restart intervals, arbitrary
    DHT/DQT table assignments — and PROGRESSIVE DCT (SOF2): interleaved
    or single-component DC scans, spectral-selection AC scans with EOB
    runs, and successive-approximation DC/AC refinement scans, with
    coefficients accumulated across scans and reconstructed at EOI.
    Arithmetic coding, lossless/hierarchical SOFs, and 12-bit precision
    raise ``NotImplementedError``."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    progressive = False
    prog_coefs: dict[int, np.ndarray] = {}
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        if pos + 1 >= len(payload):
            raise ValueError("truncated JPEG stream")
        if payload[pos + 1] == 0xFF:  # spec-legal fill byte (B.1.1.2)
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            if progressive and frame is not None and prog_coefs:
                return _reconstruct_progressive(frame, prog_coefs, quant)
            break
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG stream")
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seg_len]
        if seg_len < 2 or len(body) != seg_len - 2:
            raise ValueError("truncated JPEG stream")
        pos += seg_len
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit DQT")
                tbl = np.frombuffer(
                    body, np.uint8, 64, off + 1
                ).astype(np.int64)
                quant[tq] = tbl[_UNZIGZAG].reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(
                    bits, vals
                )
                off += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if len(body) < 6:
                raise ValueError("truncated JPEG stream")
            prec, h, w, n_comp = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * n_comp:
                raise ValueError("truncated JPEG stream")
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for i in range(n_comp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            if marker == 0xC2:
                progressive = True
                # coefficient accumulators at MCU geometry (covers both
                # the interleaved-DC and non-interleaved-AC block
                # grids), zigzag order, refined scan by scan
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcu_x = -(-w // (8 * hmax))
                mcu_y = -(-h // (8 * vmax))
                for cid, ch_, cv, _tq in comps:
                    prog_coefs[cid] = np.zeros(
                        (mcu_y * cv, mcu_x * ch_, 64), dtype=np.int64
                    )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError(
                f"unsupported JPEG frame type (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated JPEG stream")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if not body or len(body) < 4 + 2 * body[0]:
                raise ValueError("truncated JPEG stream")
            n_scan = body[0]
            scan = []
            for i in range(n_scan):
                cid, tables = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, tables >> 4, tables & 0x0F))
            if progressive:
                ss, se = body[1 + 2 * n_scan], body[2 + 2 * n_scan]
                ahl = body[3 + 2 * n_scan]
                pos = _decode_prog_scan(
                    payload, pos, scan, frame, prog_coefs,
                    huff_dc, huff_ac, ss, se, ahl >> 4, ahl & 0x0F,
                    restart_interval,
                )
                continue
            h, w, comps = frame
            by_id = {c[0]: c for c in comps}
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcu_x = -(-w // (8 * hmax))
            mcu_y = -(-h // (8 * vmax))
            planes = {}
            for cid, ch_, cv, _tq in comps:
                planes[cid] = np.zeros(
                    (mcu_y * cv * 8, mcu_x * ch_ * 8), dtype=np.float64
                )
            reader = _BitReader(payload, pos)
            prev = {cid: 0 for cid, *_ in comps}
            n_mcu = 0
            for my in range(mcu_y):
                for mx in range(mcu_x):
                    if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                        reader.sync_restart()
                        prev = {cid: 0 for cid in prev}
                    n_mcu += 1
                    for cid, tdc, tac in scan:
                        _, ch_, cv, tq = by_id[cid]
                        for dy in range(cv):
                            for dx in range(ch_):
                                block, prev[cid] = _decode_block(
                                    reader,
                                    huff_dc[tdc],
                                    huff_ac[tac],
                                    quant[tq],
                                    prev[cid],
                                )
                                y0 = (my * cv + dy) * 8
                                x0 = (mx * ch_ + dx) * 8
                                planes[cid][
                                    y0 : y0 + 8, x0 : x0 + 8
                                ] = block
            full = []
            for cid, ch_, cv, _tq in comps:
                p = planes[cid] + 128.0
                if ch_ < hmax or cv < vmax:
                    p = np.repeat(
                        np.repeat(p, vmax // cv, axis=0), hmax // ch_, axis=1
                    )
                full.append(p[:h, :w])
            if len(full) == 1:
                gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
                return gray[..., None]
            y, cb, cr = full
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            rgb = np.stack([r, g, b], axis=-1)
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise ValueError("JPEG contained no scan")
