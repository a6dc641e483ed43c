"""JPEG codec in pure numpy/stdlib: baseline (VERDICT r4 #10) plus
progressive Huffman scans (TODO_ROUND6 #6 — the last image format
worth hand-writing).

Public-spec implementation (ITU-T T.81 / ISO 10918-1):

- ``decode_jpeg`` parses SOI/APP*/COM/DQT/DHT/SOF0-2/DRI/SOS/RSTn/EOI,
  builds Huffman decoders from the embedded DHT segments (any valid
  tables, not just the spec's Annex K examples), entropy-decodes the
  interleaved MCU stream with byte-unstuffing and restart-interval DC
  resets, dequantizes, inverse-zigzags, applies the 2-D IDCT (8×8
  orthonormal DCT-II matrix, exact float), reassembles component
  planes under arbitrary (Hi, Vi) sampling factors with nearest-
  neighbor upsampling, and converts YCbCr→RGB for 3-component scans.
  SOF2 progressive frames accumulate coefficients across any scan
  script — spectral selection bands, DC/AC successive-approximation
  first and refinement passes with EOB-run and correction-bit
  semantics per Annex G — and IDCT once at EOI.
- ``encode_jpeg`` writes valid single-scan baseline JFIF files for
  test fixtures: 4:4:4 / 4:2:0 / 4:2:2 layouts, embedded quant tables, and
  CUSTOM flat-length canonical Huffman tables (all codes one length —
  legal per the format, suboptimal compression, and crucially free of
  any dependence on correctly-memorized Annex K code tables; the
  decoder reads whatever DHT says).
- ``encode_jpeg_progressive`` writes the same quantized coefficients
  as a 14-scan progressive stream (interleaved DC first Al=1 + DC
  refinement; per-component AC bands 1-5 and 6-63 at Al=1 with one
  refinement pass each), exercising EOBRUN, ZRL-in-refinement and
  buffered correction bits. Because both encoders share the
  quantization front end, decoding the progressive bytes is
  BIT-IDENTICAL to decoding the baseline bytes — the pinned test.

Arithmetic-coded (SOF9+), lossless, hierarchical and 12-bit scans
raise ``ValueError`` — the quarantine path, same contract as the
PNG/GIF/BMP codecs in ``pipelines/multimodal.py``: any malformed or
truncated payload raises, never returns garbage.

Reference analog: none — the reference repo (pdf-extractor) delegates
all raster work to PyMuPDF; this codec exists for the multimodal
column pipelines (SURVEY.md training-data extensions).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """The standard 8×8 zigzag scan, generated (not hard-coded): walk
    anti-diagonals, alternating direction, starting (0,0),(0,1),(1,0)."""
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(s + 1) if i < 8 and s - i < 8]
        if s % 2 == 0:
            ij.reverse()  # even diagonals run bottom-left → top-right
        order.extend(ij)
    flat = np.array([i * 8 + j for i, j in order], dtype=np.int64)
    assert flat.size == 64 and flat[1] == 1 and flat[2] == 8
    return flat


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K luminance quantization table (public spec example); any
# table is legal — it ships inside DQT and the decoder uses what it
# reads, so fidelity here only shapes the loss profile of fixtures.
QUANT_LUMA = np.array(
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
# mild flat chroma table (embedded in DQT like any other)
QUANT_CHROMA = np.full((8, 8), 24, dtype=np.int64)
QUANT_CHROMA[0, 0] = 17


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T: coeffs = T @ block @ T.T
    (JPEG's FDCT up to the level shift); inverse = T.T @ coeffs @ T."""
    n = np.arange(8)
    k = n.reshape(-1, 1)
    t = np.cos((2 * n + 1) * k * np.pi / 16) / 2.0
    t[0, :] = 1.0 / np.sqrt(8.0)
    return t


DCT_T = _dct_matrix()


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)

    def restart(self, n: int) -> None:
        """Pad to the byte boundary and emit RSTn. The pad byte goes
        through ``write`` (so an all-ones 0xFF pad byte gets stuffed);
        the marker itself bypasses stuffing by definition."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers.
    A marker mid-read (other than via explicit restart handling) or
    running off the end raises — the truncation/quarantine contract."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: truncated entropy-coded segment")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("jpeg: truncated entropy-coded segment")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError(f"jpeg: unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Consume padding to the byte boundary, then the RSTn marker.
        (A pad byte always carries at least one entropy bit, so ``_fill``
        has already consumed it — and its FF 00 stuffing if all-ones —
        before this runs; finding anything but the marker here means
        the stream is desynced or corrupt, and raising is correct.)"""
        self.acc = 0
        self.nbits = 0
        if self.pos + 1 >= len(self.data):
            raise ValueError("jpeg: truncated at restart marker")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + (n & 7):
            raise ValueError("jpeg: missing restart marker")
        self.pos += 2


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (Li, Vij) → {symbol: (code, length)} canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        for sym, (code, length) in _canonical_codes(bits, vals).items():
            self.lookup[(length, code)] = sym
        self.max_len = max((l for l, _ in self.lookup), default=0)

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def _flat_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """All-same-length canonical table over ``symbols`` (≤255 of them):
    the simplest legal DHT, immune to Annex-K transcription errors."""
    n = len(symbols)
    length = max(1, (n + 1 - 1).bit_length())  # need n ≤ 2^length - 1
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, sorted(symbols)


# ---------------------------------------------------------------------------
# encoder (test fixtures)
# ---------------------------------------------------------------------------


def _fdct_quant(plane: np.ndarray, qt: np.ndarray, grid: tuple[int, int]) -> np.ndarray:
    """Level-shifted 2-D DCT per 8×8 block over a plane edge-padded to
    exactly ``grid`` = (blocks_y, blocks_x). Returns
    (blocks_y, blocks_x, 64) int32 in zigzag order."""
    by, bx = grid
    h, w = plane.shape
    padded = np.pad(
        plane.astype(np.float64) - 128.0, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge"
    )
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coeffs = np.einsum("ij,abjk,lk->abil", DCT_T, blocks, DCT_T)
    q = np.round(coeffs / qt).astype(np.int32)
    return q.reshape(by, bx, 64)[:, :, ZIGZAG]


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _scan_blocks(comps: list[tuple[np.ndarray, int, int]], mcu_grid: tuple[int, int]):
    """Yield (mcu_index, component_index, block) in the EXACT
    interleaved MCU order of the scan — single source for symbol
    collection and emission, so DC-diff categories are computed over
    the same sequence both times (a plane-row-major dry pass diverges
    from MCU order whenever a component has hi or vi > 1). The MCU
    index drives restart-interval predictor resets."""
    mcuy, mcux = mcu_grid
    for m in range(mcuy * mcux):
        y, x = divmod(m, mcux)
        for ci, (q, hi, vi) in enumerate(comps):
            for by in range(vi):
                for bx in range(hi):
                    yield m, ci, q[y * vi + by, x * hi + bx]


def _collect_symbols(
    comps: list[tuple[np.ndarray, int, int]],
    mcu_grid: tuple[int, int],
    restart_interval: int = 0,
) -> tuple[set[int], set[int]]:
    """All DC categories and AC (run,size) symbols the scan will emit —
    drives the custom flat Huffman tables."""
    dc_syms: set[int] = set()
    ac_syms: set[int] = {0x00}  # EOB always representable
    prev = [0] * len(comps)
    prev_m = 0
    for m, ci, blk in _scan_blocks(comps, mcu_grid):
        if m != prev_m:
            prev_m = m
            if restart_interval and m % restart_interval == 0:
                prev = [0] * len(comps)
        dc_syms.add(_category(int(blk[0]) - prev[ci]))
        prev[ci] = int(blk[0])
        run = 0
        for v in blk[1:]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.add(0xF0)
                run -= 16
            ac_syms.add((run << 4) | _category(int(v)))
            run = 0
    return dc_syms, ac_syms


def _encode_scan(
    bw: _BitWriter,
    comps: list[tuple[np.ndarray, int, int]],
    dc_codes: list[dict],
    ac_codes: list[dict],
    mcu_grid: tuple[int, int],
    restart_interval: int = 0,
) -> None:
    """Interleaved MCU stream: (hi × vi) blocks per component per MCU;
    every ``restart_interval`` MCUs, pad + RSTn + DC predictor reset."""
    prev_dc = [0] * len(comps)
    prev_m = 0
    rst = 0
    for m, ci, blk in _scan_blocks(comps, mcu_grid):
        if m != prev_m:
            prev_m = m
            if restart_interval and m % restart_interval == 0:
                bw.restart(rst)
                rst = (rst + 1) & 7
                prev_dc = [0] * len(comps)
        diff = int(blk[0]) - prev_dc[ci]
        prev_dc[ci] = int(blk[0])
        size = _category(diff)
        code, length = dc_codes[ci][size]
        bw.write(code, length)
        if size:
            bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last_nz = int(nz[-1]) + 1 if nz.size else 0
        for k in range(1, 64):
            v = int(blk[k])
            if k > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[ci][0xF0]
                bw.write(code, length)
                run -= 16
            size = _category(v)
            code, length = ac_codes[ci][(run << 4) | size]
            bw.write(code, length)
            bw.write(v if v > 0 else v + (1 << size) - 1, size)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[ci][0x00]
            bw.write(code, length)


def _prepare_components(
    pixels: np.ndarray, subsampling: str
) -> tuple[list[np.ndarray], list[np.ndarray], list[tuple[int, int]], int, int, int, int]:
    """Shared encoder front end: color transform, subsampling, FDCT +
    quantization. Returns (planes_q, qts, samp, h, w, mcuy, mcux) —
    planes_q[i] is (blocks_y, blocks_x, 64) int32 zigzag coefficients
    on the MCU-padded grid. Baseline and progressive encoders both run
    through here, so they emit IDENTICAL coefficients (the bit-identity
    test's foundation)."""
    if pixels.ndim == 2:
        planes = [pixels.astype(np.float64)]
        qts = [QUANT_LUMA]
        samp = [(1, 1)]
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [np.clip(p, 0, 255) for p in (y, cb, cr)]
        qts = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
        if subsampling == "4:2:0":
            samp = [(2, 2), (1, 1), (1, 1)]
            planes = [planes[0]] + [_downsample2(p) for p in planes[1:]]
        elif subsampling == "4:2:2":
            # asymmetric factors (hi=2, vi=1): chroma halved horizontally
            # only — exercises the decoders' per-axis upsampling and the
            # 2×1-blocks-per-MCU walk
            samp = [(2, 1), (1, 1), (1, 1)]
            planes = [planes[0]] + [_downsample_h(p) for p in planes[1:]]
        elif subsampling == "4:4:4":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"encode_jpeg: unsupported subsampling {subsampling!r}")
    else:
        raise ValueError("encode_jpeg: expected (h,w) or (h,w,3) uint8")
    ncomp = len(planes)
    h, w = pixels.shape[:2]
    if not (0 < w < 65536 and 0 < h < 65536):
        raise ValueError("encode_jpeg: dimensions out of range")

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes_q = [
        _fdct_quant(np.asarray(p), qt, (mcuy * vi, mcux * hi))
        for p, qt, (hi, vi) in zip(planes, qts, samp)
    ]
    return planes_q, qts, samp, h, w, mcuy, mcux


def _headers(
    h: int,
    w: int,
    samp: list[tuple[int, int]],
    qts: list[np.ndarray],
    sof_marker: int,
) -> bytearray:
    """SOI + APP0 + DQT + SOF segments shared by both encoders; the
    frame marker (0xC0 baseline / 0xC2 progressive) is the only knob."""
    ncomp = len(samp)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT (8-bit precision), zigzag order
    for tid, qt in enumerate(qts[: 2 if ncomp == 3 else 1]):
        zz = qt.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz
    comp = b""
    for ci in range(ncomp):
        hi, vi = samp[ci]
        comp += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1 if ncomp == 3 else 0])
    out += bytes([0xFF, sof_marker]) + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp) + comp
    return out


def encode_jpeg(
    pixels: np.ndarray, *, subsampling: str = "4:4:4", restart_interval: int = 0
) -> bytes:
    """Baseline JFIF bytes for an (h, w) grayscale or (h, w, 3) RGB
    uint8 array: single scan, embedded quant + flat Huffman tables.
    ``subsampling="4:2:0"`` (3-channel only) downsamples chroma 2×2 —
    the common web layout — exercising the decoder's general MCU walk;
    ``"4:2:2"`` halves chroma horizontally only (asymmetric Hi≠Vi
    factors, per-axis upsampling).
    ``restart_interval=N`` emits DRI + RSTn markers every N MCUs (the
    error-resilience layout real encoders use on large images).
    Valid input for any baseline decoder."""
    planes_q, qts, samp, h, w, mcuy, mcux = _prepare_components(pixels, subsampling)
    ncomp = len(planes_q)
    comps_hv = [(q, hi, vi) for q, (hi, vi) in zip(planes_q, samp)]
    dc_syms, ac_syms = _collect_symbols(comps_hv, (mcuy, mcux), restart_interval)
    dc_bits, dc_vals = _flat_table(sorted(dc_syms))
    ac_bits, ac_vals = _flat_table(sorted(ac_syms))
    dc_code = _canonical_codes(dc_bits, dc_vals)
    ac_code = _canonical_codes(ac_bits, ac_vals)

    out = _headers(h, w, samp, qts, 0xC0)
    # DHT: table 0 used by every component for both DC and AC classes
    out += _dht(0, dc_bits, dc_vals)
    out += _dht(1, ac_bits, ac_vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += _sos([(ci + 1, 0x00) for ci in range(ncomp)], 0, 63, 0, 0)
    bw = _BitWriter()
    _encode_scan(bw, comps_hv, [dc_code] * ncomp, [ac_code] * ncomp, (mcuy, mcux), restart_interval)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2×2 mean downsample with edge padding to even dims."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))


def _downsample_h(plane: np.ndarray) -> np.ndarray:
    """Horizontal-only 2× mean downsample (4:2:2 chroma)."""
    h, w = plane.shape
    p = np.pad(plane, ((0, 0), (0, w % 2)), mode="edge")
    return p.reshape(h, p.shape[1] // 2, 2).mean(axis=2)


# ---------------------------------------------------------------------------
# progressive encoder (test fixtures)
# ---------------------------------------------------------------------------


class _SymCount:
    """Dry-run sink: records which Huffman symbols a scan will emit so
    the flat table can be built before the real emission pass (both
    passes run the identical scan logic, so the streams agree)."""

    def __init__(self) -> None:
        self.syms: set[int] = set()

    def symbol(self, s: int) -> None:
        self.syms.add(s)

    def bits(self, v: int, n: int) -> None:
        pass

    def restart(self, n: int) -> None:
        pass


class _SymEmit:
    def __init__(self, bw: _BitWriter, codes: dict[int, tuple[int, int]]) -> None:
        self.bw = bw
        self.codes = codes

    def symbol(self, s: int) -> None:
        code, length = self.codes[s]
        self.bw.write(code, length)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.bw.write(v, n)

    def restart(self, n: int) -> None:
        self.bw.restart(n)


def _pt_ac(v: int, al: int) -> int:
    """AC point transform (T.81 G.1.2.1): sign(v) * (|v| >> Al) —
    truncation toward zero, NOT an arithmetic shift."""
    return -((-v) >> al) if v < 0 else v >> al


def _enc_dc_first(comps, mcu_grid, al, sink, restart_interval=0) -> None:
    """DC first scan (Ss=Se=0, Ah=0): diff-code the POINT-TRANSFORMED
    DC values (arithmetic shift per G.1.2.1) in interleaved MCU order."""
    prev = [0] * len(comps)
    prev_m = 0
    rst = 0
    for m, ci, blk in _scan_blocks(comps, mcu_grid):
        if m != prev_m:
            prev_m = m
            if restart_interval and m % restart_interval == 0:
                sink.restart(rst)
                rst = (rst + 1) & 7
                prev = [0] * len(comps)
        v = int(blk[0]) >> al
        diff = v - prev[ci]
        prev[ci] = v
        s = _category(diff)
        sink.symbol(s)
        sink.bits(diff if diff > 0 else diff + (1 << s) - 1, s)


def _enc_dc_refine(comps, mcu_grid, al, bw: _BitWriter, restart_interval=0) -> None:
    """DC refinement scan (Ah=Al+1): one raw bit per block — the next
    lower magnitude bit of the DC coefficient. No Huffman coding."""
    prev_m = 0
    rst = 0
    for m, _ci, blk in _scan_blocks(comps, mcu_grid):
        if m != prev_m:
            prev_m = m
            if restart_interval and m % restart_interval == 0:
                bw.restart(rst)
                rst = (rst + 1) & 7
        bw.write((int(blk[0]) >> al) & 1, 1)


def _enc_ac_first(blocks, ss, se, al, sink, restart_interval=0) -> None:
    """AC first scan for one component's band (non-interleaved): ZRL /
    (run,size) coding with EOB runs spanning blocks (G.1.2.2). In a
    non-interleaved scan the restart unit is one block; EOB runs may
    not cross a restart, so the pending run flushes first."""
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            rb = eobrun.bit_length() - 1
            sink.symbol(rb << 4)
            sink.bits(eobrun - (1 << rb), rb)
            eobrun = 0

    rst = 0
    for bi, blk in enumerate(blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            flush_eob()
            sink.restart(rst)
            rst = (rst + 1) & 7
        vals = [_pt_ac(int(blk[k]), al) for k in range(ss, se + 1)]
        if not any(vals):
            eobrun += 1
            if eobrun == 32767:  # EOB14 ceiling (r=15 would collide with ZRL)
                flush_eob()
            continue
        flush_eob()
        r = 0
        for v in vals:
            if v == 0:
                r += 1
                continue
            while r > 15:
                sink.symbol(0xF0)
                r -= 16
            s = _category(v)
            sink.symbol((r << 4) | s)
            sink.bits(v if v > 0 else v + (1 << s) - 1, s)
            r = 0
        if r:  # trailing zeros → this block ends in an EOB run
            eobrun += 1
            if eobrun == 32767:
                flush_eob()
    flush_eob()


def _enc_ac_refine(blocks, ss, se, al, sink, restart_interval=0) -> None:
    """AC refinement scan (G.1.2.3): newly-nonzero coefficients get a
    (run,1) symbol + sign bit; already-nonzero ones get a correction
    bit BUFFERED until the next emitted symbol (or the pending EOB run)
    so the decoder reads them in its advance-over-zeros walk. Zero runs
    past the last newly-nonzero coefficient fold into the EOB run."""
    eobrun = 0
    pending: list[int] = []  # correction bits owned by the pending EOB run

    def flush_eob() -> None:
        nonlocal eobrun, pending
        if eobrun:
            rb = eobrun.bit_length() - 1
            sink.symbol(rb << 4)
            sink.bits(eobrun - (1 << rb), rb)
        for b in pending:
            sink.bits(b, 1)
        eobrun = 0
        pending = []

    rst = 0
    for bi, blk in enumerate(blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            flush_eob()
            sink.restart(rst)
            rst = (rst + 1) & 7
        a = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        sgn = [int(blk[k]) >= 0 for k in range(ss, se + 1)]
        eob_idx = -1  # last newly-nonzero position (magnitude exactly 1)
        for i, t in enumerate(a):
            if t == 1:
                eob_idx = i
        r = 0
        br: list[int] = []  # correction bits since the last emitted symbol
        for i, t in enumerate(a):
            if t == 0:
                r += 1
                continue
            # ZRLs are only real if a newly-nonzero coef is still ahead;
            # otherwise the zeros fold into the EOB run below.
            while r > 15 and i <= eob_idx:
                flush_eob()
                sink.symbol(0xF0)
                r -= 16
                for b in br:
                    sink.bits(b, 1)
                br = []
            if t > 1:  # history coefficient: correction bit only
                br.append(t & 1)
                continue
            flush_eob()
            sink.symbol((r << 4) | 1)
            sink.bits(1 if sgn[i] else 0, 1)
            for b in br:
                sink.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 32767:
                flush_eob()
    flush_eob()


def _dht(tc: int, bits: list[int], vals: list[int]) -> bytes:
    return (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(vals))
        + bytes([tc << 4])  # class, table id 0 (redefined before each scan)
        + bytes(bits)
        + bytes(vals)
    )


def _sos(specs: list[tuple[int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(specs)])
    for cid, tdta in specs:
        body += bytes([cid, tdta])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def _huff_scan_bytes(tc: int, scan_fn) -> bytes:
    """Two-pass Huffman scan: dry run collects symbols, flat table is
    built, real run emits — returns DHT + entropy bytes (caller adds
    the SOS header between them)."""
    col = _SymCount()
    scan_fn(col)
    bits, vals = _flat_table(sorted(col.syms or {0}))
    codes = _canonical_codes(bits, vals)
    bw = _BitWriter()
    scan_fn(_SymEmit(bw, codes))
    return _dht(tc, bits, vals), bw.flush()


def encode_jpeg_progressive(
    pixels: np.ndarray, *, subsampling: str = "4:4:4", restart_interval: int = 0
) -> bytes:
    """Progressive JFIF bytes carrying the SAME quantized coefficients
    as ``encode_jpeg`` (shared ``_prepare_components``), re-ordered as
    a spectral-selection + successive-approximation scan script:

      1. DC first, all components interleaved, Al=1
      2. per component: AC first bands 1-5 and 6-63 at Al=1
      3. DC refinement (Ah=1, Al=0 — raw bits, no Huffman table)
      4. per component: AC refinement of both bands (Ah=1, Al=0)

    Every coefficient bit is eventually delivered, so any conformant
    progressive decoder reconstructs pixels BIT-IDENTICAL to decoding
    the baseline bytes for the same input."""
    planes_q, qts, samp, h, w, mcuy, mcux = _prepare_components(pixels, subsampling)
    ncomp = len(planes_q)
    comps_hv = [(q, hi, vi) for q, (hi, vi) in zip(planes_q, samp)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # non-interleaved AC scans cover each component's NATURAL block
    # grid (ceil of its sample dims), not the MCU-padded grid — the
    # padding blocks carry DC only, and are cropped before output.
    nat: list[list[np.ndarray]] = []
    for ci in range(ncomp):
        hi, vi = samp[ci]
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        nbx = -(-cw // 8)
        nby = -(-ch // 8)
        grid = planes_q[ci][:nby, :nbx]
        nat.append([grid[y, x] for y in range(nby) for x in range(nbx)])

    out = _headers(h, w, samp, qts, 0xC2)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    all_specs = [(ci + 1, 0x00) for ci in range(ncomp)]
    ri = restart_interval

    # 1. DC first (interleaved, Al=1)
    dht, ent = _huff_scan_bytes(0, lambda s: _enc_dc_first(comps_hv, (mcuy, mcux), 1, s, ri))
    out += dht + _sos(all_specs, 0, 0, 0, 1) + ent
    # 2. AC first scans, per component, bands (1,5) and (6,63), Al=1
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            dht, ent = _huff_scan_bytes(
                1, lambda s, ci=ci, ss=ss, se=se: _enc_ac_first(nat[ci], ss, se, 1, s, ri)
            )
            out += dht + _sos([(ci + 1, 0x00)], ss, se, 0, 1) + ent
    # 3. DC refinement (raw bits)
    bw = _BitWriter()
    _enc_dc_refine(comps_hv, (mcuy, mcux), 0, bw, ri)
    out += _sos(all_specs, 0, 0, 1, 0) + bw.flush()
    # 4. AC refinement scans
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            dht, ent = _huff_scan_bytes(
                1, lambda s, ci=ci, ss=ss, se=se: _enc_ac_refine(nat[ci], ss, se, 0, s, ri)
            )
            out += dht + _sos([(ci + 1, 0x00)], ss, se, 1, 0) + ent
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JPEG → (h, w) or (h, w, 3) uint8 pixels.
    Raises ``ValueError`` on truncation, unsupported scan types
    (arithmetic/lossless/hierarchical/12-bit), or any structural
    damage — the quarantine contract."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: bad SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}  # (class, id)
    frame = None
    restart_interval = 0
    coef: dict[int, np.ndarray] = {}  # progressive: cid → (by,bx,64) zigzag coeffs
    dc_done: set[int] = set()  # progressive: comps whose DC first scan landed
    scans_seen = 0

    while True:
        if pos + 2 > len(payload):
            raise ValueError("jpeg: truncated before SOS")
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            if frame is not None and frame.get("progressive") and scans_seen:
                return _finish_progressive(frame, coef, qtables)
            raise ValueError("jpeg: EOI before scan")
        if pos + 2 > len(payload):
            raise ValueError("jpeg: truncated before SOS")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        if seglen < 2 or pos + seglen > len(payload):
            raise ValueError("jpeg: truncated segment")
        body = payload[pos + 2 : pos + seglen]
        pos += seglen

        if marker == 0xDB:  # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0xF
                bpos += 1
                n = 64 * (2 if pq else 1)
                if bpos + n > len(body):
                    raise ValueError("jpeg: truncated DQT")
                raw = (
                    np.frombuffer(body, dtype=">u2", count=64, offset=bpos)
                    if pq
                    else np.frombuffer(body, dtype=np.uint8, count=64, offset=bpos)
                ).astype(np.int64)
                table = np.zeros(64, dtype=np.int64)
                table[ZIGZAG] = raw  # DQT ships zigzagged
                qtables[tq] = table.reshape(8, 8)
                bpos += n
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                if bpos + 17 > len(body):
                    raise ValueError("jpeg: truncated DHT")
                tc, th = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1 : bpos + 17])
                nvals = sum(bits)
                if bpos + 17 + nvals > len(body):
                    raise ValueError("jpeg: truncated DHT values")
                vals = list(body[bpos + 17 : bpos + 17 + nvals])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                bpos += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2}
            if marker == 0xC2:
                # coefficient accumulators on the MCU-padded grid; each
                # scan deposits its spectral band / magnitude bits here
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                for c in comps:
                    coef[c["id"]] = np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: non-baseline scan (arithmetic/lossless) not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                comp = next((c for c in frame["comps"] if c["id"] == cs), None)
                if comp is None:
                    raise ValueError("jpeg: scan references unknown component")
                scan.append((comp, tdta >> 4, tdta & 0xF))
            if not frame["progressive"]:
                return _decode_scan(payload, pos, frame, scan, qtables, huff, restart_interval)
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("jpeg: truncated SOS header")
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            pos = _decode_prog_scan(
                payload, pos, frame, scan, huff, restart_interval,
                coef, dc_done, ss, se, ahal >> 4, ahal & 0xF,
            )
            scans_seen += 1
        # else: APPn/COM — skipped


def _decode_scan(data, pos, frame, scan, qtables, huff, restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component block grids (MCU-padded)
    planes = {}
    for comp, _td, _ta in scan:
        planes[comp["id"]] = np.zeros((mcuy * comp["v"] * 8, mcux * comp["h"] * 8), dtype=np.float64)

    br = _BitReader(data, pos)
    prev_dc = {c["id"]: 0 for c, _t, _a in scan}
    n_mcu = mcux * mcuy
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.align_and_expect_rst(rst)
            rst = (rst + 1) & 7
            for k in prev_dc:
                prev_dc[k] = 0
        my, mx = divmod(m, mcux)
        for comp, td, ta in scan:
            try:
                dc_dec = huff[(0, td)]
                ac_dec = huff[(1, ta)]
                qt = qtables[comp["tq"]]
            except KeyError:
                raise ValueError("jpeg: scan references missing table") from None
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    blk = _decode_block(br, dc_dec, ac_dec, qt, prev_dc, comp["id"])
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = blk

    return _planes_tail(w, h, hmax, vmax, scan, planes)


def _planes_tail(w, h, hmax, vmax, scan, planes) -> np.ndarray:
    """Crop decoded planes to natural size, upsample subsampled
    components to full resolution, and color-convert — shared by the
    baseline single-scan path and the progressive finalizer."""
    out_planes = []
    for comp, _td, _ta in scan:
        cw = -(-w * comp["h"] // hmax)
        ch = -(-h * comp["v"] // vmax)
        p = planes[comp["id"]][:ch, :cw]
        if comp["h"] != hmax or comp["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    if len(out_planes) == 3:
        y, cb, cr = out_planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise ValueError(f"jpeg: unsupported component count {len(out_planes)}")


def _decode_block(br, dc_dec, ac_dec, qt, prev_dc, cid):
    zz = np.zeros(64, dtype=np.float64)
    size = dc_dec.decode(br)
    diff = _extend(br.receive(size), size) if size else 0
    prev_dc[cid] += diff
    zz[0] = prev_dc[cid]
    k = 1
    while k < 64:
        sym = ac_dec.decode(br)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0xF
        if size == 0:
            if run != 15:
                raise ValueError("jpeg: invalid AC symbol")
            k += 16  # ZRL
            continue
        k += run
        if k >= 64:
            raise ValueError("jpeg: AC run overflows block")
        zz[k] = _extend(br.receive(size), size)
        k += 1
    coeffs = np.zeros(64, dtype=np.float64)
    coeffs[ZIGZAG] = zz
    block = coeffs.reshape(8, 8) * qt
    return DCT_T.T @ block @ DCT_T + 128.0


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map ``size``-bit magnitude to signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# progressive decoder (T.81 Annex G)
# ---------------------------------------------------------------------------


def _prog_units(frame, scan):
    """Restart-unit iterator for one progressive scan: yields lists of
    (comp, td, ta, by, bx) block coordinates. Interleaved scans (Ns>1)
    yield one MCU per unit; single-component scans are non-interleaved
    (T.81 A.2.2) — one block per unit, raster over the component's
    NATURAL grid (ceil of its sample dims, not the MCU-padded grid)."""
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if len(scan) > 1:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for comp, td, ta in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            unit.append(
                                (comp, td, ta, my * comp["v"] + by, mx * comp["h"] + bx)
                            )
                yield unit
    else:
        comp, td, ta = scan[0]
        cw = -(-w * comp["h"] // hmax)
        ch = -(-h * comp["v"] // vmax)
        nbx = -(-cw // 8)
        nby = -(-ch // 8)
        for by in range(nby):
            for bx in range(nbx):
                yield [(comp, td, ta, by, bx)]


def _decode_prog_scan(
    data, pos, frame, scan, huff, restart_interval, coef, dc_done, ss, se, ah, al
):
    """Decode one progressive scan's entropy segment into the ``coef``
    accumulators; returns the stream position of the next marker."""
    if ss == 0:
        if se != 0:
            raise ValueError("jpeg: progressive DC scan must have Se=0")
    else:
        if len(scan) != 1:
            raise ValueError("jpeg: progressive AC scan must be single-component")
        if not (ss <= se <= 63):
            raise ValueError("jpeg: bad spectral selection")
        if scan[0][0]["id"] not in dc_done:
            raise ValueError("jpeg: AC scan before the component's DC scan")
    if ah and ah != al + 1:
        raise ValueError("jpeg: refinement must lower Al by exactly one bit")

    br = _BitReader(data, pos)
    prev_dc = {c["id"]: 0 for c, _t, _a in scan}
    eobrun = 0
    p1, m1 = 1 << al, (-1) << al
    rst = 0
    for m, unit in enumerate(_prog_units(frame, scan)):
        if restart_interval and m and m % restart_interval == 0:
            br.align_and_expect_rst(rst)
            rst = (rst + 1) & 7
            prev_dc = {k: 0 for k in prev_dc}
            eobrun = 0
        for comp, td, ta, by, bx in unit:
            blk = coef[comp["id"]][by, bx]
            if ss == 0 and ah == 0:  # DC first
                try:
                    dc_dec = huff[(0, td)]
                except KeyError:
                    raise ValueError("jpeg: scan references missing table") from None
                s = dc_dec.decode(br)
                diff = _extend(br.receive(s), s) if s else 0
                prev_dc[comp["id"]] += diff
                blk[0] = prev_dc[comp["id"]] << al
            elif ss == 0:  # DC refinement: one raw bit per block
                if br.read_bit():
                    blk[0] |= p1
            else:
                try:
                    ac_dec = huff[(1, ta)]
                except KeyError:
                    raise ValueError("jpeg: scan references missing table") from None
                if ah == 0:
                    eobrun = _dec_ac_first(br, ac_dec, blk, ss, se, al, eobrun)
                else:
                    eobrun = _dec_ac_refine(br, ac_dec, blk, ss, se, p1, m1, eobrun)
    if ss == 0 and ah == 0:
        for c, _t, _a in scan:
            dc_done.add(c["id"])
    # skip any pad bits to the byte boundary; br.pos is the next marker
    return br.pos


def _dec_ac_first(br, ac_dec, blk, ss, se, al, eobrun) -> int:
    """One block of an AC first scan (G.1.2.2): returns updated EOBRUN."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = ac_dec.decode(br)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r == 15:  # ZRL: 16 zeros + a following coefficient must fit
                k += 16
                if k > se:
                    raise ValueError("jpeg: AC run overflows band")
                continue
            eobrun = (1 << r) - 1  # current block is a member of the run
            if r:
                eobrun += br.receive(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("jpeg: AC run overflows band")
        blk[k] = _extend(br.receive(s), s) << al
        k += 1
    return 0


def _dec_ac_refine(br, ac_dec, blk, ss, se, p1, m1, eobrun) -> int:
    """One block of an AC refinement scan (G.1.2.3): correction bits
    for already-nonzero coefficients interleave with (run,1) codes for
    newly-nonzero ones; EOB runs refine the rest of the band."""
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = ac_dec.decode(br)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                val = 0  # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("jpeg: bad refinement symbol")
                val = p1 if br.read_bit() else m1
            # advance over r zero-history coefficients, emitting a
            # correction to every nonzero one passed on the way
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if br.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if r != 0 or (val != 0 and k > se):
                # the promised zero run / landing position overflows the
                # band — corrupt stream, not a benign truncation
                raise ValueError("jpeg: refinement run overflows band")
            if val != 0:
                blk[k] = val
            k += 1
    if eobrun > 0:
        # EOB run: the rest of this block's band gets correction bits only
        while k <= se:
            c = int(blk[k])
            if c != 0 and br.read_bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _finish_progressive(frame, coef, qtables) -> np.ndarray:
    """Dequantize + IDCT the accumulated coefficients (same per-block
    float expression as the baseline ``_decode_block``, so identical
    coefficients give bit-identical pixels) and assemble the planes."""
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    planes = {}
    for comp in frame["comps"]:
        qt = qtables.get(comp["tq"])
        if qt is None:
            raise ValueError("jpeg: scan references missing table")
        z = coef[comp["id"]]
        nby, nbx = z.shape[:2]
        plane = np.empty((nby * 8, nbx * 8), dtype=np.float64)
        for by in range(nby):
            for bx in range(nbx):
                coeffs = np.zeros(64, dtype=np.float64)
                coeffs[ZIGZAG] = z[by, bx]
                block = coeffs.reshape(8, 8) * qt
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    DCT_T.T @ block @ DCT_T + 128.0
                )
        planes[comp["id"]] = plane
    scan_like = [(c, 0, 0) for c in frame["comps"]]
    return _planes_tail(w, h, hmax, vmax, scan_like, planes)
