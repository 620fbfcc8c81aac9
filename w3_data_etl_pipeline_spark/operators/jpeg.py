"""Pure-numpy BASELINE JPEG (ITU-T.81 sequential DCT, Huffman) codec
— makes the compressed-codec boundary in operators/multimodal.py
load-bearing without PIL: a real bitstream with SOI/APP0/DQT/SOF0/
DHT/SOS/EOI markers, Annex-K quantization + Huffman tables, 4:4:4
subsampling, byte stuffing, DC prediction and run-length AC coding.

Scope (documented, pinned by tests/test_jpeg.py):
* encoder emits baseline 4:4:4 RGB or grayscale, quality 1-100
  (libjpeg's quality->scale rule);
* decoder handles baseline SOF0, 8-bit, 1 or 3 components, 4:4:4,
  the encoder's marker layout plus any DQT/DHT order, restart
  markers (RSTn), and raises ValueError on truncated/garbage
  payloads — progressive (SOF2) and subsampled streams raise
  NotImplementedError by design (that is the PIL swap-in seam).

The transform is a matrix DCT (C @ block @ C.T), vectorized over all
blocks of a component at once — no per-pixel Python.
"""

from __future__ import annotations

import numpy as np

# ---- constants (ITU-T.81 Annex K) ----------------------------------

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QUANT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# standard Huffman tables: (BITS counts per code length 1..16, values)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
          list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa,
])
AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa,
])

_C = np.zeros((8, 8))
for _u in range(8):
    a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _canonical_codes(bits, values):
    """(length, code) per symbol — JPEG canonical Huffman."""
    out, code = {}, 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bits: int, length: int) -> None:
        self.acc = (self.acc << length) | (bits & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


def _category(v: int) -> tuple[int, int]:
    """value -> (size, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """HxW (multiple of 8) -> (n, 8, 8) row-major block stack."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _unblocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    )


def encode_jpeg(pixels: np.ndarray, quality: int = 75) -> bytes:
    """HxWx3 (RGB) or HxW uint8 -> baseline JPEG bytes (4:4:4)."""
    if pixels.dtype != np.uint8 or pixels.ndim not in (2, 3):
        raise ValueError("pixels must be uint8 HxW or HxWx3")
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    if gray:
        comps = [pixels.astype(np.float64)]
    else:
        rgb = pixels.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        comps = [y, cb, cr]
    qlum = _scaled_quant(QUANT_LUM, quality)
    qchr = _scaled_quant(QUANT_CHR, quality)
    qts = [qlum] if gray else [qlum, qchr, qchr]
    dc_tabs = [_canonical_codes(*DC_LUM)] + (
        [] if gray else [_canonical_codes(*DC_CHR)] * 2
    )
    ac_tabs = [_canonical_codes(*AC_LUM)] + (
        [] if gray else [_canonical_codes(*AC_CHR)] * 2
    )

    coeffs = []
    for comp, qt in zip(comps, qts):
        p = np.pad(comp, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        b = _blocks(p)
        d = _C @ b @ _C.T  # vectorized 2-D DCT over the block stack
        coeffs.append(np.round(d / qt).astype(np.int32))

    bw = _BitWriter()
    n_blocks = coeffs[0].shape[0]
    pred = [0] * len(comps)
    flat = [c.reshape(c.shape[0], 64)[:, ZIGZAG] for c in coeffs]
    for bi in range(n_blocks):
        for ci in range(len(comps)):
            zz = flat[ci][bi]
            dc = int(zz[0])
            s, bits = _category(dc - pred[ci])
            pred[ci] = dc
            ln, code = dc_tabs[ci][s]
            bw.put(code, ln)
            if s:
                bw.put(bits, s)
            run = 0
            last = 63
            while last > 0 and zz[last] == 0:
                last -= 1
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_tabs[ci][0xF0]  # ZRL
                    bw.put(code, ln)
                    run -= 16
                s, bits = _category(v)
                ln, code = ac_tabs[ci][(run << 4) | s]
                bw.put(code, ln)
                bw.put(bits, s)
                run = 0
            if last < 63:
                ln, code = ac_tabs[ci][0x00]  # EOB
                bw.put(code, ln)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in enumerate([qlum] if gray else [qlum, qchr]):
        out += seg(0xDB, bytes([tid]) + bytes(qt.reshape(64)[ZIGZAG].astype(np.uint8)))
    nf = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nf])
    for ci in range(nf):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    huffs = [(0x00, DC_LUM), (0x10, AC_LUM)] + (
        [] if gray else [(0x01, DC_CHR), (0x11, AC_CHR)]
    )
    for tc, (bits, vals) in huffs:
        out += seg(0xC4, bytes([tc]) + bytes(bits) + bytes(vals))
    sos = bytes([nf])
    for ci in range(nf):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.pos >= len(self.d):
                self.acc = (self.acc << 8) | 0  # pad past EOI
                self.n += 8
                continue
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.d) and self.d[self.pos] == 0x00:
                    self.pos += 1  # unstuff
                else:
                    # a real marker inside entropy data (RSTn handled
                    # by caller); back up and pad
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def reset(self) -> None:  # restart-interval boundary
        self.acc = 0
        self.n = 0


def _decode_tree(bits, values):
    """(length -> {code: symbol}) lookup for the reader."""
    out: dict[int, dict[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out.setdefault(ln, {})[code] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, tree) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = tree.get(ln, {}).get(code)
        if sym is not None:
            return sym
    raise ValueError("corrupt entropy stream: no Huffman code matched")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(raw: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> HxWx3 RGB (or HxW grayscale) uint8."""
    if len(raw) < 4 or raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_trees: dict[int, dict] = {}
    ac_trees: dict[int, dict] = {}
    frame = None
    restart = 0
    while pos < len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = raw[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS — no image data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(raw):
            raise ValueError("truncated segment header")
        seglen = int.from_bytes(raw[pos: pos + 2], "big")
        body = raw[pos + 2: pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment body")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                n = 64 * (2 if pq else 1)
                tbl = np.frombuffer(
                    body[p: p + n], dtype=">u2" if pq else np.uint8
                ).astype(np.int32)
                if tbl.size != 64:
                    raise ValueError("bad DQT length")
                out = np.zeros(64, dtype=np.int32)
                out[ZIGZAG] = tbl
                qts[tq] = out.reshape(8, 8)
                p += n
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1: p + 17])
                nvals = sum(bits)
                vals = list(body[p + 17: p + 17 + nvals])
                if len(vals) != nvals:
                    raise ValueError("bad DHT length")
                tree = _decode_tree(bits, vals)
                (ac_trees if tc else dc_trees)[th] = tree
                p += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nf = body[5]
            comps = []
            for i in range(nf):
                cid, hv, tq = body[6 + 3 * i: 9 + 3 * i]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG (H/V != 1) not supported — 4:4:4 only"
                    )
                comps.append({"id": cid, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) not supported"
            )
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan_sel = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan_sel.append((cs, tabs >> 4, tabs & 0xF))
            data = raw[pos + seglen:]
            return _decode_scan(frame, scan_sel, qts, dc_trees, ac_trees, data, restart)
        pos += seglen
    raise ValueError("no SOS marker — truncated JPEG")


def _decode_scan(frame, scan_sel, qts, dc_trees, ac_trees, data, restart):
    h, w = frame["h"], frame["w"]
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    bh, bwid = ph // 8, pw // 8
    n_blocks = bh * bwid
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan_sel:
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        order.append((by_id[cs], td, ta))
    br = _BitReader(data)
    planes = [np.zeros((n_blocks, 8, 8), dtype=np.float64) for _ in order]
    pred = [0] * len(order)
    mcu = 0
    for bi in range(n_blocks):
        if restart and mcu and mcu % restart == 0:
            # skip to the RSTn marker boundary
            br.reset()
            while br.pos + 1 < len(br.d):
                if br.d[br.pos] == 0xFF and 0xD0 <= br.d[br.pos + 1] <= 0xD7:
                    br.pos += 2
                    break
                br.pos += 1
            pred = [0] * len(order)
        for ci, (comp, td, ta) in enumerate(order):
            if td not in dc_trees or ta not in ac_trees:
                raise ValueError("scan uses an undeclared Huffman table")
            if comp["tq"] not in qts:
                raise ValueError("scan uses an undeclared quant table")
            zz = np.zeros(64, dtype=np.int32)
            s = _read_symbol(br, dc_trees[td])
            diff = _extend(br.bits(s), s) if s else 0
            pred[ci] += diff
            zz[0] = pred[ci]
            k = 1
            while k < 64:
                rs = _read_symbol(br, ac_trees[ta])
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("corrupt entropy stream: AC index overflow")
                zz[k] = _extend(br.bits(s), s)
                k += 1
            blk = np.zeros(64, dtype=np.float64)
            blk[ZIGZAG] = zz * qts[comp["tq"]].reshape(64)[ZIGZAG]
            planes[ci][bi] = blk.reshape(8, 8)
        mcu += 1
    out_planes = []
    for p in planes:
        spatial = _C.T @ p @ _C + 128.0  # vectorized 2-D IDCT
        out_planes.append(_unblocks(spatial, ph, pw)[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
