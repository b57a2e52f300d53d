"""From-scratch baseline JPEG codec (ITU-T T.81, sequential DCT, Huffman).

Closes the last lossy-image boundary in the multimodal pipeline
(VERDICT r4 carry-forward #7): ``decode_jpeg`` handles baseline SOF0
streams — 8-bit samples, 1- or 3-component (grayscale / YCbCr),
arbitrary 1-2 sampling factors per axis (4:4:4, 4:2:2, 4:4:0, 4:2:0),
multiple DQT/DHT segments, 8- and 16-bit quantizer precision, and
restart intervals (DRI + RSTn resync). ``encode_jpeg`` produces valid
baseline streams (Annex-K quantization tables with IJG-style quality
scaling, self-emitted canonical Huffman tables — the spec permits any
valid tables since DHT fully describes them) so the decoder can be
roundtrip-tested without any external codec.

Determinism: the inverse DCT is a FIXED-POINT INTEGER transform — the
orthonormal 8-point basis rounded to 12 fractional bits, applied as two
int64 tensor contractions over every block at once, descaled by one
round-half-up shift. No float enters the decode path after
dequantization, so decoded pixels are bit-identical across platforms
and runs (the property the `multimodal_decode` plumbing relies on).
YCbCr→RGB likewise uses the JFIF fixed-point integer coefficients.

Honest cost note (same boundary as the PNG inflate,
mediacodec.py): Huffman ENTROPY decode is an inherently serial
bit-stream walk and runs as per-symbol Python; the IDCT, dequantize,
upsample and color-convert stages are vectorized numpy over all blocks.
For corpus-scale decode a native codec library would be mounted at the
same ``decode_image`` dispatch point.

Public sources: ITU-T T.81 (marker syntax §B, Huffman decode procedure
§F.2.2, EXTEND §F.2.2.1, Annex K tables); JFIF 1.02 (color transform).
Reference parity: the reference repo has no media path — this module
belongs to the driver-mandated multimodal pipeline surface.
"""

from __future__ import annotations

import re
import struct

import numpy as np

# first real marker in entropy-coded data: 0xFF followed by anything but
# the 0x00 stuffing byte (restart markers included — handled by the scan)
_MARKER_RE = re.compile(rb"\xff[^\x00]")

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

#: zig-zag index: ZIGZAG[k] = (row, col) of the k-th coefficient in scan order
_ZZ_ORDER = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_ZZ = np.array(_ZZ_ORDER, dtype=np.int64)
_UNZZ = np.argsort(_ZZ)  # natural order -> zigzag position

# Annex K §K.1/K.2 quantization tables (natural row-major order)
_K1_LUM_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
_K2_CHR_QUANT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)


def _dct_basis_fixed(frac_bits: int = 12) -> np.ndarray:
    """Orthonormal 8-point DCT-II basis, fixed-point int64.

    M[x, u] = a(u) * cos((2x+1) u pi / 16), a(0)=sqrt(1/8), a(u)=1/2 —
    the T.81 §A.3.3 convention. Rounded once to ``frac_bits`` fractional
    bits; every decode uses this one integer matrix.
    """
    x = np.arange(8.0)[:, None]
    u = np.arange(8.0)[None, :]
    m = np.cos((2 * x + 1) * u * np.pi / 16.0)
    m[:, 0] *= np.sqrt(1.0 / 8.0)
    m[:, 1:] *= 0.5
    return np.round(m * (1 << frac_bits)).astype(np.int64)


_IDCT_M = _dct_basis_fixed(12)  # scale 2^12
_DCT_MF = _dct_basis_fixed(12).astype(np.float64) / 4096.0  # encoder (float ok)


def idct2_int(blocks: np.ndarray) -> np.ndarray:
    """Fixed-point integer 2-D IDCT over a stack of blocks.

    blocks: (N, 8, 8) int64 DEQUANTIZED coefficients (natural order).
    Returns (N, 8, 8) int64 spatial samples (still level-shifted, i.e.
    in roughly [-128, 127]); deterministic: two int64 contractions at
    scale 2^24 then one round-half-up shift.
    """
    b = blocks.astype(np.int64, copy=False)
    # out[n, x, y] = sum_{u,v} M[x,u] * b[n,u,v] * M[y,v]
    t = np.einsum("xu,nuv->nxv", _IDCT_M, b)  # scale 2^12
    y = np.einsum("nxv,yv->nxy", t, _IDCT_M)  # scale 2^24
    return (y + (1 << 23)) >> 24


# ---------------------------------------------------------------------------
# canonical Huffman tables (decode + encode forms)
# ---------------------------------------------------------------------------

class _HuffTable:
    """Canonical Huffman table from the DHT (BITS, HUFFVAL) form —
    decode via a flat (symbol, length) lookup over the next ``FAST_BITS``
    stream bits (codes are MSB-first, so a code of length L fills the
    2^(FAST_BITS-L) consecutive slots under its left-aligned prefix);
    longer codes fall back to the T.81 §F.2.2.3 mincode/maxcode/valptr
    walk. Encode via a symbol -> (code, length) dict built from the same
    code assignment. The table lookup replaces ~2 python method calls
    PER BIT with ~3 per symbol (r6 — the measured JPEG-decode hot
    spot, same shape as the DEFLATE fix in mediacodec)."""

    FAST_BITS = 10

    def __init__(self, bits: list[int], huffval: list[int]):
        if len(bits) != 16:
            raise ValueError("BITS must have 16 entries")
        if sum(bits) > len(huffval):
            raise ValueError("HUFFVAL truncated (shorter than BITS claims)")
        self.bits = list(bits)
        self.huffval = list(huffval)
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        self.enc: dict[int, tuple[int, int]] = {}
        codes: list[tuple[int, int, int]] = []  # (sym, length, code)
        for length in range(1, 17):
            n = bits[length - 1]
            self.valptr[length] = k
            self.mincode[length] = code
            for _ in range(n):
                self.enc[huffval[k]] = (code, length)
                codes.append((huffval[k], length, code))
                code += 1
                k += 1
            self.maxcode[length] = code - 1  # -1 when n == 0 keeps walk going
            if n == 0:
                self.maxcode[length] = -1
            code <<= 1
        if k != len(huffval):
            raise ValueError("HUFFVAL length disagrees with BITS")
        L = self.fast_bits = self.FAST_BITS
        fast = [(-1, 0)] * (1 << L)
        for sym, ln, c in codes:
            if ln > L:
                continue
            base = c << (L - ln)
            entry = (sym, ln)
            for i in range(base, base + (1 << (L - ln))):
                fast[i] = entry
        self.fast = fast


def _std_encoder_tables() -> tuple[_HuffTable, _HuffTable]:
    """Fixed canonical tables the ENCODER emits (valid per §C.2: Kraft
    inequality holds and the all-ones code is never assigned).

    DC: the 12 magnitude categories at 4 bits each (codes 0..11).
    AC: all 256 run/size symbols — 255 at 9 bits, 1 at 10 bits.
    Deliberately simple rather than Annex-K-optimal; DHT carries them.
    """
    dc_bits = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = list(range(12))
    ac_bits = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
    ac_vals = list(range(255)) + [255]
    return _HuffTable(dc_bits, dc_vals), _HuffTable(ac_bits, ac_vals)


# ---------------------------------------------------------------------------
# entropy-coded segment bit I/O
# ---------------------------------------------------------------------------

class _BitWriter:
    """Entropy-segment writer with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per convention


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "pred", "blocks", "bw", "bh")

    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.td = self.ta = 0
        self.pred = 0
        self.blocks = None  # set by _decode_scan; None = scan never ran


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG to uint8 (H, W) or (H, W, 3) RGB.

    Raises NotImplementedError for layouts outside the supported boundary
    (progressive / extended / lossless / arithmetic-coded frames,
    multi-scan or non-interleaved baseline), ValueError for malformed
    data. Any low-level parse failure on a corrupt stream (truncated
    segment, bad table index, zero sampling factor) is normalized to
    ValueError so callers — decode_image's ``fake=True`` stand-in path in
    particular — need exactly the two documented exception types and one
    bad row can never fail a whole Spark job with an undocumented error
    (review r5)."""
    try:
        return _decode_jpeg(buf)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError, StopIteration,
            ZeroDivisionError, OverflowError) as e:
        raise ValueError(f"malformed JPEG: {type(e).__name__}: {e}") from e


def _decode_jpeg(buf: bytes) -> np.ndarray:
    d = bytes(buf)
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    adobe_transform: int | None = None

    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        m = d[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue
        seglen = struct.unpack(">H", d[pos:pos + 2])[0]
        seg = d[pos + 2:pos + seglen]
        if m == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    q = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                elif pq == 1:
                    q = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    raise ValueError("bad DQT precision")
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZZ] = q  # zigzag -> natural
                qtabs[tq] = nat.reshape(8, 8)
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                htabs[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + n
        elif m == 0xC0 or m == 0xC1:  # SOF0 baseline (C1: extended seq, same layout)
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            height, width = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                h, v = hv >> 4, hv & 15
                if not (1 <= h <= 4 and 1 <= v <= 4):  # spec Table B.2
                    raise ValueError(f"bad sampling factors {h}x{v}")
                comps.append(_Component(cid, h, v, tq))
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline frame marker 0xFF{m:02X}")
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif m == 0xEE and seg[:5] == b"Adobe":  # APP14 transform flag
            adobe_transform = seg[11] if len(seg) > 11 else None
        elif m == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            # _decode_scan assumes ONE scan carrying every frame component
            # in interleaved-MCU order; a per-component (non-interleaved)
            # scan sequence is legal baseline but would silently wipe the
            # previously decoded planes and mis-order >1x1-sampled blocks
            # (review r5) — refuse it loudly like the progressive path.
            if any(c.blocks is not None for c in comps):
                raise NotImplementedError("multi-scan baseline JPEG")
            if not comps or ns != len(comps):
                raise NotImplementedError(
                    f"non-interleaved scan ({ns} of {len(comps)} components)"
                )
            if ns == 1 and (comps[0].h, comps[0].v) != (1, 1):
                # a single-component scan is non-interleaved by spec (MCU =
                # one block, sampling ignored); our interleaved geometry
                # only coincides with that at 1x1
                raise NotImplementedError("1-component scan with >1x1 sampling")
            order = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x.cid == cs)
                comp.td, comp.ta = tt >> 4, tt & 15
                order.append(comp)
            pos += seglen
            pos = _decode_scan(d, pos, order, comps, htabs, restart_interval,
                               width, height)
            continue
        pos += seglen

    if not comps or width == 0 or any(c.blocks is None for c in comps):
        raise ValueError("no frame decoded (missing SOF or SOS)")
    return _reconstruct(comps, qtabs, width, height, adobe_transform)


def _decode_scan(d: bytes, pos: int, order: list[_Component],
                 comps: list[_Component], htabs, restart_interval: int,
                 width: int, height: int) -> int:
    """Entropy-decode one (interleaved) baseline scan into per-component
    coefficient planes; returns the stream position after the scan."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c.bw = mcux * c.h
        c.bh = mcuy * c.v
        c.blocks = np.zeros((c.bh * c.bw, 8, 8), dtype=np.int64)
        c.pred = 0

    # Segment-based inline entropy decode (r6): the entropy-coded data is
    # split at real markers (regex, C-speed), each segment is un-stuffed
    # (bytes.replace FF00→FF, C-speed) ONCE, and the symbol loop runs on
    # clean bytes with the bit buffer in LOCALS — no per-bit method calls
    # and no per-byte FF tests (the previous _EntropyReader class read
    # bit-at-a-time at ~2 python calls per BIT; it is deleted, this loop
    # is its exact replacement). Semantics preserved: zero bits are fed past a
    # marker (§F.2.2.5) while running past a hard end of data raises the
    # same truncation ValueError, and RSTn sync checks are unchanged.
    coef = {id(c): np.zeros((c.bh * c.bw, 64), dtype=np.int64) for c in comps}

    def next_segment(start: int) -> tuple[bytes, int, int | None]:
        m = _MARKER_RE.search(d, start)
        if m is not None:
            return d[start:m.start()].replace(b"\xff\x00", b"\xff"), \
                m.start(), d[m.start() + 1]
        return d[start:].replace(b"\xff\x00", b"\xff"), len(d), None

    seg, seg_end, marker = next_segment(pos)
    seg_len = len(seg)
    sp = 0
    bitbuf = 0
    nbits = 0
    rst_count = 0
    mcus_done = 0
    total = mcux * mcuy
    plan = [
        (c, htabs[(0, c.td)], htabs[(1, c.ta)], c.v * c.h) for c in order
    ]
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcus_done and mcus_done % restart_interval == 0:
                if marker is None:
                    raise ValueError("expected restart marker, hit end of data")
                if not (0xD0 <= marker <= 0xD7):
                    raise ValueError(f"expected RSTn, found marker {marker:#x}")
                if (marker - 0xD0) != (rst_count & 7):
                    raise ValueError("restart marker out of sequence")
                seg, seg_end, marker = next_segment(seg_end + 2)
                seg_len = len(seg)
                sp = 0
                bitbuf = 0
                nbits = 0
                rst_count += 1
                for c in comps:
                    c.pred = 0
            for c, dc_t, ac_t, nblk in plan:
                dc_fast, ac_fast = dc_t.fast, ac_t.fast
                ccoef = coef[id(c)]
                for b_i in range(nblk):
                    by, bx = divmod(b_i, c.h)
                    blk = [0] * 64
                    k = 0
                    tbl = dc_t
                    fast = dc_fast
                    while True:
                        # refill to ≥32 bits (max consume/step is 16+15)
                        while nbits < 32:
                            if sp < seg_len:
                                bitbuf = (bitbuf << 8) | seg[sp]
                                sp += 1
                                nbits += 8
                            elif marker is not None:
                                bitbuf <<= 8  # §F.2.2.5 zero padding
                                nbits += 8
                            else:
                                break  # hard end: consume checks below
                        bitbuf &= (1 << nbits) - 1  # drop consumed bits
                        sym, ln = fast[
                            (bitbuf >> (nbits - 10)) & 1023
                            if nbits >= 10
                            else (bitbuf << (10 - nbits)) & 1023
                        ]
                        if sym < 0:  # code longer than the fast table
                            if nbits >= 16:
                                code16 = (bitbuf >> (nbits - 16)) & 0xFFFF
                            else:
                                code16 = (bitbuf << (16 - nbits)) & 0xFFFF
                            for ln in range(11, 17):
                                code = code16 >> (16 - ln)
                                if (
                                    tbl.maxcode[ln] >= 0
                                    and code <= tbl.maxcode[ln]
                                ):
                                    sym = tbl.huffval[
                                        tbl.valptr[ln] + code - tbl.mincode[ln]
                                    ]
                                    break
                            else:
                                raise ValueError("invalid Huffman code (>16 bits)")
                        if ln > nbits:
                            raise ValueError("truncated entropy segment")
                        nbits -= ln
                        if k == 0:  # DC magnitude category
                            s = sym
                        else:
                            r, s = sym >> 4, sym & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    if k < 64:
                                        continue
                                break  # EOB (or ZRL landed at the end)
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                        if s:
                            if s > nbits:
                                raise ValueError("truncated entropy segment")
                            nbits -= s
                            v = (bitbuf >> nbits) & ((1 << s) - 1)
                            # §F.2.2.1 EXTEND inline
                            blk[k] = (
                                v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                            )
                        if k == 0:
                            c.pred += blk[0]
                            blk[0] = c.pred
                            tbl = ac_t
                            fast = ac_fast
                        k += 1
                        if k >= 64:
                            break
                    bitbuf &= (1 << nbits) - 1
                    ccoef[(my * c.v + by) * c.bw + (mx * c.h + bx)] = blk
            mcus_done += 1
    for c in comps:
        nat = np.zeros((c.bh * c.bw, 64), dtype=np.int64)
        nat[:, _ZZ] = coef[id(c)]  # zigzag -> natural, all blocks at once
        c.blocks = nat.reshape(-1, 8, 8)
    # skip to next marker after the scan
    p = seg_end
    while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] not in (0x00,) and not (0xD0 <= d[p + 1] <= 0xD7)):
        p += 1
    assert mcus_done == total
    return p


def _reconstruct(comps: list[_Component], qtabs, width: int, height: int,
                 adobe_transform: int | None) -> np.ndarray:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c in comps:
        deq = c.blocks * qtabs[c.tq][None, :, :]
        spat = idct2_int(deq) + 128
        np.clip(spat, 0, 255, out=spat)
        # (bh*bw, 8, 8) -> (bh*8, bw*8)
        plane = (spat.reshape(c.bh, c.bw, 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c.bh * 8, c.bw * 8))
        # upsample to full MCU grid resolution
        if c.h != hmax:
            plane = np.repeat(plane, hmax // c.h, axis=1)
        if c.v != vmax:
            plane = np.repeat(plane, vmax // c.v, axis=0)
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        return planes[0].astype(np.uint8)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG (CMYK?)")
    if adobe_transform == 0:
        # Adobe flag 0 = components are straight RGB, no transform
        return np.stack(planes, axis=-1).astype(np.uint8)
    return _ycbcr_to_rgb_int(planes[0], planes[1], planes[2])


def _ycbcr_to_rgb_int(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """JFIF inverse transform with 16-bit fixed-point coefficients
    (round(k * 65536)), round-half-up — fully integer, deterministic."""
    yv = y.astype(np.int64) << 16
    cb = cb.astype(np.int64) - 128
    cr = cr.astype(np.int64) - 128
    half = 1 << 15
    r = (yv + 91881 * cr + half) >> 16
    g = (yv - 22554 * cb - 46802 * cr + half) >> 16
    b = (yv + 116130 * cb + half) >> 16
    out = np.stack([r, g, b], axis=-1)
    np.clip(out, 0, 255, out=out)
    return out.astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 -> table as-is, clamp to [1, 255]."""
    quality = max(1, min(100, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (tbl * s + 50) // 100
    return np.clip(q, 1, 255)


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(bh*8, bw*8) level-shifted float plane -> (n, 8, 8) int64 quantized."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(bh * bw, 8, 8))
    coef = np.einsum("ux,nxy,vy->nuv", _DCT_MF.T, blocks, _DCT_MF.T)
    return np.round(coef / q[None, :, :]).astype(np.int64)


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _emit_block(bw: _BitWriter, blk: np.ndarray, pred: int,
                dc_t: _HuffTable, ac_t: _HuffTable) -> int:
    zz = blk.reshape(64)[_ZZ]
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    s = int(diff).bit_length() if diff != 0 else 0
    if diff < 0:
        s = int(-diff).bit_length()
    code, ln = dc_t.enc[s]
    bw.put(code, ln)
    if s:
        v = diff if diff >= 0 else diff + (1 << s) - 1
        bw.put(v, s)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_t.enc[0xF0]
            bw.put(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_t.enc[(run << 4) | s]
        bw.put(code, ln)
        mv = v if v >= 0 else v + (1 << s) - 1
        bw.put(mv, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_t.enc[0x00]
        bw.put(code, ln)
    return pred


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: str = "444", restart_interval: int = 0) -> bytes:
    """Encode uint8 (H, W) grayscale or (H, W, 3) RGB as baseline JPEG.

    subsample: "444" (no chroma subsampling) or "420" (2x2 average).
    Emits Annex-K quant tables scaled by ``quality`` and this module's
    fixed canonical Huffman tables in DHT.
    """
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("bad image dimensions")
    ql = _quality_scale(_K1_LUM_QUANT, quality)
    qc = _quality_scale(_K2_CHR_QUANT, quality)
    dc_t, ac_t = _std_encoder_tables()

    if gray:
        factors = [(1, 1)]
        y = img.astype(np.float64)
        planes = [y]
        qsel = [0]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        if subsample == "420":
            factors = [(2, 2), (1, 1), (1, 1)]
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = 0.25 * (cbp[0::2, 0::2] + cbp[1::2, 0::2]
                         + cbp[0::2, 1::2] + cbp[1::2, 1::2])
            cr = 0.25 * (crp[0::2, 0::2] + crp[1::2, 0::2]
                         + crp[0::2, 1::2] + crp[1::2, 1::2])
        elif subsample == "444":
            factors = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsample must be '444' or '420'")
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    qblocks = []
    for p, (fh, fv), qs in zip(planes, factors, qsel):
        p = _pad_to(p - 128.0, mcuy * fv * 8, mcux * fh * 8)
        # pad may under-shoot if plane smaller than target: pad exactly
        th, tw = mcuy * fv * 8, mcux * fh * 8
        if p.shape != (th, tw):
            p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        qb = _fdct_quant(p, ql if qs == 0 else qc)
        qblocks.append(qb.reshape(mcuy * fv, mcux * fh, 8, 8))

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    # DQT (both tables, 8-bit precision, zigzag order)
    for tq, q in ([(0, ql)] if gray else [(0, ql), (1, qc)]):
        seg(0xDB, bytes([tq]) + bytes(int(v) for v in q.reshape(64)[_ZZ]))
    # SOF0
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        fh, fv = factors[i]
        sof += bytes([i + 1, (fh << 4) | fv, qsel[i]])
    seg(0xC0, sof)
    # DHT: class 0 id 0 (DC) and class 1 id 0 (AC), shared by all comps
    seg(0xC4, bytes([0x00]) + bytes(dc_t.bits) + bytes(dc_t.huffval))
    seg(0xC4, bytes([0x10]) + bytes(ac_t.bits) + bytes(ac_t.huffval))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    # SOS
    sos = bytes([nc]) + b"".join(bytes([i + 1, 0x00]) for i in range(nc)) + b"\x00\x3f\x00"
    seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * nc
    mcus_done = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcus_done and mcus_done % restart_interval == 0:
                bw.flush()
                out.extend(bw.out)
                bw = _BitWriter()
                out.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
                rst += 1
                preds = [0] * nc
            for ci in range(nc):
                fh, fv = factors[ci]
                for by in range(fv):
                    for bx in range(fh):
                        blk = qblocks[ci][my * fv + by, mx * fh + bx]
                        preds[ci] = _emit_block(bw, blk, preds[ci], dc_t, ac_t)
            mcus_done += 1
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
