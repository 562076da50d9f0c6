"""FLAC (RFC 9639) encode/decode in pure stdlib — the lossless-audio
member of the from-scratch codec family.

Closes the one tractable entry on the library-bound audio list
(``jpeg_codec.py`` honest-scope note): MP3/AAC/Opus are
psychoacoustic/MDCT codecs that genuinely need a DSP library, but FLAC
is a fully public, DCT-free bit format — linear prediction plus Rice
entropy coding — sized like the QOI/ADPCM wins. Everything in the spec
that a mono or stereo 16-bit stream can exercise is implemented for
real:

* stream layout: ``fLaC`` marker, STREAMINFO (including the MD5 of the
  unencoded little-endian PCM, which the decoder verifies), arbitrary
  skipped metadata blocks;
* frame layout: 14-bit sync, blocking strategy, the blocksize /
  sample-rate / channel / sample-size code tables, the UTF-8-style
  coded frame number (full 36-bit range), CRC-8 header check and
  CRC-16 whole-frame check (both verified on decode);
* all four subframe types — CONSTANT, VERBATIM, FIXED (orders 0–4 with
  the standard binomial predictors), and genuine LPC (arbitrary order,
  quantized coefficients, arithmetic-shift prediction);
* wasted-bits (unary-coded, shift-restored on decode; the encoder
  emits them whenever a block's samples share trailing zero bits);
* Rice residual coding: both 4-bit (method 0) and 5-bit (method 1)
  parameter widths, partition orders > 0 (first partition shortened by
  the predictor order), zigzag mapping, and the raw-bits escape code;
* all four STEREO channel assignments (§9.1.3): independent L/R and
  the left/side, right/side, and parity-exact mid/side decorrelated
  layouts, the side subframe carrying its spec-mandated extra bit.

The encoder is deliberately plan-driven (the caller chooses the
subframe type per block) so the registered query can force every
decoder path; left to itself it picks constant/fixed-order-2 and a
best-fit Rice parameter per partition. Lossless means the registered
query's oracle never models the codec at all: DuckDB recomputes the
closed-form PCM signal and the encode→decode round trip must reproduce
it bit-exactly (see ``multimodal_flac_energy`` in ``multimodal.py``).

Scale: encode/decode run inside Arrow ``mapInPandas`` batches like the
rest of the codec family — payload bytes never shuffle.
"""

from __future__ import annotations

import hashlib
import struct

# ------------------------------------------------------------- CRCs
# CRC-8: x^8 + x^2 + x + 1 (poly 0x07), init 0, MSB-first, unreflected.
# CRC-16: x^16 + x^15 + x^2 + 1 (poly 0x8005), init 0, MSB-first.

_CRC8_TABLE = []
for _b in range(256):
    _r = _b
    for _ in range(8):
        _r = ((_r << 1) ^ 0x07) & 0xFF if _r & 0x80 else (_r << 1) & 0xFF
    _CRC8_TABLE.append(_r)

_CRC16_TABLE = []
for _b in range(256):
    _r = _b << 8
    for _ in range(8):
        _r = ((_r << 1) ^ 0x8005) & 0xFFFF if _r & 0x8000 else (_r << 1) & 0xFFFF
    _CRC16_TABLE.append(_r)


def crc8(data: bytes) -> int:
    r = 0
    for byte in data:
        r = _CRC8_TABLE[r ^ byte]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for byte in data:
        r = _CRC16_TABLE[((r >> 8) ^ byte) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r


# ---------------------------------------------------------- bit I/O


class BitWriter:
    """MSB-first bit accumulator."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits < 0 or (nbits and value >> nbits):
            raise ValueError(f"{value} does not fit in {nbits} bits")
        self._acc = (self._acc << nbits) | value
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        if self._nbits:
            raise ValueError("unaligned bitstream")
        return bytes(self._out)


class BitReader:
    """MSB-first bit consumer over a bytes buffer."""

    def __init__(self, data: bytes, pos_bytes: int = 0) -> None:
        self._data = data
        self._pos = pos_bytes * 8

    def read(self, nbits: int) -> int:
        end = self._pos + nbits
        if end > len(self._data) * 8:
            raise ValueError("flac: truncated bitstream")
        v = 0
        pos = self._pos
        while nbits:
            byte = self._data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, nbits)
            shift = avail - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            nbits -= take
        self._pos = pos
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self._pos = (self._pos + 7) & ~7

    def byte_pos(self) -> int:
        return self._pos >> 3

    def at_end(self) -> bool:
        return self._pos >= len(self._data) * 8


# -------------------------------------------- coded number (UTF-8ish)


def _write_coded_number(w: BitWriter, n: int) -> None:
    """RFC 9639 §9.1.5: frame/sample number as a UTF-8-style extended
    code (1–7 bytes, up to 36 bits of payload)."""
    if n < 0x80:
        w.write(n, 8)
        return
    for nbytes, header in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8),
                           (6, 0xFC), (7, 0xFE)):
        payload_bits = 6 * (nbytes - 1) + (7 - nbytes if nbytes < 7 else 0)
        if n < (1 << payload_bits):
            shift = 6 * (nbytes - 1)
            w.write(header | (n >> shift), 8)
            for i in range(nbytes - 2, -1, -1):
                w.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)
            return
    raise ValueError("coded number exceeds 36 bits")


def _read_coded_number(r: BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    for mask, val, cnt in ((0xE0, 0xC0, 2), (0xF0, 0xE0, 3), (0xF8, 0xF0, 4),
                           (0xFC, 0xF8, 5), (0xFE, 0xFC, 6), (0xFF, 0xFE, 7)):
        if b0 & mask == val:
            nbytes = cnt
            n = b0 & (0xFF >> (cnt + 1)) if cnt < 7 else 0
            break
    if not nbytes:
        raise ValueError("flac: invalid coded-number leading byte")
    for _ in range(nbytes - 1):
        cont = r.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("flac: invalid coded-number continuation byte")
        n = (n << 6) | (cont & 0x3F)
    return n


# ------------------------------------------------- predictors / rice

#: FIXED subframe predictor coefficients by order (RFC 9639 §9.2.3):
#: residual = sum of binomial-weighted previous samples.
_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _zigzag(e: int) -> int:
    return (e << 1) if e >= 0 else ((-e) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _rice_cost(residual: list[int], param: int) -> int:
    return sum((_zigzag(e) >> param) + 1 + param for e in residual)


def _best_rice_param(residual: list[int], max_param: int) -> int:
    best_p, best_c = 0, None
    for p in range(max_param + 1):
        c = _rice_cost(residual, p)
        if best_c is None or c < best_c:
            best_p, best_c = p, c
    return best_p


def _write_residual(w: BitWriter, residual: list[int], order: int,
                    blocksize: int, partition_order: int,
                    method: int = 0, escape_bits: int | None = None) -> None:
    """Residual block: 2-bit method, 4-bit partition order, then
    2**order partitions each with its own Rice parameter.
    ``escape_bits`` forces the raw-bits escape code in every partition
    (residuals stored as escape_bits-bit signed values)."""
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    w.write(method, 2)
    w.write(partition_order, 4)
    nparts = 1 << partition_order
    if blocksize % nparts:
        raise ValueError("blocksize not divisible by partition count")
    psize = blocksize >> partition_order
    if psize <= order and partition_order:
        raise ValueError("first partition would be empty")
    pos = 0
    for part in range(nparts):
        n = psize - order if part == 0 else psize
        chunk = residual[pos:pos + n]
        pos += n
        if escape_bits is not None:
            w.write(escape, pbits)
            w.write(escape_bits, 5)
            for e in chunk:
                if escape_bits:
                    w.write_signed(e, escape_bits)
                elif e:
                    raise ValueError("0-bit escape with nonzero residual")
            continue
        param = _best_rice_param(chunk, escape - 1)
        w.write(param, pbits)
        for e in chunk:
            u = _zigzag(e)
            w.write_unary(u >> param)
            if param:
                w.write(u & ((1 << param) - 1), param)


def _read_residual(r: BitReader, order: int, blocksize: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    partition_order = r.read(4)
    nparts = 1 << partition_order
    psize = blocksize >> partition_order
    out: list[int] = []
    for part in range(nparts):
        n = psize - order if part == 0 else psize
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            out.extend(r.read_signed(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << param) | (r.read(param) if param else 0)
                out.append(_unzigzag(u))
    return out


# ----------------------------------------------------------- encoder


def _common_wasted_bits(samples: list[int]) -> int:
    acc = 0
    for s in samples:
        acc |= s
        if acc & 1:
            return 0
    if acc == 0:
        return 0
    w = 0
    while acc & 1 == 0:
        acc >>= 1
        w += 1
    return w


def _write_subframe(w: BitWriter, block: list[int], bps: int,
                    plan: dict) -> None:
    stype = plan.get("type", "auto")
    if stype == "auto":
        stype = "constant" if len(set(block)) == 1 else "fixed"
    wasted = _common_wasted_bits(block) if stype in ("constant",
                                                     "verbatim") else 0
    if wasted:
        block = [s >> wasted for s in block]
    ebps = bps - wasted

    def header(type_code: int) -> None:
        w.write(0, 1)
        w.write(type_code, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if stype == "constant":
        if len(set(block)) != 1:
            raise ValueError("constant subframe over non-constant block")
        header(0)
        w.write_signed(block[0], ebps)
        return
    if stype == "verbatim":
        header(1)
        for s in block:
            w.write_signed(s, ebps)
        return

    blocksize = len(block)
    partition_order = plan.get("partition_order", 0)
    method = plan.get("residual_method", 0)
    if stype == "fixed":
        order = plan.get("order", 2)
        if order not in _FIXED_COEF or order > len(block):
            raise ValueError(f"bad fixed order {order}")
        header(8 + order)
        for s in block[:order]:
            w.write_signed(s, ebps)
        coef = _FIXED_COEF[order]
        residual = [block[i] - sum(c * block[i - 1 - j]
                                   for j, c in enumerate(coef))
                    for i in range(order, blocksize)]
        _write_residual(w, residual, order, blocksize, partition_order,
                        method, plan.get("escape_bits"))
        return
    if stype == "lpc":
        order = plan["order"]
        qlp = plan["qlp"]
        shift = plan["shift"]
        precision = plan.get("precision", 4)
        if len(qlp) != order or not 1 <= precision <= 15 or shift < 0:
            raise ValueError("bad lpc plan")
        header(32 + order - 1)
        for s in block[:order]:
            w.write_signed(s, ebps)
        w.write(precision - 1, 4)
        w.write_signed(shift, 5)
        for c in qlp:
            w.write_signed(c, precision)
        residual = [block[i] - (sum(c * block[i - 1 - j]
                                    for j, c in enumerate(qlp)) >> shift)
                    for i in range(order, blocksize)]
        _write_residual(w, residual, order, blocksize, partition_order,
                        method, plan.get("escape_bits"))
        return
    raise ValueError(f"unknown subframe type {stype!r}")


#: stereo channel-assignment codes (RFC 9639 §9.1.3): independent L/R,
#: and the three decorrelated layouts whose SIDE channel (L − R) carries
#: bps+1 bits in its subframe.
_STEREO_CODES = {"lr": 0b0001, "ls": 0b1000, "rs": 0b1001, "ms": 0b1010}


def _stereo_transform(mode: str, left: list[int],
                      right: list[int]) -> list[tuple[list[int], int]]:
    """(coded-channel, extra-bits) pairs for a stereo block."""
    side = [a - b for a, b in zip(left, right)]
    if mode == "lr":
        return [(left, 0), (right, 0)]
    if mode == "ls":
        return [(left, 0), (side, 1)]
    if mode == "rs":
        return [(side, 1), (right, 0)]
    if mode == "ms":
        mid = [(a + b) >> 1 for a, b in zip(left, right)]
        return [(mid, 0), (side, 1)]
    raise ValueError(f"unknown stereo mode {mode!r}")


def flac_encode(samples, sample_rate: int = 8000,
                blocksize: int = 64, bps: int = 16,
                plan=None) -> bytes:
    """Encode ``bps``-bit PCM as a FLAC stream (fixed blocksize).

    ``samples``: a flat list (mono) or a ``(left, right)`` tuple of
    equal-length lists (stereo).

    ``plan(block_index, block) -> dict`` chooses the subframe per block:
    ``{"type": "constant"|"verbatim"|"fixed"|"lpc"|"auto", "order": n,
    "qlp": [...], "shift": s, "partition_order": p,
    "residual_method": 0|1}``; for stereo, ``block`` is the
    ``(left, right)`` block pair and the dict may add ``"stereo":
    "lr"|"ls"|"rs"|"ms"`` (default ``lr``) plus optional per-channel
    overrides under ``"ch0"``/``"ch1"``. Default: auto (constant where
    possible, else fixed order 2, partition order 0).
    """
    stereo = isinstance(samples, tuple)
    if stereo:
        left, right = samples
        if len(left) != len(right):
            raise ValueError("stereo channels must have equal length")
        chans = [list(left), list(right)]
    else:
        chans = [list(samples)]
    n = len(chans[0])
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    for ch in chans:
        if any(s < lo or s > hi for s in ch):
            raise ValueError(f"sample out of {bps}-bit range")
    if bps != 16:
        raise ValueError("frame header emits 16-bit code only")
    if not 1 <= blocksize <= 256:
        # the frame header uses code 0b0110 (8-bit blocksize-1); larger
        # blocks would need code 0b0111 — reject up front instead of an
        # opaque BitWriter overflow deep in the frame loop
        raise ValueError("flac: blocksize must be in 1..256 "
                         "(8-bit blocksize code)")
    # MD5 over the unencoded, channel-interleaved little-endian PCM
    pcm = b"".join(struct.pack("<h", ch[i]) for i in range(n)
                   for ch in chans)
    md5 = hashlib.md5(pcm).digest()

    # STREAMINFO (34 bytes): RFC 9639 §8.2
    si = BitWriter()
    si.write(blocksize, 16)          # min blocksize
    si.write(blocksize, 16)          # max blocksize
    si.write(0, 24)                  # min framesize unknown
    si.write(0, 24)                  # max framesize unknown
    si.write(sample_rate, 20)
    si.write(len(chans) - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    streaminfo = si.getvalue() + md5

    out = bytearray(b"fLaC")
    out.append(0x80)                 # last-metadata-block, type 0
    out += struct.pack(">I", len(streaminfo))[1:]
    out += streaminfo

    frame_no = 0
    for start in range(0, n, blocksize):
        blocks = [ch[start:start + blocksize] for ch in chans]
        bs = len(blocks[0])
        if stereo:
            spec = plan(frame_no, (blocks[0], blocks[1])) if plan \
                else {"type": "auto"}
            mode = spec.get("stereo", "lr")
            coded = _stereo_transform(mode, blocks[0], blocks[1])
            chan_code = _STEREO_CODES[mode]
        else:
            spec = plan(frame_no, blocks[0]) if plan else {"type": "auto"}
            coded = [(blocks[0], 0)]
            chan_code = 0b0000
        w = BitWriter()
        w.write(0b11111111111110, 14)    # sync
        w.write(0, 1)                    # reserved
        w.write(0, 1)                    # fixed-blocksize stream
        w.write(0b0110, 4)               # blocksize: 8-bit value at end
        w.write(0b0000, 4)               # sample rate: from STREAMINFO
        w.write(chan_code, 4)
        w.write(0b100, 3)                # sample size: 16-bit
        w.write(0, 1)                    # reserved
        _write_coded_number(w, frame_no)
        w.write(bs - 1, 8)               # blocksize-1 (code 0110)
        header_bytes = w.getvalue()
        w.write(crc8(header_bytes), 8)
        for idx, (cblock, extra) in enumerate(coded):
            cspec = spec.get(f"ch{idx}", spec)
            _write_subframe(w, cblock, bps + extra, cspec)
        w.align()
        frame_bytes = w.getvalue()
        out += frame_bytes
        out += struct.pack(">H", crc16(frame_bytes))
        frame_no += 1
    return bytes(out)


# ----------------------------------------------------------- decoder


def _read_subframe(r: BitReader, blocksize: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("flac: subframe header padding bit set")
    type_code = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    ebps = bps - wasted

    if type_code == 0:                       # CONSTANT
        v = r.read_signed(ebps)
        block = [v] * blocksize
    elif type_code == 1:                     # VERBATIM
        block = [r.read_signed(ebps) for _ in range(blocksize)]
    elif 8 <= type_code <= 12:               # FIXED order 0-4
        order = type_code - 8
        block = [r.read_signed(ebps) for _ in range(order)]
        residual = _read_residual(r, order, blocksize)
        coef = _FIXED_COEF[order]
        for e in residual:
            block.append(e + sum(c * block[len(block) - 1 - j]
                                 for j, c in enumerate(coef)))
    elif type_code >= 32:                    # LPC order 1-32
        order = type_code - 32 + 1
        block = [r.read_signed(ebps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("flac: invalid qlp precision code 1111")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        qlp = [r.read_signed(precision) for _ in range(order)]
        residual = _read_residual(r, order, blocksize)
        for e in residual:
            pred = sum(c * block[len(block) - 1 - j]
                       for j, c in enumerate(qlp)) >> shift
            block.append(e + pred)
    else:
        raise ValueError(f"flac: reserved subframe type {type_code}")
    if wasted:
        block = [s << wasted for s in block]
    return block


_BLOCKSIZE_CODE = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                   **{n: 256 << (n - 8) for n in range(8, 16)}}
_RATE_CODE = {1: 88_200, 2: 176_400, 3: 192_000, 4: 8_000, 5: 16_000,
              6: 22_050, 7: 24_000, 8: 32_000, 9: 44_100, 10: 48_000,
              11: 96_000}
_SIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def flac_decode(payload: bytes):
    """Decode a FLAC stream → ``(sample_rate, bits_per_sample,
    samples)`` where ``samples`` is a flat list (mono) or a
    ``(left, right)`` tuple (stereo) — the mirror of
    :func:`flac_encode`'s input. Verifies the sync codes, header
    CRC-8s, frame CRC-16s, the STREAMINFO sample count, and the PCM
    MD5. All four stereo channel assignments decode (independent L/R
    and the left/right/mid-side decorrelated layouts, whose SIDE
    subframe carries bps+1 bits)."""
    if payload[:4] != b"fLaC":
        raise ValueError("flac: missing fLaC marker")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("flac: truncated metadata block header")
        hdr = payload[pos:pos + 4]
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        length = int.from_bytes(hdr[1:4], "big")
        body = payload[pos + 4:pos + 4 + length]
        if len(body) != length:
            raise ValueError("flac: truncated metadata block body")
        if btype == 0:
            streaminfo = body
        pos += 4 + length
        if last:
            break
    if streaminfo is None or len(streaminfo) != 34:
        raise ValueError("flac: missing STREAMINFO")
    sr_info = BitReader(streaminfo)
    sr_info.read(16)  # min blocksize
    sr_info.read(16)  # max blocksize
    sr_info.read(48)  # min/max framesize
    sample_rate = sr_info.read(20)
    channels = sr_info.read(3) + 1
    bps = sr_info.read(5) + 1
    total = sr_info.read(36)
    md5_expect = streaminfo[18:34]
    if channels not in (1, 2):
        raise ValueError("flac: this decoder covers mono/stereo streams")

    chans: list[list[int]] = [[] for _ in range(channels)]
    r = BitReader(payload, pos)
    while len(chans[0]) < total:
        frame_start = r.byte_pos()
        if r.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        if r.read(1):
            raise ValueError("flac: frame reserved bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        chan_code = r.read(4)
        size_code = r.read(3)
        if r.read(1):
            raise ValueError("flac: frame reserved bit 2 set")
        if channels == 1:
            if chan_code != 0:
                raise ValueError("flac: non-mono channel assignment")
        elif chan_code not in (0b0001, 0b1000, 0b1001, 0b1010):
            raise ValueError(
                f"flac: channel assignment {chan_code:04b} does not fit "
                "a 2-channel stream")
        _read_coded_number(r)
        if bs_code == 0:
            raise ValueError("flac: reserved blocksize code")
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODE[bs_code]
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        elif rate_code == 15:
            raise ValueError("flac: invalid sample-rate code")
        frame_bps = bps if size_code == 0 else _SIZE_CODE[size_code]
        if frame_bps != bps:
            raise ValueError("flac: frame/STREAMINFO sample-size mismatch")
        header_end = r.byte_pos()
        expect_crc8 = r.read(8)
        if crc8(payload[frame_start:header_end]) != expect_crc8:
            raise ValueError("flac: frame header CRC-8 mismatch")
        if channels == 1:
            chans[0].extend(_read_subframe(r, blocksize, bps))
        else:
            # side channel (L−R) carries one extra bit: ch1 for
            # left/side and mid/side, ch0 for right/side
            extra0 = 1 if chan_code == 0b1001 else 0
            extra1 = 1 if chan_code in (0b1000, 0b1010) else 0
            c0 = _read_subframe(r, blocksize, bps + extra0)
            c1 = _read_subframe(r, blocksize, bps + extra1)
            if chan_code == 0b0001:          # independent L/R
                left, right = c0, c1
            elif chan_code == 0b1000:        # left/side
                left = c0
                right = [a - s for a, s in zip(c0, c1)]
            elif chan_code == 0b1001:        # right/side
                right = c1
                left = [b + s for b, s in zip(c1, c0)]
            else:                            # mid/side
                # L+R = 2*mid + (side & 1) (L±R share parity)
                left = [m + ((s + (s & 1)) >> 1)
                        for m, s in zip(c0, c1)]
                right = [a - s for a, s in zip(left, c1)]
            chans[0].extend(left)
            chans[1].extend(right)
        r.align()
        body_end = r.byte_pos()
        expect_crc16 = r.read(16)
        if crc16(payload[frame_start:body_end]) != expect_crc16:
            raise ValueError("flac: frame CRC-16 mismatch")
    if any(len(ch) != total for ch in chans):
        raise ValueError("flac: sample count mismatch")
    pcm = b"".join(struct.pack("<h", ch[i]) for i in range(total)
                   for ch in chans)
    if hashlib.md5(pcm).digest() != md5_expect:
        raise ValueError("flac: PCM MD5 mismatch")
    if channels == 1:
        return sample_rate, bps, chans[0]
    return sample_rate, bps, (chans[0], chans[1])
