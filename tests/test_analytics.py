"""Bounds/determinism checks for the approximate analytics operators."""

from __future__ import annotations

from cstore_fdw_spark.operators import load_all

REGISTRY = load_all()


def test_approx_distinct_within_bound(spark, sf_dir):
    rows = REGISTRY["approx_distinct_sketch"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_in_bounds, r.c_mktsegment


def test_tablesample_deterministic_and_sized(spark, sf_dir):
    df = REGISTRY["tablesample_deterministic"].builder(spark, sf_dir)
    a = sorted(r.o_orderkey for r in df.collect())
    b = sorted(r.o_orderkey for r in
               REGISTRY["tablesample_deterministic"].builder(spark, sf_dir)
               .collect())
    assert a == b, "seeded sample must be reproducible"
    from cstore_fdw_spark.operators import table
    n = table(spark, sf_dir, "orders").count()
    assert 0.05 * n < len(a) < 0.2 * n


def test_image_dims_parse_real_bytes(spark):
    """The real magic-byte parser against genuine image headers: a real
    1x1 PNG, a handcrafted-but-valid JPEG (APP0 + SOF0, per ITU T.81),
    a GIF89a descriptor, and junk — both directly and through the
    distributed mapInPandas pipeline."""
    import base64
    import struct
    from cstore_fdw_spark.operators.multimodal import (
        PNG_1x1_B64, parse_image_dims)

    png = base64.b64decode(PNG_1x1_B64)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"  # genuine signature
    assert parse_image_dims(png) == ("png", 1, 1)

    # minimal valid JPEG structure: SOI, APP0/JFIF, SOF0 (320x240), EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" \
        + struct.pack(">HH", 240, 320) + b"\x03" \
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    jpeg = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    assert parse_image_dims(jpeg) == ("jpeg", 320, 240)
    # progressive JPEG (SOF2) parses too
    jpeg2 = b"\xff\xd8" + app0 + b"\xff\xc2" + sof0[2:] + b"\xff\xd9"
    assert parse_image_dims(jpeg2) == ("jpeg", 320, 240)

    gif = b"GIF89a" + struct.pack("<HH", 7, 9) + b"\x00\x00\x00"
    assert parse_image_dims(gif) == ("gif", 7, 9)

    assert parse_image_dims(b"plain text payload") is None
    assert parse_image_dims(b"") is None

    # and through the distributed Arrow path
    df = spark.createDataFrame(
        [(1, png), (2, jpeg), (3, gif), (4, b"junk")],
        "doc_id long, payload binary")

    def dims(batches):
        import pandas as pd
        for pdf in batches:
            parsed = [parse_image_dims(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "fmt": [p[0] if p else "raw" for p in parsed],
                "width": [p[1] if p else None for p in parsed],
                "height": [p[2] if p else None for p in parsed]})

    out = {r.doc_id: (r.fmt, r.width, r.height)
           for r in df.mapInPandas(
               dims, "doc_id long, fmt string, width long, height long"
           ).collect()}
    assert out == {1: ("png", 1, 1), 2: ("jpeg", 320, 240),
                   3: ("gif", 7, 9), 4: ("raw", None, None)}


def test_png_pixel_decode_round_trip():
    """The REAL pixel decoder: every PNG filter type round-trips
    bit-exact through encode→decode, and the genuine 1x1 RGBA PNG
    constant decodes through the color-type-6 path."""
    import base64
    from cstore_fdw_spark.operators.multimodal import (
        PNG_1x1_B64, png_decode_pixels, png_encode_rgb)

    raster = bytes((7 * k + 3) % 256 for k in range(5 * 4 * 3))
    for f in range(5):  # None, Sub, Up, Average, Paeth
        png = png_encode_rgb(5, 4, raster, filter_type=f)
        w, h, ch, rec = png_decode_pixels(png)
        assert (w, h, ch) == (5, 4, 3)
        assert rec == raster, f"filter {f} corrupted pixels"

    # the real-world 1x1 PNG constant: RGBA, one semi-transparent blue
    # pixel (0, 0, 255, 127)
    w, h, ch, rec = png_decode_pixels(base64.b64decode(PNG_1x1_B64))
    assert (w, h, ch) == (1, 1, 4)
    assert rec == b"\x00\x00\xff\x7f"

    import pytest
    import struct
    import zlib
    from cstore_fdw_spark.operators.multimodal import (
        _png_chunk, png_encode_palette)

    # palette (color type 3): PLTE expansion, all five filters
    pal = [(i, 2 * i, 3 * i) for i in range(16)]
    idx = bytes((3 + k) % 16 for k in range(4 * 3))
    expanded = b"".join(bytes(pal[i]) for i in idx)
    for f in range(5):
        w, h, ch, rec = png_decode_pixels(
            png_encode_palette(4, 3, idx, pal, filter_type=f))
        assert (w, h, ch, rec) == (4, 3, 3, expanded), f

    # 16-bit grayscale: bytewise filtering, big-endian samples
    samples = [1000, 2000, 3000, 40000, 50000, 60000]
    rows16 = b"".join(
        b"\x00" + b"".join(struct.pack(">H", s)
                           for s in samples[y * 3:(y + 1) * 3])
        for y in range(2))
    png16 = (b"\x89PNG\r\n\x1a\n"
             + _png_chunk(b"IHDR", struct.pack(">IIBBBBB",
                                               3, 2, 16, 0, 0, 0, 0))
             + _png_chunk(b"IDAT", zlib.compress(rows16))
             + _png_chunk(b"IEND", b""))
    w, h, ch, rec = png_decode_pixels(png16)
    assert (w, h, ch) == (3, 2, 1)
    assert [struct.unpack(">H", rec[i:i + 2])[0]
            for i in range(0, len(rec), 2)] == samples

    # still-unsupported shapes fail loudly, not wrongly
    ihdr4 = struct.pack(">IIBBBBB", 1, 1, 4, 0, 0, 0, 0)
    shallow = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr4)
               + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00"))
               + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported PNG"):
        png_decode_pixels(shallow)

    # Adam7-interlaced grayscale, 1x1: only pass 1 is non-empty —
    # decodes in pure stdlib (no PIL in this container)
    ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    inter = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr_i)
             + _png_chunk(b"IDAT", zlib.compress(b"\x00\x05"))
             + _png_chunk(b"IEND", b""))
    assert png_decode_pixels(inter) == (1, 1, 1, b"\x05")

    # JPEG pixel decode is the one genuinely codec-bound shape: PIL
    # when installed, honest scope error when not
    from cstore_fdw_spark.operators.multimodal import _pil_decode
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(ValueError, match="PIL is not installed"):
            _pil_decode(b"\xff\xd8\xff\xe0 not-really-a-jpeg")


def test_png_adam7_interlaced_round_trip():
    """Full Adam7 deinterlacing in pure stdlib: odd dimensions exercise
    every pass-geometry edge (partial passes, empty passes), and each
    non-empty pass carries a different scanline filter."""
    from cstore_fdw_spark.operators.multimodal import (
        _adam7_pass_dims, png_decode_pixels, png_encode_rgb,
        png_encode_rgb_interlaced)

    for w, h in [(1, 1), (2, 2), (3, 3), (5, 4), (8, 8), (9, 7), (16, 5)]:
        raster = bytes((11 * k + w + h) % 256 for k in range(w * h * 3))
        dw, dh, ch, rec = png_decode_pixels(
            png_encode_rgb_interlaced(w, h, raster))
        assert (dw, dh, ch) == (w, h, 3), (w, h)
        assert rec == raster, f"interlace corrupted pixels at {w}x{h}"
        # interlaced and sequential encodings of the same raster decode
        # to identical pixels
        assert rec == png_decode_pixels(png_encode_rgb(w, h, raster))[3]

    # pass geometry: 8x8 touches all 7 passes with the RFC pixel counts
    dims = _adam7_pass_dims(8, 8)
    assert [pw * ph for pw, ph in dims] == [1, 1, 2, 4, 8, 16, 32]
    # 1x1 touches only pass 1
    assert [pw * ph for pw, ph in _adam7_pass_dims(1, 1)] == \
        [1, 0, 0, 0, 0, 0, 0]


def test_wav_pcm_round_trip():
    """Real RIFF/WAVE codec: canonical round trip, extra-chunk tolerance
    with odd-size padding, and honest rejection of unsupported shapes."""
    import struct

    import pytest

    from cstore_fdw_spark.operators.multimodal import (
        wav_decode_pcm16, wav_encode_pcm16)

    samples = [(k * 1234 - 5000) % 65536 - 32768 for k in range(321)]
    payload = wav_encode_pcm16(16000, samples)
    assert wav_decode_pcm16(payload) == \
        (16000, 321, sum(s * s for s in samples))

    # RIFF allows unknown chunks anywhere; odd sizes pad to even offsets
    inject = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    assert wav_decode_pcm16(payload[:12] + inject + payload[12:]) == \
        (16000, 321, sum(s * s for s in samples))

    with pytest.raises(ValueError, match="RIFF/WAVE"):
        wav_decode_pcm16(b"OggS not a wav")
    # stereo rejected with the honest scope error
    stereo_fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    bad = (b"RIFF" + struct.pack("<I", 4 + 8 + 16) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + stereo_fmt)
    with pytest.raises(ValueError, match="PCM mono 16-bit"):
        wav_decode_pcm16(bad)
    with pytest.raises(ValueError, match="no data chunk"):
        wav_decode_pcm16(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_wav_ulaw_companding_exhaustive_and_container():
    """G.711 mu-law (round-10 second audio codec): (1) the byte codec's
    decode(encode(s)) must equal the closed arithmetic form the DuckDB
    oracle uses for EVERY one of the 65536 PCM16 inputs — segment CASE,
    mantissa shift, midpoint reconstruction; (2) container round trip
    through WAV format code 7; (3) honest rejection of non-mu-law
    shapes (a PCM16 payload fed to the mu-law decoder)."""
    import struct

    import pytest

    from cstore_fdw_spark.operators.multimodal import (
        ULAW_BIAS, ULAW_CLIP, ulaw_decode_sample, ulaw_encode_sample,
        wav_decode_ulaw, wav_encode_pcm16, wav_encode_ulaw)

    def closed_form(s):
        x = min(abs(s), ULAW_CLIP) + ULAW_BIAS
        exp = 0
        while x >= (1 << (exp + 8)):
            exp += 1
        y = (((x >> (exp + 3)) & 15) * 8 + ULAW_BIAS) * (1 << exp) \
            - ULAW_BIAS
        return -y if s < 0 else y

    for s in range(-32768, 32768):
        assert ulaw_decode_sample(ulaw_encode_sample(s)) == closed_form(s)
    # companding is log: error grows with amplitude but is bounded
    assert max(abs(ulaw_decode_sample(ulaw_encode_sample(s)) - s)
               for s in range(-32768, 32768, 13)) < 1024
    # silence encodes to 0xFF per the ones-complement convention
    assert ulaw_encode_sample(0) == 0xFF

    samples = [(k * 987 - 7000) % 65536 - 32768 for k in range(257)]
    payload = wav_encode_ulaw(8000, samples)
    assert wav_decode_ulaw(payload) == (
        8000, 257, sum(closed_form(s) ** 2 for s in samples))

    with pytest.raises(ValueError, match="mu-law mono 8-bit"):
        wav_decode_ulaw(wav_encode_pcm16(8000, [0, 1, 2]))
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        wav_decode_ulaw(b"ID3 not a wav")


def test_y4m_round_trip():
    """Real YUV4MPEG2 codec: round trip across frame counts and odd
    header orders, plus honest rejection of unsupported shapes."""
    import pytest

    from cstore_fdw_spark.operators.multimodal import y4m_decode, y4m_encode

    for w, h, nf in [(2, 2, 1), (6, 4, 3), (8, 2, 5)]:
        frames = []
        for f in range(nf):
            y = bytes((f * 17 + p) % 256 for p in range(w * h))
            c = bytes((w // 2) * (h // 2))
            frames.append((y, c, c))
        expect = sum(sum(fr[0]) for fr in frames)
        assert y4m_decode(y4m_encode(w, h, frames)) == (w, h, nf, expect)

    # header tags in any order; unknown tags ignored
    reordered = (b"YUV4MPEG2 C420jpeg F25:1 H2 W2 Xcustom\n"
                 b"FRAME\n" + bytes(range(4)) + bytes(2))
    assert y4m_decode(reordered) == (2, 2, 1, 0 + 1 + 2 + 3)

    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        y4m_decode(b"RIFF....WAVE")
    with pytest.raises(ValueError, match="unsupported Y4M colorspace"):
        y4m_decode(b"YUV4MPEG2 W2 H2 C444\nFRAME\n" + bytes(12))
    with pytest.raises(ValueError, match="missing W/H"):
        y4m_decode(b"YUV4MPEG2 F25:1\n")
    with pytest.raises(ValueError, match="bad FRAME marker"):
        y4m_decode(b"YUV4MPEG2 W2 H2\nJUNK\n" + bytes(6))


def test_gif_lzw_round_trip():
    """Real GIF89a codec: palette round trip, a hand-packed LZW stream
    exercising dictionary growth and the KwK special case (which the
    clear-per-literal encoder never emits), and honest rejections."""
    import struct

    import pytest

    from cstore_fdw_spark.operators.multimodal import (
        _lzw_decode, gif_decode, gif_encode)

    pal = [(0, 10, 20), (1, 11, 21), (2, 12, 22), (3, 13, 23)]
    for w, h in [(1, 1), (5, 3), (16, 16)]:
        idx = bytes((p * 5 + 1) % 4 for p in range(w * h))
        assert gif_decode(gif_encode(w, h, idx, pal)) == (
            w, h, 3, bytes(b for px in idx for b in pal[px]))

    # hand-packed stream: clear(4),1,6(KwK->'11'),6('11'),end(5);
    # the second 6 pushes the table to 8 entries so END reads at width 4
    def pack(code_widths):
        acc = nbits = 0
        out = bytearray()
        for code, width in code_widths:
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    stream = pack([(4, 3), (1, 3), (6, 3), (6, 3), (5, 4)])
    assert _lzw_decode(stream, 2, 5) == b"\x01\x01\x01\x01\x01"

    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"PNG????")
    with pytest.raises(ValueError, match="interlaced GIF"):
        # flip the interlace bit in a valid payload's image descriptor
        good = bytearray(gif_encode(2, 2, b"\x00\x01\x02\x03", pal))
        desc = good.index(0x2C, 13)
        good[desc + 9] |= 0x40
        gif_decode(bytes(good))
    with pytest.raises(ValueError, match="truncated"):
        _lzw_decode(pack([(4, 3), (1, 3)]), 2, 99)
    with pytest.raises(ValueError, match="corrupt LZW"):
        _lzw_decode(pack([(4, 3), (7, 3)]), 2, 2)


def test_png_gray16_round_trip():
    """Depth-16 PNG: filters act on BYTES with bpp=2 (RFC 2083 §6.2);
    the writer cycles all five filters against the true previous row."""
    from cstore_fdw_spark.operators.multimodal import (
        png_decode_pixels, png_encode_gray16)

    for w, h, seed in [(1, 1, 0), (3, 7, 23), (8, 6, 46), (5, 5, 99)]:
        samples = [(seed * 97 + p * 13) % 65536 for p in range(w * h)]
        dw, dh, ch, raster = png_decode_pixels(
            png_encode_gray16(w, h, samples))
        assert (dw, dh, ch) == (w, h, 1)
        assert raster == b"".join(
            bytes([s >> 8, s & 255]) for s in samples), (w, h)


def test_bmp_round_trip():
    """Real BMP codec: padding (widths 1-7 cover pads 0-3), bottom-up
    flip, BGR swap, top-down negative-height variant, rejections."""
    import struct

    import pytest

    from cstore_fdw_spark.operators.multimodal import (
        bmp_decode, bmp_encode_rgb)

    for w, h in [(1, 1), (2, 3), (3, 2), (4, 4), (5, 1), (7, 6)]:
        raster = bytes((w * 31 + h * 7 + k) % 256 for k in range(w * h * 3))
        assert bmp_decode(bmp_encode_rgb(w, h, raster)) == \
            (w, h, 3, raster), (w, h)

    # top-down (negative height) variant decodes to the same raster
    raster = bytes(range(2 * 2 * 3))
    payload = bytearray(bmp_encode_rgb(2, 2, raster))
    payload[18:26] = struct.pack("<ii", 2, -2)
    # rows were stored bottom-up; a top-down flag means they now read in
    # file order, so the expected raster is the row-flip of the original
    flipped = raster[6:12] + raster[0:6]
    assert bmp_decode(bytes(payload)) == (2, 2, 3, flipped)

    with pytest.raises(ValueError, match="not a BMP"):
        bmp_decode(b"PNG x")
    bad = bytearray(bmp_encode_rgb(2, 2, bytes(12)))
    bad[28:30] = struct.pack("<H", 8)  # 8-bit paletted
    with pytest.raises(ValueError, match="24-bit uncompressed"):
        bmp_decode(bytes(bad))


def test_jpeg_dc_only_round_trip_exact():
    """Constant 8x8 blocks survive JPEG exactly (DC-only, q=1): the
    encoder's category-coded DC deltas and the decoder's full entropy
    pipeline must agree pixel-for-pixel."""
    from cstore_fdw_spark.operators.jpeg_codec import (
        jpeg_decode_baseline, jpeg_encode_gray_blocks)

    def bv(bx, by):
        return (bx * 91 + by * 57) % 256

    payload = jpeg_encode_gray_blocks(24, 16, bv)
    w, h, ch, raster = jpeg_decode_baseline(payload)
    assert (w, h, ch) == (24, 16, 1)
    for y in range(16):
        for x in range(24):
            assert raster[y * 24 + x] == bv(x // 8, y // 8)


def test_jpeg_zigzag_is_the_standard_walk():
    from cstore_fdw_spark.operators.jpeg_codec import _ZZ

    assert _ZZ[:16] == [0, 1, 8, 16, 9, 2, 3, 10,
                        17, 24, 32, 25, 18, 11, 4, 5]
    assert _ZZ[-4:] == [47, 55, 62, 63]
    assert sorted(_ZZ) == list(range(64))


def _jpeg_stream(blocks, *, w, h, dri=0, q=1):
    """Hand-rolled single-component baseline stream for decoder tests:
    ``blocks`` is a list of (dc, {zigzag_index: ac_value}) per 8x8 block.
    Uses a DHT with enough AC run/size symbols for small coefficients."""
    import struct as st

    from cstore_fdw_spark.operators.jpeg_codec import (
        _DC_BITS, _DC_VALS, _canonical_encode_table)

    ac_bits = [0, 2, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x00, 0x02, 0x22, 0x41, 0xF0, 0x01]  # EOB + runs + ZRL
    enc_dc = _canonical_encode_table(_DC_BITS, _DC_VALS)
    enc_ac = _canonical_encode_table(ac_bits, ac_vals)
    segs = [b"\xff\xd8",
            b"\xff\xdb" + st.pack(">H", 67) + bytes([0]) + bytes([q] * 64)]
    sof = st.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    segs.append(b"\xff\xc0" + st.pack(">H", 2 + len(sof)) + sof)
    dht = (bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
           + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    segs.append(b"\xff\xc4" + st.pack(">H", 2 + len(dht)) + dht)
    if dri:
        segs.append(b"\xff\xdd" + st.pack(">HH", 4, dri))
    segs.append(b"\xff\xda" + st.pack(">H", 8) + bytes([1, 1, 0, 0, 63, 0]))

    def emit(bits, val, n):
        bits.append((val, n))

    def flush(bits):
        out, acc, nacc = bytearray(), 0, 0
        for val, n in bits:
            acc = (acc << n) | val
            nacc += n
            while nacc >= 8:
                nacc -= 8
                b = (acc >> nacc) & 0xFF
                acc &= (1 << nacc) - 1
                out.append(b)
                if b == 0xFF:
                    out.append(0)
        if nacc:
            b = ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0)
        return bytes(out)

    pred = 0
    body = []
    bits = []
    for i, (dc, acs) in enumerate(blocks):
        if dri and i and i % dri == 0:
            body.append(flush(bits))
            body.append(bytes([0xFF, 0xD0 + (i // dri - 1) % 8]))
            bits = []
            pred = 0
        diff = dc - pred
        pred = dc
        s = abs(diff).bit_length()
        emit(bits, *enc_dc[s])
        if s:
            mag = diff if diff >= 0 else diff + (1 << s) - 1
            emit(bits, mag & ((1 << s) - 1), s)
        k = 1
        last = max(acs) if acs else 0
        while k <= last:
            if k in acs:
                v = acs[k]
                sz = abs(v).bit_length()
                emit(bits, *enc_ac[(0 << 4) | sz])
                mag = v if v >= 0 else v + (1 << sz) - 1
                emit(bits, mag & ((1 << sz) - 1), sz)
                k += 1
            else:
                # encode a single zero via run-length on the next coeff
                nxt = min(kk for kk in acs if kk > k)
                run = nxt - k
                while run > 15:
                    emit(bits, *enc_ac[0xF0])
                    run -= 16
                v = acs[nxt]
                sz = abs(v).bit_length()
                emit(bits, *enc_ac[(run << 4) | sz])
                mag = v if v >= 0 else v + (1 << sz) - 1
                emit(bits, mag & ((1 << sz) - 1), sz)
                k = nxt + 1
        if last < 63:
            emit(bits, *enc_ac[0x00])
    body.append(flush(bits))
    segs.append(b"".join(body))
    segs.append(b"\xff\xd9")
    return b"".join(segs)


def _reference_idct(coefs):
    """Independent direct IDCT (separate implementation from the module:
    no shared tables) for value-checking the AC path."""
    import math
    out = []
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    c = coefs[v * 8 + u]
                    if not c:
                        continue
                    cu = math.sqrt(0.5) if u == 0 else 1.0
                    cv = math.sqrt(0.5) if v == 0 else 1.0
                    s += (cu * cv * c
                          * math.cos((2 * x + 1) * u * math.pi / 16)
                          * math.cos((2 * y + 1) * v * math.pi / 16))
            px = round(s / 4) + 128
            out.append(min(255, max(0, px)))
    return out


def test_jpeg_ac_coefficients_and_runs():
    """Nonzero AC coefficients (with zero-runs and category coding)
    decode to exactly the reference IDCT's pixels — the lossy path is
    deterministic even though it isn't closed-form."""
    from cstore_fdw_spark.operators.jpeg_codec import (
        _ZZ, jpeg_decode_baseline)

    # zigzag indices -> values (q=1); exercises run/size coding AND a
    # ZRL sixteen-zero skip (k=10 -> 30 is a 20-coefficient gap)
    acs = {1: 3, 4: -2, 9: 1, 30: 1}
    payload = _jpeg_stream([(40, acs), (-24, {})], w=16, h=8)
    w, h, ch, raster = jpeg_decode_baseline(payload)
    assert (w, h, ch) == (16, 8, 1)
    coefs = [0] * 64
    coefs[0] = 40
    for zk, v in acs.items():
        coefs[_ZZ[zk]] = v
    expect0 = _reference_idct(coefs)
    expect1 = _reference_idct([-24] + [0] * 63)
    for y in range(8):
        assert list(raster[y * 16:y * 16 + 8]) == expect0[y * 8:y * 8 + 8]
        assert list(raster[y * 16 + 8:y * 16 + 16]) \
            == expect1[y * 8:y * 8 + 8]


def test_jpeg_restart_markers_reset_dc_prediction():
    from cstore_fdw_spark.operators.jpeg_codec import jpeg_decode_baseline

    blocks = [(8 * (50 - 128), {}), (8 * (60 - 128), {}),
              (8 * (70 - 128), {}), (8 * (80 - 128), {})]
    payload = _jpeg_stream(blocks, w=32, h=8, dri=2)
    w, h, ch, raster = jpeg_decode_baseline(payload)
    assert (w, h, ch) == (32, 8, 1)
    assert [raster[b * 8] for b in range(4)] == [50, 60, 70, 80]


def test_jpeg_quant_table_applies():
    from cstore_fdw_spark.operators.jpeg_codec import jpeg_decode_baseline

    # DC quantized value 8*(v-128)/q with q=4: store 8*(200-128)/4 = 144
    payload = _jpeg_stream([(144, {})], w=8, h=8, q=4)
    _w, _h, _ch, raster = jpeg_decode_baseline(payload)
    assert set(raster) == {200}


def test_jpeg_color_ycbcr_to_rgb():
    """3-component 4:4:4 stream with constant planes: every pixel is the
    BT.601 conversion of (Y, Cb, Cr)."""
    import struct as st

    from cstore_fdw_spark.operators.jpeg_codec import (
        _DC_BITS, _DC_VALS, _canonical_encode_table, jpeg_decode_baseline)

    yv, cb, cr = 150, 120, 140
    enc_dc = _canonical_encode_table(_DC_BITS, _DC_VALS)
    ac_bits = [1] + [0] * 15
    enc_ac = _canonical_encode_table(ac_bits, [0x00])
    segs = [b"\xff\xd8",
            b"\xff\xdb" + st.pack(">H", 67) + bytes([0]) + bytes([1] * 64)]
    sof = (st.pack(">BHHB", 8, 8, 8, 3)
           + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
    segs.append(b"\xff\xc0" + st.pack(">H", 2 + len(sof)) + sof)
    dht = (bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
           + bytes([0x10]) + bytes(ac_bits) + bytes([0x00]))
    segs.append(b"\xff\xc4" + st.pack(">H", 2 + len(dht)) + dht)
    segs.append(b"\xff\xda" + st.pack(">H", 12)
                + bytes([3, 1, 0, 2, 0, 3, 0, 0, 63, 0]))
    bits = []
    for val in (yv, cb, cr):
        dc = 8 * (val - 128)
        s = abs(dc).bit_length()
        bits.append(enc_dc[s])
        mag = dc if dc >= 0 else dc + (1 << s) - 1
        bits.append((mag & ((1 << s) - 1), s))
        bits.append(enc_ac[0x00])
    out, acc, nacc = bytearray(), 0, 0
    for val, n in bits:
        acc = (acc << n) | val
        nacc += n
        while nacc >= 8:
            nacc -= 8
            b = (acc >> nacc) & 0xFF
            acc &= (1 << nacc) - 1
            out.append(b)
            if b == 0xFF:
                out.append(0)
    if nacc:
        b = ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
        out.append(b)
        if b == 0xFF:
            out.append(0)
    segs += [bytes(out), b"\xff\xd9"]
    w, h, ch, raster = jpeg_decode_baseline(b"".join(segs))
    assert (w, h, ch) == (8, 8, 3)
    er = min(255, max(0, round(yv + 1.402 * (cr - 128))))
    eg = min(255, max(0, round(yv - 0.344136 * (cb - 128)
                               - 0.714136 * (cr - 128))))
    eb = min(255, max(0, round(yv + 1.772 * (cb - 128))))
    assert raster[:3] == bytes([er, eg, eb])
    assert set(raster[i::3][j] for i in range(3) for j in range(64)) \
        == {er, eg, eb}


def test_jpeg_scope_errors():
    """The decoder's honest scope boundary after the subsampled-color-
    progressive addition: sampling factors above 2 still raise the
    scope error, junk still raises SOI, 16-bit DQT still refused —
    while 4:2:0 color SOF2 now DECODES (positive differential cases in
    test_jpeg_progressive_420_matches_baseline below)."""
    import struct as st

    import pytest

    from cstore_fdw_spark.operators.jpeg_codec import jpeg_decode_baseline

    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode_baseline(b"junk")
    # sampling factor 3 progressive refused with the honest scope
    # error; any 1-2 sampling (4:4:4/4:2:2/4:2:0) is now in scope
    sof2_samp3 = (b"\xff\xd8" + b"\xff\xc2" + st.pack(">H", 17)
                  + st.pack(">BHHB", 8, 8, 8, 3)
                  + bytes([1, 0x33, 0, 2, 0x11, 1, 3, 0x11, 1]))
    with pytest.raises(ValueError, match="sampling factors above 2"):
        jpeg_decode_baseline(sof2_samp3)
    # 4-component (CMYK-style) progressive refused
    sof2_4c = (b"\xff\xd8" + b"\xff\xc2" + st.pack(">H", 20)
               + st.pack(">BHHB", 8, 8, 8, 4)
               + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0]))
    with pytest.raises(ValueError, match="component"):
        jpeg_decode_baseline(sof2_4c)
    # 16-bit DQT refused
    dqt16 = (b"\xff\xd8" + b"\xff\xdb" + st.pack(">H", 131)
             + bytes([0x10]) + bytes(128))
    with pytest.raises(ValueError, match="16-bit"):
        jpeg_decode_baseline(dqt16)
    # arithmetic-coded SOF9 refused
    sof9 = (b"\xff\xd8" + b"\xff\xc9" + st.pack(">H", 11)
            + st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match="arithmetic"):
        jpeg_decode_baseline(sof9)


def test_jpeg_progressive_grayscale_decodes():
    """Positive contract for the Annex-G path: a handcrafted two-scan
    grayscale progressive JPEG (first-DC scan at al=1, then a DC
    refinement scan at ah=1/al=0) decodes through the real successive-
    approximation machinery to the exact constant raster. DC = 576 with
    q=1 ⇒ every pixel = 576/8 + 128 = 200."""
    import struct as st

    from cstore_fdw_spark.operators.jpeg_codec import (
        _DC_BITS, _DC_VALS, _canonical_encode_table, jpeg_decode_baseline)

    def entropy(bits):
        bits = list(bits)
        while len(bits) % 8:
            bits.append(1)  # pad to byte with 1s, per T.81
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)  # byte stuffing
        return bytes(out)

    enc_dc = _canonical_encode_table(_DC_BITS, _DC_VALS)

    def code_bits(sym):
        code, length = enc_dc[sym]
        return [(code >> (length - 1 - i)) & 1 for i in range(length)]

    def value_bits(v, s):
        return [(v >> (s - 1 - i)) & 1 for i in range(s)]

    dqt = b"\xff\xdb" + st.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof2 = (b"\xff\xc2" + st.pack(">H", 11)
            + st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht = (b"\xff\xc4" + st.pack(">H", 19 + len(_DC_VALS))
           + b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    # scan 1: first DC scan at al=1 — point-transformed DC 576>>1 = 288,
    # category 9, so the stream carries the cat-9 code + 9 magnitude bits
    sos1 = (b"\xff\xda" + st.pack(">H", 8)
            + bytes([1, 1, 0x00, 0, 0, 0x01]))
    scan1 = entropy(code_bits(9) + value_bits(288, 9))
    # scan 2: DC refinement (ah=1, al=0) — one raw bit per block; bit 0
    # because 576 & 1 == 0
    sos2 = (b"\xff\xda" + st.pack(">H", 8)
            + bytes([1, 1, 0x00, 0, 0, 0x10]))
    scan2 = entropy([0])
    payload = (b"\xff\xd8" + dqt + sof2 + dht
               + sos1 + scan1 + sos2 + scan2 + b"\xff\xd9")

    w, h, ch, raster = jpeg_decode_baseline(payload)
    assert (w, h, ch) == (8, 8, 1)
    assert raster == bytes([200] * 64)


def test_bpe_merge_convention_is_greedy_left():
    """The double-space replace convention must implement greedy
    left-to-right non-overlapping BPE: 'a a a' merges ONCE under rule
    (a, a), and multiple disjoint occurrences all merge in one pass."""
    from pyspark.sql import functions as F

    def apply_merge(seq: str, pair: str) -> str:
        merged = pair.replace(" ", "")
        padded = " " + seq.replace(" ", "  ") + " "
        out = padded.replace(" " + pair.replace(" ", "  ") + " ",
                             " " + merged + " ")
        return out.replace("  ", " ").strip()

    assert apply_merge("a a a", "a a") == "aa a"
    assert apply_merge("a a a a", "a a") == "aa aa"
    assert apply_merge("x a b y a b", "a b") == "x ab y ab"
    assert apply_merge("a b", "a b") == "ab"
    assert apply_merge("c", "a b") == "c"
    # merged symbols participate in later rounds
    assert apply_merge(apply_merge("l o w", "l o"), "lo w") == "low"


def test_bpe_train_learns_deterministic_rules(spark):
    """End-to-end trainer on a controlled corpus: the pair counts and
    the merge order follow the exact frequency arithmetic."""
    import cstore_fdw_spark.operators.text as text_mod

    docs = spark.createDataFrame(
        [(1, "aab aab aab"), (2, "aab ab"), (3, "bb")],
        "doc_id long, text string")
    orig_table, orig_merges = text_mod.table, text_mod.BPE_MERGES
    text_mod.table = lambda sp, sf, name: docs
    text_mod.BPE_MERGES = 2
    try:
        out = {tuple(r) for r in
               text_mod.text_bpe_train(spark, "unused").collect()}
    finally:
        text_mod.table, text_mod.BPE_MERGES = orig_table, orig_merges
    # word freqs: aab x4, ab x1, bb x1
    # round 0 pairs: ('a a', 4), ('a b', 4+1=5), ('b b', 1) -> merge 'a b'
    # round 1 over {a ab x4, ab x1, b b x1}: ('a ab', 4), ('b b', 1)
    assert out == {(0, "a b", "ab", 5), (1, "a ab", "aab", 4)}


def test_countmin_bound_and_no_false_negatives(spark, sf_dir):
    """The count-min contract, asserted on real data: estimates NEVER
    undercount (overcount >= 0 row-wise), and therefore every truly
    heavy token survives the estimate-side threshold (no false
    negatives — the sketch's one-sided guarantee)."""
    from cstore_fdw_spark.operators import load_all
    from cstore_fdw_spark.operators.analytics import CMS_PHI_DEN

    out = load_all()["stats_countmin_heavy_hitters"].builder(
        spark, sf_dir).collect()
    assert out, "no heavy hitters found at all"
    assert all(r.overcount >= 0 for r in out)
    assert all(r.est_count >= r.exact_count for r in out)

    # independent exact heavy-hitter set: every one must be reported
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = (docs.select(F.explode(F.split("text", " ")).alias("token"))
             .groupBy("token").count())
    total = exact.agg(F.sum("count")).collect()[0][0]
    truly_heavy = {r.token for r in
                   exact.filter(F.col("count") >= total // CMS_PHI_DEN)
                   .collect()}
    reported = {r.token for r in out}
    assert truly_heavy <= reported, truly_heavy - reported


def test_dhash_clusters_follow_image_groups(spark, sf_dir):
    """dHash dedup must collapse EXACTLY along the constructed image
    groups: every cluster holds one doc_id % 7 class, every keeper is
    its cluster's min doc_id, and the noise never splits a group."""
    from collections import defaultdict

    from cstore_fdw_spark.operators import load_all

    rows = load_all()["multimodal_image_dhash_dedup"].builder(
        spark, sf_dir).collect()
    assert rows
    by_hash = defaultdict(list)
    for r in rows:
        by_hash[r.dhash].append(r)
    groups_seen = {r.doc_id % 7 for r in rows}
    assert len(by_hash) == len(groups_seen)  # no group split or merged
    for members in by_hash.values():
        assert len({m.doc_id % 7 for m in members}) == 1
        keeper = min(m.doc_id for m in members)
        assert all(m.keeper_id == keeper for m in members)
        assert all(m.is_dup == (m.doc_id != keeper) for m in members)


def test_bm25_scores_rank_consistently(spark, sf_dir):
    """Per term: scores non-increasing with rank, ranks dense from 1,
    and a higher tf at equal length never ranks below a lower tf."""
    from collections import defaultdict

    from cstore_fdw_spark.operators import load_all

    rows = load_all()["text_bm25_rank"].builder(spark, sf_dir).collect()
    assert rows
    by_term = defaultdict(list)
    for r in rows:
        by_term[r.term].append(r)
    for term, rs in by_term.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True), term


def test_jpeg_progressive_color_decodes():
    """4:4:4 color progressive (round-8 extension): one INTERLEAVED
    first-DC scan carrying all three components (each with its own
    predictor) decodes through the per-component coefficient stores and
    the shared YCbCr->RGB render. DC_Y = 576 (y=200), DC_Cb = 0
    (cb=128), DC_Cr = 80 (cr=138) => every pixel (214, 193, 200)."""
    import struct as st

    from cstore_fdw_spark.operators.jpeg_codec import (
        _DC_BITS, _DC_VALS, _canonical_encode_table, jpeg_decode_baseline)

    enc_dc = _canonical_encode_table(_DC_BITS, _DC_VALS)

    def code_bits(sym):
        code, length = enc_dc[sym]
        return [(code >> (length - 1 - i)) & 1 for i in range(length)]

    def value_bits(v, s):
        return [(v >> (s - 1 - i)) & 1 for i in range(s)]

    def entropy(bits):
        bits = list(bits)
        while len(bits) % 8:
            bits.append(1)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)

    dqt = b"\xff\xdb" + st.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof2 = (b"\xff\xc2" + st.pack(">H", 17)
            + st.pack(">BHHB", 8, 8, 8, 3)
            + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
    dht = (b"\xff\xc4" + st.pack(">H", 19 + len(_DC_VALS))
           + b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    # one interleaved DC-first scan (al=0): Y diff 576 (cat 10),
    # Cb diff 0 (cat 0), Cr diff 80 (cat 7)
    sos = (b"\xff\xda" + st.pack(">H", 12)
           + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x00]))
    scan = entropy(code_bits(10) + value_bits(576, 10)
                   + code_bits(0)
                   + code_bits(7) + value_bits(80, 7))
    payload = (b"\xff\xd8" + dqt + sof2 + dht + sos + scan + b"\xff\xd9")

    w, h, ch, raster = jpeg_decode_baseline(payload)
    assert (w, h, ch) == (8, 8, 3)
    assert raster == bytes([214, 193, 200] * 64)


def _jpeg_color_streams(w, h, dc, acs):
    """Differential fixture: the SAME 4:2:0 color coefficients (Y at
    2x2, Cb/Cr at 1x1; ``dc[cid][(row, col)]`` over each component's
    MCU-PADDED grid, ``acs[cid][(row, col)]`` zigzag→value on real
    blocks) emitted BOTH as a baseline-sequential stream and as a
    three-scan progressive stream (interleaved first-DC at al=1, DC
    refinement, then a non-interleaved first-AC scan per component
    that has ACs). Returns (baseline_bytes, progressive_bytes)."""
    import struct as st

    from cstore_fdw_spark.operators.jpeg_codec import (
        _DC_BITS, _DC_VALS, _canonical_encode_table)

    comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
    ac_bits = [0, 2, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x00, 0x02, 0x22, 0x41, 0xF0, 0x01]
    enc_dc = _canonical_encode_table(_DC_BITS, _DC_VALS)
    enc_ac = _canonical_encode_table(ac_bits, ac_vals)
    mcux, mcuy = -(-w // 16), -(-h // 16)

    def code_bits(tbl, sym):
        code, length = tbl[sym]
        return [(code >> (length - 1 - i)) & 1 for i in range(length)]

    def value_bits(v, s):
        mag = v if v >= 0 else v + (1 << s) - 1
        return [(mag >> (s - 1 - i)) & 1 for i in range(s)]

    def entropy(bits):
        bits = list(bits)
        while len(bits) % 8:
            bits.append(1)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)

    def dc_code(diff):
        s = abs(diff).bit_length()
        return code_bits(enc_dc, s) + (value_bits(diff, s) if s else [])

    def ac_block(block_acs):
        bits = []
        k, last = 1, max(block_acs) if block_acs else 0
        while k <= last:
            if k in block_acs:
                v = block_acs[k]
                sz = abs(v).bit_length()
                bits += code_bits(enc_ac, sz)  # run 0
                bits += value_bits(v, sz)
                k += 1
            else:
                nxt = min(kk for kk in block_acs if kk > k)
                run, v = nxt - k, block_acs[nxt]
                sz = abs(v).bit_length()
                bits += code_bits(enc_ac, (run << 4) | sz)
                bits += value_bits(v, sz)
                k = nxt + 1
        if last < 63:
            bits += code_bits(enc_ac, 0x00)  # EOB
        return bits

    def mcu_walk():
        for mi in range(mcux * mcuy):
            my, mx = divmod(mi, mcux)
            for cid, ch, cv in comps:
                for by in range(cv):
                    for bx in range(ch):
                        yield cid, my * cv + by, mx * ch + bx

    def headers(sof_marker):
        segs = [b"\xff\xd8",
                b"\xff\xdb" + st.pack(">H", 67) + b"\x00" + bytes([1] * 64)]
        sof = (st.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
        segs.append(sof_marker + st.pack(">H", 2 + len(sof)) + sof)
        dht = (bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
               + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        segs.append(b"\xff\xc4" + st.pack(">H", 2 + len(dht)) + dht)
        return segs

    # --- baseline: one interleaved scan, DC+AC per block in MCU order
    base = headers(b"\xff\xc0")
    base.append(b"\xff\xda" + st.pack(">H", 12)
                + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    pred = {cid: 0 for cid, _, _ in comps}
    bits = []
    for cid, row, col in mcu_walk():
        v = dc[cid][(row, col)]
        bits += dc_code(v - pred[cid])
        pred[cid] = v
        bits += ac_block(acs.get(cid, {}).get((row, col), {}))
    base.append(entropy(bits))
    base.append(b"\xff\xd9")

    # --- progressive: interleaved first-DC (al=1), DC refinement,
    #     then per-component AC-first scans over the REAL grid
    prog = headers(b"\xff\xc2")
    prog.append(b"\xff\xda" + st.pack(">H", 12)
                + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01]))
    pred = {cid: 0 for cid, _, _ in comps}
    bits = []
    for cid, row, col in mcu_walk():
        v = dc[cid][(row, col)] >> 1
        bits += dc_code(v - pred[cid])
        pred[cid] = v
    prog.append(entropy(bits))
    prog.append(b"\xff\xda" + st.pack(">H", 12)
                + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10]))
    prog.append(entropy([dc[cid][(row, col)] & 1
                         for cid, row, col in mcu_walk()]))
    for cid, ch, cv in comps:
        if cid not in acs:
            continue  # all-zero AC band: a scan may simply never come
        # real (unpadded) grid dims; hmax = vmax = 2 in this fixture
        cw, chh = -(-(w * ch) // 2), -(-(h * cv) // 2)
        bw, bh = -(-cw // 8), -(-chh // 8)
        prog.append(b"\xff\xda" + st.pack(">H", 8)
                    + bytes([1, cid, 0x00, 1, 63, 0x00]))
        bits = []
        for bi in range(bw * bh):
            bits += ac_block(acs[cid].get((bi // bw, bi % bw), {}))
        prog.append(entropy(bits))
    prog.append(b"\xff\xd9")
    return b"".join(base), b"".join(prog)


def test_jpeg_progressive_420_matches_baseline():
    """4:2:0 subsampled color progressive (the last in-scope codec
    boundary): the same coefficients decoded through the progressive
    path (interleaved DC over the subsampled MCU walk + per-component
    AC scans on each component's own grid) must produce the EXACT
    raster the baseline path produces. 16×16 = clean 2×2 luma grid."""
    from cstore_fdw_spark.operators.jpeg_codec import jpeg_decode_baseline

    dc = {1: {(0, 0): 561, (0, 1): 568, (1, 0): 577, (1, 1): 584},
          2: {(0, 0): 0}, 3: {(0, 0): 80}}
    acs = {1: {(0, 0): {1: 3}}}
    base, prog = _jpeg_color_streams(16, 16, dc, acs)
    wb, hb, cb, rb = jpeg_decode_baseline(base)
    wp, hp, cp, rp = jpeg_decode_baseline(prog)
    assert (wb, hb, cb) == (16, 16, 3) == (wp, hp, cp)
    assert rb == rp
    assert len(set(rb)) > 1  # the AC coefficient actually shaped pixels


def test_jpeg_progressive_420_dummy_blocks_match_baseline():
    """24×8 at 2×2 luma sampling: the MCU walk entropy-codes luma
    padding blocks (row 1 and column 3 of the padded grid) that the
    real 3×1 luma grid never renders — both paths must consume those
    bits identically, keep DC prediction in sync through them, and
    agree on every rendered pixel."""
    from cstore_fdw_spark.operators.jpeg_codec import jpeg_decode_baseline

    dc = {1: {(r, c): 100 * r + 16 * c + 401 for r in range(2)
              for c in range(4)},
          2: {(0, 0): 24, (0, 1): -17}, 3: {(0, 0): 80, (0, 1): 3}}
    acs = {1: {(0, 1): {1: 3, 4: -2}}, 2: {(0, 0): {1: 2}}}
    base, prog = _jpeg_color_streams(24, 8, dc, acs)
    wb, hb, cb, rb = jpeg_decode_baseline(base)
    wp, hp, cp, rp = jpeg_decode_baseline(prog)
    assert (wb, hb, cb) == (24, 8, 3) == (wp, hp, cp)
    assert rb == rp
    assert len(set(rb)) > 1


def test_hdr_quantile_sketch_guarantee(spark, sf_dir):
    """The HDR sketch's contract, checked against ground truth: for each
    group and quantile, the EXACT discrete quantile falls inside the
    reported [lo, hi] bucket, and the bucket's relative width honors the
    2^-M geometry bound. Also: the sketch is deterministic (two builds
    agree) — it had better be, its oracle hash-matches."""
    from pyspark.sql import functions as F

    from cstore_fdw_spark.operators import table
    from cstore_fdw_spark.operators.analytics import HDR_M

    rows = {r.l_returnflag: r for r in
            REGISTRY["stats_hdr_quantile_sketch"].builder(spark, sf_dir)
            .collect()}
    assert rows
    li = (table(spark, sf_dir, "lineitem")
          .select("l_returnflag",
                  F.expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)")
                  .alias("v")))
    # exact discrete quantiles at the same ceil(q*n) rank convention
    exact = {r.l_returnflag: r for r in
             (li.groupBy("l_returnflag")
              .agg(*[F.expr(
                  f"SORT_ARRAY(COLLECT_LIST(v))"
                  f"[CAST(CEIL(0.{q} * COUNT(*)) AS INT) - 1]")
                  .alias(f"ex{q}") for q in ("50", "95", "99")])
              ).collect()}
    for g, r in rows.items():
        for q in ("50", "95", "99"):
            lo, hi = getattr(r, f"p{q}_lo"), getattr(r, f"p{q}_hi")
            ex = getattr(exact[g], f"ex{q}")
            assert lo <= ex <= hi, (g, q, lo, ex, hi)
            assert (hi - lo) <= max(1, lo >> HDR_M), (g, q, lo, hi)
    again = {r.l_returnflag: r for r in
             REGISTRY["stats_hdr_quantile_sketch"].builder(spark, sf_dir)
             .collect()}
    assert {g: tuple(r) for g, r in rows.items()} == \
        {g: tuple(r) for g, r in again.items()}


def test_pagerank_mass_conserved_and_iterative_shape(spark, sf_dir):
    """Total rank mass stays within floor-loss of PR_SCALE (each of the
    two integer divisions per node loses < 1 unit, plus the 15/85 split
    truncation), the walk is genuinely iterative (ranks move away from
    the uniform start), and the builder leaves no persisted RDDs behind
    once caches are cleared."""
    from cstore_fdw_spark.operators import clear_caches, load_all
    from cstore_fdw_spark.operators.analytics import PR_SCALE

    reg = load_all()
    rows = reg["pagerank_bipartite_3iter"].builder(spark, sf_dir).collect()
    assert len(rows) == 25
    assert all(r.rank_fp > 0 for r in rows)
    # top-25 of a skewed graph concentrates far more than 25/N of the
    # mass: suppliers (the hub side of the bipartite graph) dominate
    assert any(r.node_type == "supplier" for r in rows)
    # node ids decode back to their entity keys
    for r in rows:
        assert r.node_id // 2 == r.entity_key
        assert (r.node_id % 2 == 1) == (r.node_type == "supplier")
    clear_caches(spark)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0


def test_weighted_sample_is_single_pass_topk(spark, sf_dir):
    """The PPS sample must plan as TakeOrderedAndProject over the scan —
    no Exchange (the 100 TB contract: weighted sampling is a per-task
    k-heap + driver merge, never a global sort) — and must read only the
    two columns it needs. Statistically it is size-biased: the sampled
    docs' mean token count exceeds the corpus mean."""
    from cstore_fdw_spark.operators import load_all
    from cstore_fdw_spark.plans.verify import explain_str
    from pyspark.sql import functions as F

    reg = load_all()
    df = reg["sample_weighted_reservoir"].builder(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "text:string" in plan.replace(" ", "") or "text" in plan
    sample_mean = df.agg(F.avg("n_tokens")).collect()[0][0]
    corpus_mean = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                   .agg(F.avg(F.size(F.split("text", " ")))).collect()[0][0])
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_market_basket_explode_is_bounded(spark, sf_dir):
    """The within-order self-join is the structural all-pairs guard:
    assert the fixture's max basket size keeps the per-order pair count
    small and constant (<= C(16,2) = 120 — the docstring's bounded
    explode factor), and that every emitted pair meets the support floor
    with a positive lift."""
    from pyspark.sql import functions as F

    from cstore_fdw_spark.operators import load_all
    from cstore_fdw_spark.operators.analytics import MB_MIN_PAIRS

    reg = load_all()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    max_basket = (li.groupBy("l_orderkey")
                  .agg(F.countDistinct("l_partkey").alias("k"))
                  .agg(F.max("k")).collect()[0][0])
    assert max_basket <= 16, max_basket
    rows = reg["market_basket_lift"].builder(spark, sf_dir).collect()
    assert all(r.n_pairs >= MB_MIN_PAIRS and r.lift_permille > 0
               for r in rows)
    assert all(r.part1 < r.part2 for r in rows)


def test_qoi_round_trip_and_op_coverage():
    """QOI spec v1.0 compliance: (1) hand-computed vectors — a single
    black RGB pixel is exactly header + QOI_OP_RUN(1) + end marker, and
    a (128,0,0) pixel is a literal QOI_OP_RGB chunk; (2) random rasters
    round-trip bit-exactly in both channel modes; (3) a crafted raster
    exercises every one of the five op families; (4) INDEX/RUN ops must
    not mutate the running table (the spec subtlety a naive decoder
    gets wrong)."""
    import random
    import struct

    from cstore_fdw_spark.operators.multimodal import qoi_decode, qoi_encode

    # (1) hand-computed: 1 black pixel == prev start value -> RUN(1)
    enc = qoi_encode(1, 1, bytes([0, 0, 0]))
    assert enc == (b"qoif" + struct.pack(">IIBB", 1, 1, 3, 0)
                   + bytes([0xC0]) + b"\x00" * 7 + b"\x01"), enc.hex()
    # (1b) a big jump from the start pixel -> literal RGB chunk
    enc = qoi_encode(1, 1, bytes([128, 0, 0]))
    assert enc[14:18] == bytes([0xFE, 128, 0, 0]), enc.hex()
    # (2) random round trips, both channel modes
    random.seed(11)
    for trial in range(120):
        w, h = random.randint(1, 17), random.randint(1, 13)
        ch = random.choice([3, 4])
        raster = bytearray()
        px = [random.randrange(256) for _ in range(ch)]
        palette = [[random.randrange(256) for _ in range(ch)]
                   for _ in range(5)]
        for _ in range(w * h):
            mode = random.randrange(6)
            if mode == 1:
                px = [(c + random.randint(-2, 1)) % 256 for c in px]
            elif mode == 2:
                dg = random.randint(-32, 31)
                px = ([(px[0] + dg + random.randint(-8, 7)) % 256,
                       (px[1] + dg) % 256,
                       (px[2] + dg + random.randint(-8, 7)) % 256]
                      + px[3:])
            elif mode == 3:
                px = list(random.choice(palette))
            elif mode >= 4:
                px = [random.randrange(256) for _ in range(ch)]
            raster += bytes(px[:ch])
        dec = qoi_decode(qoi_encode(w, h, bytes(raster), ch))
        assert dec == (w, h, ch, bytes(raster)), f"trial {trial}"
    # (3) crafted op sweep: runs, +1 diffs, luma steps, jumps, revisits
    base, raster = [10, 20, 30], bytearray()
    for i in range(256):
        step = (i // 4) % 4
        if i % 4 == 0:
            if step == 1:
                base = [(c + 1) % 256 for c in base]
            elif step == 2:
                base = [(base[0] + 20) % 256, (base[1] + 18) % 256,
                        (base[2] + 17) % 256]
            elif step == 3:
                base = [10, 20, 30] if i % 8 else [200, 5, 90]
        raster += bytes(base)
    enc = qoi_encode(16, 16, bytes(raster))
    ops, p = set(), 14
    while p < len(enc) - 8:
        b1 = enc[p]
        if b1 == 0xFE:
            ops.add("RGB"); p += 4
        elif b1 == 0xFF:
            ops.add("RGBA"); p += 5
        else:
            ops.add(["INDEX", "DIFF", "LUMA", "RUN"][b1 >> 6])
            p += 2 if b1 >> 6 == 2 else 1
    assert {"RGB", "INDEX", "DIFF", "LUMA", "RUN"} <= ops, ops
    assert qoi_decode(enc) == (16, 16, 3, bytes(raster))
    # (4) malformed end marker is rejected
    try:
        qoi_decode(enc[:-1] + b"\x02")
        raise AssertionError("end-marker corruption not detected")
    except ValueError:
        pass


def test_ima_adpcm_codec_contract():
    """IMA ADPCM automaton contract: (1) decode(encode(x)) equals the
    encoder's internal reconstruction sample-for-sample (the defining
    property of a predictive codec pair); (2) smooth signals reconstruct
    within one quantizer step; (3) the clamps genuinely engage on
    full-scale slams; (4) the WAV container round-trips header state,
    odd-sample padding, and the fact-chunk truncation; (5) non-ADPCM
    WAVs are rejected loudly."""
    import random

    import pytest

    from cstore_fdw_spark.operators.multimodal import (
        ima_adpcm_decode, ima_adpcm_encode, wav_decode_ima_adpcm,
        wav_encode_ima_adpcm)

    random.seed(3)
    for trial in range(120):
        n = random.randint(1, 200)
        mode = random.randrange(3)
        if mode == 0:
            samples = [random.randint(-32768, 32767) for _ in range(n)]
        elif mode == 1:
            s0 = random.randint(-1000, 1000)
            step = random.randint(-30, 30)
            samples = [max(-32768, min(32767, s0 + i * step))
                       for i in range(n)]
        else:
            samples = [random.choice([-30000, -5, 0, 7, 29999])] * n
        dec = wav_decode_ima_adpcm(wav_encode_ima_adpcm(samples))
        pred0, idx0, nibbles = ima_adpcm_encode(samples)
        ref = ima_adpcm_decode(nibbles, pred0, idx0)[:len(samples)]
        assert dec == ref, f"trial {trial}"
        assert len(dec) == len(samples)  # fact chunk truncates the pad
    ramp = [i * 8 for i in range(500)]
    dec = wav_decode_ima_adpcm(wav_encode_ima_adpcm(ramp))
    assert max(abs(a - b) for a, b in zip(ramp, dec)) < 64
    slam = [32767, -32768] * 50
    dec = wav_decode_ima_adpcm(wav_encode_ima_adpcm(slam))
    assert all(-32768 <= s <= 32767 for s in dec)
    # a mu-law WAV must be rejected by the ADPCM decoder, not misread
    from cstore_fdw_spark.operators.multimodal import wav_encode_ulaw
    with pytest.raises(ValueError, match="0x7"):
        wav_decode_ima_adpcm(wav_encode_ulaw(8000, [0, 1, 2]))


def test_mips_plan_broadcasts_queries_and_differs_from_cosine(spark, sf_dir):
    """vector_mips_topk must broadcast the query set (candidate corpus
    streams once — no corpus-sized shuffle) and must score by the RAW
    inner product, never the normalized cosine (the synthetic corpus's
    gaussian embeddings have concentrated norms, so the top-3 RANKINGS
    can legitimately coincide — the scores cannot)."""
    from cstore_fdw_spark.operators import load_all
    from cstore_fdw_spark.plans.verify import explain_str

    reg = load_all()
    mips = reg["vector_mips_topk"].builder(spark, sf_dir)
    plan = explain_str(mips, "simple")
    assert "Broadcast" in plan, plan[:1500]
    # the only Exchange feeds the per-query window over k*|queries| rows
    assert plan.count("Exchange") <= 2, plan[:2000]
    cos = reg["ann_cosine_topk"].builder(spark, sf_dir)
    m = {(r.query_id, r.neighbor_id): r.score for r in mips.collect()}
    c = {(r.query_id, r.neighbor_id): r.cos for r in cos.collect()}
    shared = set(m) & set(c)
    assert shared, "no overlapping (query, neighbor) pairs to compare"
    # unnormalized: dot != dot/(|q||c|) for every shared pair (norms
    # are ~sqrt(dim)*sigma != 1 on this corpus), and a cosine is
    # bounded by 1 while the matching dot here is not forced to be
    assert all(abs(m[k] - c[k]) > 1e-9 for k in shared), \
        "MIPS scores collapsed onto the cosine scores"


def test_dsir_model_is_bucket_bounded_and_target_heavy(spark, sf_dir):
    """text_dsir_importance: the importance model must stay bucket-
    bounded (no corpus-sized anchor), the final selection must be a
    TakeOrdered (never a global sort), and the selected docs must skew
    toward the target distribution (lang='en') relative to the corpus —
    the whole point of importance resampling."""
    from cstore_fdw_spark.operators import load_all
    from cstore_fdw_spark.plans.verify import explain_str
    from pyspark.sql import functions as F

    reg = load_all()
    df = reg["text_dsir_importance"].builder(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    rows = df.collect()
    assert 0 < len(rows) <= 40
    assert all(r.dsir_score >= 0 for r in rows)
    sel_en = sum(1 for r in rows if r.lang == "en") / len(rows)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_en = (d.filter(F.col("lang") == "en").count() / d.count())
    assert sel_en > corpus_en, (sel_en, corpus_en)


def test_holt_smoothing_truncating_div_edge_is_live(spark, sf_dir):
    """timeseries_holt_smoothing: the corpus fold must actually
    exercise NEGATIVE trend state (where truncating vs flooring
    division diverge — the recurrence's one cross-engine hazard), the
    per-key fold must stay hour-bounded, and the forecast must be the
    documented linear extrapolation of the final state. Plus a direct
    spec pin that DuckDB's ``//`` matches the fold's truncating tdiv on
    negatives (python's ``//`` floors — the fold must NOT use it)."""
    import duckdb

    from cstore_fdw_spark.operators import load_all

    reg = load_all()
    rows = reg["timeseries_holt_smoothing"].builder(spark, sf_dir).collect()
    assert rows and all(1 <= r.n_hours <= 48 for r in rows)
    assert any(r.trend_fx < 0 for r in rows), \
        "no cooling series — the truncation edge is untested by the oracle"
    assert all(r.forecast3_fx == r.level_fx + 3 * r.trend_fx for r in rows)

    def tdiv(a, n):
        q = abs(a) // n
        return q if a >= 0 else -q

    cases = [-17, -15, -10, -7, -3, 0, 3, 7, 15, 17]
    duck = duckdb.sql(
        "SELECT " + ", ".join(f"({a}) // 10" for a in cases)).fetchone()
    assert list(duck) == [tdiv(a, 10) for a in cases]
    assert (-7) // 10 != tdiv(-7, 10)  # python floor would diverge


def test_ngram_containment_corpus_consistency_and_cache_clean(spark, sf_dir):
    """text_ngram_containment on the corpus: every emitted score must
    be the exact directional ratio n_common/size_a against its own
    reported sizes; the corpus's planted near-dups are full-doc copies,
    so their containment pairs must come out mutual; and the op's
    persists must be returned to the cache tracker (clear_caches
    leaves no persistent RDDs)."""
    from cstore_fdw_spark.operators import clear_caches, load_all

    reg = load_all()
    rows = reg["text_ngram_containment"].builder(spark, sf_dir).collect()
    assert rows, "corpus has planted near-dup pairs; none found"
    got = {(r.doc_a, r.doc_b) for r in rows}
    for r in rows:
        assert r.containment == r.n_common / r.size_a
        assert r.containment >= 0.8
        assert r.n_common <= min(r.size_a, r.size_b)
    assert got == {(b, a) for a, b in got}, \
        "corpus near-dups are full-doc copies — pairs must be mutual"
    clear_caches(spark)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0


def test_ngram_containment_strict_subset_is_one_directional(
        spark, tmp_path):
    """The directional case symmetric Jaccard structurally misses: doc
    10 is a strict prefix of doc 20, so 10→20 must qualify at
    containment 1.0 while 20→10 must NOT (and its Jaccard union score
    would also fail) — proven on a crafted documents table fed through
    the registered builder."""
    from cstore_fdw_spark.operators import clear_caches, load_all

    words = [f"w{i}" for i in range(24)]
    small = " ".join(words)
    big = " ".join(words + [f"x{i}" for i in range(40)])
    (spark.createDataFrame(
        [(10, small, "en", "src0", len(small)),
         (20, big, "en", "src0", len(big)),
         (30, " ".join(f"z{i}" for i in range(30)), "en", "src0", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
     .write.mode("overwrite").parquet(str(tmp_path / "documents.parquet")))
    reg = load_all()
    rows = reg["text_ngram_containment"].builder(spark, str(tmp_path)) \
        .collect()
    got = {(r.doc_a, r.doc_b): r for r in rows}
    assert set(got) == {(10, 20)}, got
    r = got[(10, 20)]
    assert r.containment == 1.0 and r.n_common == r.size_a
    # the reverse direction misses the bar by construction
    assert r.n_common / r.size_b < 0.8
    clear_caches(spark)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0


def test_alsh_mips_consistent_with_exact_mips(spark, sf_dir):
    """vector_alsh_mips_topk: every score it emits must equal the true
    inner product (shared (q,n) pairs with the exact op carry identical
    doubles), its per-query best can never EXCEED the exact MIPS
    maximum, and the max-norm vector's augmented coordinate is exactly
    zero (the sqrt(maxsq − nsq) edge both engines must agree on)."""
    from cstore_fdw_spark.operators import load_all

    reg = load_all()
    alsh = {(r.query_id, r.neighbor_id): r.score
            for r in reg["vector_alsh_mips_topk"].builder(spark, sf_dir)
            .collect()}
    exact = {(r.query_id, r.neighbor_id): r.score
             for r in reg["vector_mips_topk"].builder(spark, sf_dir)
             .collect()}
    shared = set(alsh) & set(exact)
    for k in shared:
        assert alsh[k] == exact[k], k
    best_exact = {}
    for (q, _n), s in exact.items():
        best_exact[q] = max(best_exact.get(q, s), s)
    for (q, _n), s in alsh.items():
        if q in best_exact:
            assert s <= best_exact[q], (q, s, best_exact[q])


def test_cusum_changepoint_localizes_planted_shift(spark, tmp_path):
    """A clean level shift (20 hours at 1.00, then 20 at 5.00) must be
    localized exactly at the boundary (rn=20): for a step series the
    CUSUM statistic |n·S_i − i·S_n| is maximized at the step."""
    import datetime

    from cstore_fdw_spark.operators import load_all

    base = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(40):
        rows.append((i, base + datetime.timedelta(hours=i, minutes=5),
                     1, "shift", 1.0 if i < 20 else 5.0, "{}"))
    (spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
     .write.mode("overwrite").parquet(str(tmp_path / "events.parquet")))
    reg = load_all()
    out = reg["timeseries_cusum_changepoint"].builder(
        spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.event_type, r.cp_rn, r.n_hours) == ("shift", 20, 40)
    assert r.cp_hour == base + datetime.timedelta(hours=19)


def test_gini_extremes_on_crafted_regions(spark, tmp_path):
    """Equal spend must give Gini 0; maximal concentration must give
    the finite-n ceiling ~(n−1)/n (749 permille for n=4 after floor
    division) — the two closed-form anchors of the rank formulation."""
    from cstore_fdw_spark.operators import load_all

    (spark.createDataFrame(
        [(0, "N0", 0, ""), (1, "N1", 1, "")],
        "n_nationkey long, n_name string, n_regionkey long, "
        "n_comment string")
     .write.mode("overwrite").parquet(str(tmp_path / "nation.parquet")))
    custs = [(k, f"C{k}", "", 0, "", 0.0, "", "") for k in range(4)] + \
            [(k, f"C{k}", "", 1, "", 0.0, "", "") for k in range(4, 8)]
    (spark.createDataFrame(
        custs, "c_custkey long, c_name string, c_address string, "
               "c_nationkey long, c_phone string, c_acctbal double, "
               "c_mktsegment string, c_comment string")
     .write.mode("overwrite").parquet(str(tmp_path / "customer.parquet")))
    spends = {0: 100.0, 1: 100.0, 2: 100.0, 3: 100.0,
              4: 0.01, 5: 0.01, 6: 0.01, 7: 400.0}
    orders = [(i, ck, "O", sp, "1995-01-01", "", "", 0, "")
              for i, (ck, sp) in enumerate(spends.items())]
    (spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate string, "
                "o_orderpriority string, o_clerk string, "
                "o_shippriority long, o_comment string")
     .write.mode("overwrite").parquet(str(tmp_path / "orders.parquet")))
    reg = load_all()
    out = {r.regionkey: r for r in
           reg["stats_gini_concentration"].builder(
               spark, str(tmp_path)).collect()}
    assert out[0].gini_permille == 0
    assert out[0].n_customers == 4 and out[0].total_cents == 40000
    # cents [1,1,1,40000]: (2*160006 - 5*40003)*1000 // (4*40003) = 749
    assert out[1].gini_permille == 749


def test_lttb_selects_planted_spike_and_endpoints(spark):
    """timeseries_downsample_lttb: on a crafted flat series with one
    violent spike, LTTB must keep the first point, the last point, and
    the spike (the largest-triangle property that makes it the standard
    plotting reducer) — and emit exactly LTTB_POINTS points per key."""
    from datetime import datetime, timedelta

    from cstore_fdw_spark.operators.events import (LTTB_POINTS,
                                                   timeseries_downsample_lttb)

    # 96 hourly events, value 10.0 except hour 37's 500.0 spike
    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(hours=i), 7, "click",
             500.0 if i == 37 else 10.0, "{}") for i in range(96)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = timeseries_downsample_lttb(spark, d).collect()
    assert len(out) == LTTB_POINTS
    rns = [r.rn for r in out]
    assert rns[0] == 1 and rns[-1] == 96
    assert rns == sorted(rns)
    assert any(r.rn == 38 and r.x_cents == 50000 for r in out), \
        "the spike (rn 38) must be selected"


def test_lttb_short_key_is_excluded(spark):
    """timeseries_downsample_lttb: a key with fewer than LTTB_POINTS
    hourly points is excluded entirely (the oracle's n >= LTTB_POINTS
    gate) — pins the fold's in-Python short-key empty-frame path that
    replaced the former count-window filter."""
    from datetime import datetime, timedelta

    from cstore_fdw_spark.operators.events import (LTTB_POINTS,
                                                   timeseries_downsample_lttb)

    base = datetime(2024, 1, 1)
    rows = ([(i, base + timedelta(hours=i), 7, "long", 10.0, "{}")
             for i in range(LTTB_POINTS)]
            + [(100 + i, base + timedelta(hours=i), 7, "short", 10.0, "{}")
               for i in range(LTTB_POINTS - 1)])
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = timeseries_downsample_lttb(spark, d).collect()
    assert {r.event_type for r in out} == {"long"}
    assert len(out) == LTTB_POINTS


def test_triangle_count_on_crafted_graph(spark, tmp_path):
    """stats_triangle_count: a hand-built order log whose recurring
    co-purchase graph is K4 plus a pendant edge has exactly C(4,3)=4
    triangles; the degree-ordered orientation must count each once."""
    import itertools

    from cstore_fdw_spark.operators.analytics import stats_triangle_count

    rows = []
    ok = 0
    # each part pair of K4 (parts 1-4) co-occurs in TWO orders (support
    # gate); pendant edge (4,5) also twice
    for a, b in list(itertools.combinations([1, 2, 3, 4], 2)) + [(4, 5)]:
        for _ in range(2):
            rows += [(ok, a), (ok, b)]
            ok += 1
    df = spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None)
         for o, p in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    d = str(tmp_path)
    df.write.parquet(f"{d}/lineitem.parquet")
    (row,) = stats_triangle_count(spark, d).collect()
    assert row.n_nodes == 5 and row.n_edges == 7
    assert row.n_triangles == 4, row
    # K4's degree-ordered orientation yields exactly 4 wedges (3 from
    # the orientation's source node, 1 from the next), all closed — pins
    # the merged wedges+triangles aggregate (count(*) vs count(hit) over
    # the wedge LEFT JOIN ori) and the permille division
    assert row.n_wedges == 4 and row.closure_permille == 1000, row


def test_triangle_count_degree_discordant_closure(spark, tmp_path):
    """stats_triangle_count on the ADVICE r16 counterexample: edges
    {1-2, 1-3, 2-3, 2-4, 2-5} hold exactly ONE triangle (1,2,3) whose
    closing edge's endpoints order OPPOSITELY by id (2 < 3) and by
    degree (d(3)=2 < d(2)=4). The id-ordered wedge join missed it (the
    pre-fix code returned 0 triangles here); the wedge endpoints must be
    compared in the same (degree, node) total order that oriented the
    edges."""
    import itertools

    from cstore_fdw_spark.operators.analytics import stats_triangle_count

    rows = []
    ok = 0
    for a, b in [(1, 2), (1, 3), (2, 3), (2, 4), (2, 5)]:
        for _ in range(2):  # support gate: each pair co-occurs twice
            rows += [(ok, a), (ok, b)]
            ok += 1
    df = spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None)
         for o, p in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    d = str(tmp_path)
    df.write.parquet(f"{d}/lineitem.parquet")
    (row,) = stats_triangle_count(spark, d).collect()
    assert row.n_nodes == 5 and row.n_edges == 5
    # one oriented wedge at node 1 (out-neighbors {2, 3}), and it closes
    assert row.n_wedges == 1 and row.n_triangles == 1, row
    assert row.closure_permille == 1000, row


def test_class_balance_exact_counts_and_determinism(spark, sf_dir):
    """sample_class_balance: every label comes back at exactly the min
    class size, and the selection is bit-stable across runs (hash
    ranks, not RNG)."""
    from pyspark.sql import functions as F

    from cstore_fdw_spark.operators import load_all

    reg = load_all()
    out = reg["sample_class_balance"].builder(spark, sf_dir)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k = (e.groupBy("label").count().agg(F.min("count")).collect()[0][0])
    per = {r.label: r["count"] for r in out.groupBy("label").count()
           .collect()}
    assert set(per.values()) == {k}, per
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple,
                   reg["sample_class_balance"].builder(spark, sf_dir)
                   .collect()))
    assert a == b


def test_pca_power_iteration_finds_planted_direction(spark, tmp_path):
    """vector_pca_power_iteration: on a corpus whose variance is
    overwhelmingly along one axis (dimension 7), the recovered loading
    vector must put its largest |component| there with the sign of the
    all-ones start's projection — the spectral sanity anchor."""
    import random

    from cstore_fdw_spark.operators.similarity import (
        vector_pca_power_iteration)

    rng = random.Random(7)
    rows = []
    for i in range(300):
        v = [rng.gauss(0, 0.02) for _ in range(64)]
        v[7] += rng.choice([-1.0, 1.0]) * 0.9   # dominant axis
        rows.append((i, [float(x) for x in v], i % 10))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    d = str(tmp_path)
    df.write.parquet(f"{d}/embeddings.parquet")
    out = vector_pca_power_iteration(spark, d).collect()
    assert len(out) == 64
    loads = {r.dim: r.loading_fx for r in out}
    top = max(loads, key=lambda j: abs(loads[j]))
    assert top == 7, (top, sorted(loads.items(),
                                  key=lambda kv: -abs(kv[1]))[:3])
    # dominance: the planted axis carries most of the norm
    assert abs(loads[7]) > 3 * max(abs(v) for j, v in loads.items()
                                   if j != 7)


def test_ivf_codes_artifact_serves_without_reassignment(spark, sf_dir):
    """vector_ivf_pq_topk with warm artifacts must SERVE from the
    materialized (cell, codes) index — the plan reads the ivfcodes
    parquet and plans NO corpus-wide window (the N x nlist home-cell
    assignment that made serving superlinear before r12 runs only at
    index build). The probes branch's 5-query window survives with its
    vec_id pushdown; the corpus branch must not."""
    from cstore_fdw_spark.operators.similarity import (
        ensure_index_artifacts, vector_ivf_pq_topk)

    ensure_index_artifacts(spark, sf_dir)
    df = vector_ivf_pq_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "cstore_cb_ivfcodes_" in plan, \
        "serving plan does not read the codes artifact"
    # results still correct end-to-end (oracle equivalence is the
    # local gate's job; here: sane shape and the artifact path is live)
    rows = df.collect()
    assert rows and all(r.rank <= 3 for r in rows)
