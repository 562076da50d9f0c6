"""FLAC codec (RFC 9639) tests: published CRC check values, coded-number
boundaries, every subframe/residual path, corruption detection, and a
committed-fixture byte pin (regenerate with scripts/make_flac_fixture.py)."""

import os
import random

import pytest

from cstore_fdw_spark.operators.flac_codec import (
    BitReader, BitWriter, _common_wasted_bits, _read_coded_number,
    _write_coded_number, crc8, crc16, flac_decode, flac_encode)
from cstore_fdw_spark.operators.multimodal import _flac_plan, _flac_signal

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "flac",
                       "doc0370.flac")


def test_crc_published_check_values():
    # CRC-8 poly 0x07 init 0 (SMBUS) and CRC-16 poly 0x8005 init 0
    # unreflected (BUYPASS/UMTS): standard catalogue check values over
    # the ASCII digits "123456789".
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_coded_number_boundaries_round_trip():
    cases = [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, 0x1FFFFF,
             0x200000, 0x3FFFFFF, 0x4000000, 0x7FFFFFFF, (1 << 36) - 1]
    for n in cases:
        w = BitWriter()
        _write_coded_number(w, n)
        assert _read_coded_number(BitReader(w.getvalue())) == n
    with pytest.raises(ValueError):
        w = BitWriter()
        _write_coded_number(w, 1 << 36)


def test_registered_signal_family_round_trips():
    # the exact family the multimodal_flac_energy query encodes: all four
    # subframe types, partition order 1, 5-bit rice method, wasted bits
    # on even constant blocks, short tail frames
    for doc_id in (0, 37, 74, 111, 1110, 4995):
        n = 200 + (doc_id % 57)
        s = _flac_signal(doc_id, n)
        payload = flac_encode(s, plan=_flac_plan)
        sr, bps, dec = flac_decode(payload)
        assert (sr, bps) == (8000, 16)
        assert dec == s
        assert len(payload) < 2 * n  # it actually compresses


def test_auto_plan_random_round_trips():
    rng = random.Random(7)
    for _ in range(20):
        n = rng.randrange(1, 500)
        s = [rng.randrange(-32768, 32768) for _ in range(n)]
        payload = flac_encode(s, blocksize=rng.choice([16, 32, 64]))
        assert flac_decode(payload)[2] == s


def test_exact_multiple_of_blocksize_and_single_short_frame():
    s = [k % 50 - 25 for k in range(128)]  # no partial tail
    assert flac_decode(flac_encode(s, blocksize=64))[2] == s
    s = [9, -9, 42]  # single frame shorter than the blocksize
    assert flac_decode(flac_encode(s, blocksize=64))[2] == s


def test_wasted_bits_detected_and_restored():
    assert _common_wasted_bits([16, -48, 1600]) == 4
    assert _common_wasted_bits([0, 0]) == 0
    assert _common_wasted_bits([3]) == 0
    rng = random.Random(11)
    s = [rng.randrange(-2048, 2048) * 16 for _ in range(130)]
    shifted = flac_encode(s, plan=lambda b, blk: {"type": "verbatim"})
    raw = flac_encode([v + 1 for v in s],
                      plan=lambda b, blk: {"type": "verbatim"})
    assert flac_decode(shifted)[2] == s
    # 4 wasted bits -> ~12-bit verbatim samples: ~65 bytes saved on 130
    assert len(shifted) <= len(raw) - 50
    s = [-1024] * 64 + [0] * 64  # constant negative + all-zero blocks
    assert flac_decode(flac_encode(s))[2] == s


def test_fixed_orders_and_deep_partitions():
    s = [3 * k for k in range(256)]
    for order in range(5):
        payload = flac_encode(
            s, plan=lambda b, blk, o=order: {
                "type": "fixed", "order": o, "partition_order": 2})
        assert flac_decode(payload)[2] == s


def test_lpc_and_escape_residuals():
    s = [5 * k - 300 for k in range(128)]
    payload = flac_encode(s, plan=lambda b, blk: {
        "type": "lpc", "order": 3, "qlp": [5, -3, 1], "shift": 2,
        "precision": 5, "partition_order": 1, "residual_method": 1})
    assert flac_decode(payload)[2] == s
    payload = flac_encode(s, plan=lambda b, blk: {
        "type": "fixed", "order": 1, "partition_order": 1,
        "escape_bits": 6})
    assert flac_decode(payload)[2] == s


def test_corruption_is_caught():
    s = [k % 97 for k in range(200)]
    good = flac_encode(s)
    # frame body bit-flip -> CRC-16; header byte -> CRC-8 (or lost sync)
    for offset in (60, 48):
        bad = bytearray(good)
        bad[offset] ^= 0x40
        with pytest.raises(ValueError):
            flac_decode(bytes(bad))
    # STREAMINFO MD5 tamper -> decode runs to the end, then MD5 check
    bad = bytearray(good)
    bad[4 + 4 + 18] ^= 0xFF  # first MD5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        flac_decode(bytes(bad))


def test_committed_fixture_bytes_and_values():
    """Byte pin: the committed fixture must equal a fresh encode (the
    format cannot drift silently) and decode to the closed form."""
    with open(FIXTURE, "rb") as f:
        committed = f.read()
    doc_id = 370
    s = _flac_signal(doc_id, 200 + (doc_id % 57))
    assert flac_encode(s, plan=_flac_plan) == committed
    assert flac_decode(committed)[2] == s


def test_flac_energy_query_matches_closed_form(spark, sf_dir):
    from cstore_fdw_spark.operators import load_all
    registry = load_all()
    rows = {r["doc_id"]: r for r in
            registry["multimodal_flac_energy"].builder(spark, sf_dir)
            .collect()}
    assert rows, "no FLAC rows at this sf"
    for doc_id, r in rows.items():
        s = _flac_signal(doc_id, 200 + (doc_id % 57))
        assert r["n_samples"] == len(s)
        assert r["sample_sum"] == sum(s)
        assert r["energy"] == sum(v * v for v in s)


STEREO_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                              "flac", "doc0410_stereo.flac")


def test_stereo_all_channel_assignments_round_trip():
    from cstore_fdw_spark.operators.multimodal import (
        _flac_stereo_plan, _flac_stereo_signal)
    rng = random.Random(5)
    for mode in ("lr", "ls", "rs", "ms"):
        for n in (1, 64, 200):
            left = [rng.randrange(-32768, 32768) for _ in range(n)]
            right = [rng.randrange(-32768, 32768) for _ in range(n)]
            payload = flac_encode(
                (left, right),
                plan=lambda b, blk, m=mode: {"type": "auto", "stereo": m})
            sr, bps, (dl, dr) = flac_decode(payload)
            assert (dl, dr) == (left, right), (mode, n)
    # the registered query's signal family (mode cycle + auto subframes)
    for doc_id in (0, 41, 410, 4961):
        lr = _flac_stereo_signal(doc_id, 180 + (doc_id % 77))
        assert flac_decode(flac_encode(lr, plan=_flac_stereo_plan))[2] == lr


def test_mid_side_parity_edges():
    # odd L+R exercises the parity-recovery reconstruction
    cases = [([1], [0]), ([0], [1]), ([-1], [0]), ([-32768], [32767]),
             ([32767], [-32768]), ([5, -5, 3], [2, 2, -4])]
    for left, right in cases:
        payload = flac_encode((left, right),
                              plan=lambda b, blk: {"type": "verbatim",
                                                   "stereo": "ms"})
        assert flac_decode(payload)[2] == (left, right), (left, right)


def test_mid_side_compresses_correlated_channels():
    rng = random.Random(9)
    left = [int(800 * (1 if (k // 9) % 2 else -1)) + rng.randrange(-3, 4)
            for k in range(256)]
    right = [v + rng.randrange(-2, 3) for v in left]
    enc_lr = flac_encode((left, right), plan=lambda b, blk: {
        "type": "fixed", "order": 2, "stereo": "lr"})
    enc_ms = flac_encode((left, right), plan=lambda b, blk: {
        "type": "fixed", "order": 2, "stereo": "ms"})
    assert len(enc_ms) < len(enc_lr)


def test_committed_stereo_fixture_bytes_and_values():
    from cstore_fdw_spark.operators.multimodal import (
        _flac_stereo_plan, _flac_stereo_signal)
    with open(STEREO_FIXTURE, "rb") as f:
        committed = f.read()
    lr = _flac_stereo_signal(410, 180 + (410 % 77))
    assert flac_encode(lr, plan=_flac_stereo_plan) == committed
    assert flac_decode(committed)[2] == lr


def test_truncated_stream_raises_valueerror_not_indexerror():
    with open(FIXTURE, "rb") as f:
        payload = f.read()
    # cut inside the metadata walk: right after the marker, and mid-body
    for cut in (4, 6, 20):
        with pytest.raises(ValueError, match="flac: truncated"):
            flac_decode(payload[:cut])


def test_encode_rejects_oversize_blocksize_up_front():
    with pytest.raises(ValueError, match="blocksize must be in 1..256"):
        flac_encode([0] * 300, blocksize=300)


def test_reference_decoder_interop():
    """Feed the committed fixtures to an INDEPENDENT decoder (flac/ffmpeg
    binary or soundfile) and compare PCM — guards against a mirrored
    encode/decode bug that bit-exact self-roundtrips can't see. Skips
    where no reference implementation is installed (this container)."""
    import shutil
    import struct
    import subprocess
    import tempfile

    from cstore_fdw_spark.operators.multimodal import (
        _flac_plan, _flac_signal, _flac_stereo_plan, _flac_stereo_signal)

    mono = _flac_signal(370, 180 + (370 % 77))
    lr = _flac_stereo_signal(410, 180 + (410 % 77))
    want = {FIXTURE: [mono], STEREO_FIXTURE: [lr[0], lr[1]]}

    def decode_external(path, n_chan):
        flac_bin = shutil.which("flac")
        ffmpeg = shutil.which("ffmpeg")
        if flac_bin:
            raw = subprocess.run(
                [flac_bin, "-d", "-c", "--force-raw-format",
                 "--endian=little", "--sign=signed", path],
                capture_output=True, check=True).stdout
        elif ffmpeg:
            raw = subprocess.run(
                [ffmpeg, "-i", path, "-f", "s16le", "-"],
                capture_output=True, check=True).stdout
        else:
            try:
                import soundfile
            except ImportError:
                pytest.skip("no reference FLAC decoder available "
                            "(flac, ffmpeg, soundfile all missing)")
            data = soundfile.read(path, dtype="int16", always_2d=True)[0]
            return [list(map(int, data[:, c])) for c in range(n_chan)]
        flat = struct.unpack(f"<{len(raw) // 2}h", raw)
        return [list(flat[c::n_chan]) for c in range(n_chan)]

    for path, chans in want.items():
        got = decode_external(path, len(chans))
        assert got == chans, path
