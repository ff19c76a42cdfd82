"""Pure-Python FLAC codec (functions/flac.py) + multimodal audio
integration.  The in-repo encoder (verbatim/constant/fixed subset) is
the decoder's round-trip anchor, like the in-test JPEG/AVI encoders;
hand-built bitstreams cover the decoder-only paths (LPC, stereo
decorrelation, Rice escape)."""

import numpy as np
import pytest

from geoparquet_io_spark.functions.flac import (
    _BitWriter,
    _crc8,
    decode_flac,
    encode_flac,
    parse_streaminfo,
)


def _rng():
    return np.random.RandomState(11)


@pytest.mark.parametrize("mode", ["verbatim", "constant-or-verbatim",
                                  "fixed"])
@pytest.mark.parametrize("nch", [1, 2])
def test_roundtrip_modes(mode, nch):
    pcm = _rng().randint(-32768, 32768, size=(1337, nch)).astype(np.int64)
    data = encode_flac(pcm, sample_rate=16000, blocksize=256, subframe=mode)
    out, info = decode_flac(data)
    assert (info["channels"], info["sample_rate"]) == (nch, 16000)
    assert info["total_samples"] == 1337       # non-multiple tail block
    assert np.array_equal(out, pcm)


def test_fixed_predictors_compress_smooth_signal():
    t = np.arange(6000)
    sine = (5000 * np.sin(2 * np.pi * 220 * t / 8000)).astype(np.int64)
    fixed = encode_flac(sine, blocksize=1024, subframe="fixed")
    verb = encode_flac(sine, blocksize=1024, subframe="verbatim")
    assert len(fixed) < 0.75 * len(verb)
    out, _ = decode_flac(fixed)
    assert np.array_equal(out[:, 0], sine)


def test_streaminfo_parse():
    pcm = np.zeros((500, 2), dtype=np.int64)
    si = parse_streaminfo(encode_flac(pcm, sample_rate=48000))
    assert si["sample_rate"] == 48000
    assert si["channels"] == 2
    assert si["bits_per_sample"] == 16
    assert si["total_samples"] == 500
    with pytest.raises(ValueError, match="fLaC"):
        parse_streaminfo(b"RIFFxxxx")


def _frame_shell(nch_code: int, blocksize: int) -> _BitWriter:
    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)            # 16-bit blocksize field
    w.write(0, 4)            # rate from streaminfo
    w.write(nch_code, 4)
    w.write(4, 3)            # 16 bps
    w.write(0, 1)
    w.write(0, 8)            # frame number 0
    w.write(blocksize - 1, 16)
    w.write(_crc8(bytes(w.buf)), 8)
    return w


def _stream(streampcm_shape, frame_bits: _BitWriter,
            sample_rate=8000, nch=1, total=None) -> bytes:
    head = _BitWriter()
    head.write(0, 16)
    head.write(0, 16)
    head.write(0, 24)
    head.write(0, 24)
    head.write(sample_rate, 20)
    head.write(nch - 1, 3)
    head.write(15, 5)        # 16 bps
    head.write(total if total is not None else streampcm_shape, 36)
    body = head.bytes() + b"\x00" * 16
    frame_bits.align()
    frame_bits.write(0, 16)  # CRC-16 (not enforced)
    return (b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big")
            + body + frame_bits.bytes())


def _verbatim_sub(w: _BitWriter, samples):
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)
    for v in samples:
        w.write(int(v), 16)


def test_decoder_lpc_subframe():
    """Hand-built LPC subframe: the decoder must apply the documented
    recurrence s[i] = res[i] + (sum c_k * s[i-1-k]) >> shift."""
    n, order, shift = 32, 2, 5
    coefs = [20, -7]
    warm = [100, -50]
    res = list(range(-14, 16))           # n - order residuals
    w = _frame_shell(0, n)
    w.write(0, 1)
    w.write(32 + order - 1, 6)           # LPC, order 2
    w.write(0, 1)
    for v in warm:
        w.write(v, 16)
    w.write(12 - 1, 4)                   # precision 12
    w.write(shift, 5)
    for c in coefs:
        w.write(c, 12)
    w.write(0, 2)                        # rice method 0
    w.write(0, 4)                        # partition order 0
    w.write(15, 4)                       # ESCAPE
    w.write(16, 5)                       # raw 16-bit residuals
    for r in res:
        w.write(r, 16)
    out, _ = decode_flac(_stream(n, w, total=n))
    exp = list(warm)
    for i in range(order, n):
        acc = sum(coefs[k] * exp[i - 1 - k] for k in range(order))
        exp.append(res[i - order] + (acc >> shift))
    assert out[:, 0].tolist() == exp


@pytest.mark.parametrize("code,name", [(8, "left/side"), (9, "right/side"),
                                       (10, "mid/side")])
def test_decoder_stereo_decorrelation(code, name):
    left = np.array([1000, -2000, 3000, 77, -1, 0, 12345, -12345])
    right = np.array([900, -2100, 2500, 80, 1, 0, -5, 32000])
    n = len(left)
    w = _frame_shell(code, n)
    if code == 8:                        # left + side(17 bit)
        _verbatim_sub(w, left)
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in (left - right):
            w.write(int(v), 17)
    elif code == 9:                      # side(17) + right
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in (left - right):
            w.write(int(v), 17)
        _verbatim_sub(w, right)
    else:                                # mid + side(17)
        side = left - right
        mid = (left + right) >> 1
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in mid:
            w.write(int(v), 16)
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in side:
            w.write(int(v), 17)
    out, _ = decode_flac(_stream(n, w, nch=2, total=n))
    assert out[:, 0].tolist() == left.tolist(), name
    assert out[:, 1].tolist() == right.tolist(), name


def test_decoder_wasted_bits_and_constant():
    n = 16
    w = _frame_shell(0, n)
    w.write(0, 1)
    w.write(0, 6)                        # CONSTANT
    w.write(1, 1)                        # wasted-bits flag
    w.write(1, 1)                        # unary 0 -> k = 1 wasted bit
    w.write(21, 15)                      # 16 - 1 effective bits
    out, _ = decode_flac(_stream(n, w, total=n))
    assert (out[:, 0] == 42).all()       # 21 << 1


def test_decoder_rice_partitions():
    """Partition order 1: two partitions with different Rice params."""
    n = 16
    res = list(range(-8, 8))
    w = _frame_shell(0, n)
    w.write(0, 1)
    w.write(8, 6)                        # FIXED order 0 (residual = signal)
    w.write(0, 1)
    w.write(0, 2)
    w.write(1, 4)                        # partition order 1 -> 2 partitions
    for half, param in ((res[:8], 3), (res[8:], 5)):
        w.write(param, 4)
        for r in half:
            u = (r << 1) if r >= 0 else ((-r) << 1) - 1
            w.write(0, u >> param)
            w.write(1, 1)
            w.write(u & ((1 << param) - 1), param)
    out, _ = decode_flac(_stream(n, w, total=n))
    assert out[:, 0].tolist() == res


# ---------------------------------------------------------------------------
# multimodal integration
# ---------------------------------------------------------------------------

def test_audio_features_flac_matches_wav(spark):
    """The SAME PCM through the WAV and the FLAC path must produce the
    same features — two independent containers, one physics."""
    import struct

    from geoparquet_io_spark.operators.multimodal import (
        extract_audio_features)

    t = np.arange(2048)
    freq = 8000 * 112 / 2048             # exactly bin 112: no leakage
    pcm = (8000 * np.sin(2 * np.pi * freq * t / 8000)).astype(np.int16)
    wav = (b"RIFF" + struct.pack("<I", 36 + pcm.nbytes) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                   16000, 2, 16)
           + b"data" + struct.pack("<I", pcm.nbytes) + pcm.tobytes())
    flac = encode_flac(pcm.astype(np.int64), sample_rate=8000,
                       blocksize=512, subframe="fixed")
    df = spark.createDataFrame(
        [("wav", bytearray(wav)), ("flac", bytearray(flac))],
        "kind string, data binary")
    got = {r["kind"]: r["audio_features"].asDict()
           for r in extract_audio_features(df).collect()}
    for k in ("sample_rate", "channels", "duration_s"):
        assert got["wav"][k] == got["flac"][k], k
    for k in ("rms", "zcr", "spectral_centroid_hz"):
        assert got["wav"][k] == pytest.approx(got["flac"][k], rel=1e-9), k
    assert got["flac"]["spectral_centroid_hz"] == pytest.approx(freq, abs=5)


def test_audio_metadata_flac(spark):
    from geoparquet_io_spark.operators.multimodal import (
        extract_audio_metadata)

    pcm = _rng().randint(-1000, 1000, size=(4000, 2)).astype(np.int64)
    flac = encode_flac(pcm, sample_rate=22050, subframe="fixed")
    df = spark.createDataFrame([(1, bytearray(flac))], "id long, data binary")
    m = extract_audio_metadata(df).collect()[0]["audio_meta"].asDict()
    assert m["format"] == "flac"
    assert m["sample_rate"] == 22050 and m["channels"] == 2
    assert m["duration_s"] == pytest.approx(4000 / 22050)
    assert m["bitrate_kbps"] > 0


def test_encode_flac_non_16bit_roundtrip():
    """The frame-header bps code must match bits_per_sample — a hardcoded
    16-bit code desyncs every non-16-bit stream."""
    import numpy as np
    import pytest

    from geoparquet_io_spark.functions.flac import decode_flac, encode_flac

    rng = np.random.RandomState(5)
    s8 = rng.randint(-128, 128, 300)
    out, meta = decode_flac(encode_flac(s8, bits_per_sample=8))
    assert meta["bits_per_sample"] == 8
    assert np.array_equal(out[:, 0], s8)
    s24 = rng.randint(-(1 << 23), 1 << 23, 300)
    out24, meta24 = decode_flac(encode_flac(s24, bits_per_sample=24))
    assert meta24["bits_per_sample"] == 24
    assert np.array_equal(out24[:, 0], s24)
    with pytest.raises(ValueError, match="bits_per_sample"):
        encode_flac(s8, bits_per_sample=10)


def test_encode_flac_many_frames_coded_number():
    """Frame numbers >= 2048 need the 3+-byte UTF-8 coded form; the old
    fixed 2-byte encoding silently desynced long streams."""
    import numpy as np

    from geoparquet_io_spark.functions.flac import decode_flac, encode_flac

    rng = np.random.RandomState(6)
    s = rng.randint(-1000, 1000, 2100)
    # blocksize 1 -> 2100 frames, crossing the 2048 2-byte boundary
    out, meta = decode_flac(encode_flac(s, blocksize=1))
    assert np.array_equal(out[:, 0], s)


def test_coded_number_roundtrip_and_overflow():
    """The coded frame number must round-trip through the decoder at
    every byte-length boundary, and a frame index past the 7-byte form
    (>= 2^36) must raise a clear error, not a negative-shift crash."""
    from geoparquet_io_spark.functions.flac import (
        _Bits, _coded_number, _write_coded_number)

    for f in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF,
              0x3FFFFFF, 0x7FFFFFFF, (1 << 36) - 1]:
        w = _BitWriter()
        _write_coded_number(w, f)
        assert _coded_number(_Bits(w.bytes(), 0)) == f

    with pytest.raises(ValueError, match="too large for FLAC coded"):
        w = _BitWriter()
        _write_coded_number(w, 1 << 36)


def test_verbatim_fast_path_matches_scalar_bit_reads():
    """The byte-aligned verbatim frombuffer fast path (r13) must equal
    per-bit scalar reads exactly — including negative samples, extreme
    values, and an UNALIGNED start that must take the scalar path."""
    from geoparquet_io_spark.functions.flac import _Bits, _subframe

    rng = np.random.RandomState(3)
    vals = np.concatenate([
        rng.randint(-32768, 32768, 61),
        np.array([-32768, 32767, -1, 0, 1])]).astype(np.int64)

    def sub_bytes(pad_bits: int):
        w = _BitWriter()
        if pad_bits:
            w.write(0, pad_bits)
        w.write(0, 1)        # padding bit
        w.write(1, 6)        # VERBATIM
        w.write(0, 1)        # no wasted bits
        for v in vals:
            w.write(int(v) & 0xFFFF, 16)
        w.align()
        return w.bytes()

    # aligned: subframe starts at bit 0 -> sample data at bit 8 -> the
    # fast path fires (pos % 8 == 0 after the 8-bit subframe header)
    data = sub_bytes(0)
    b = _Bits(data, 0)
    fast = _subframe(b, len(vals), 16)
    assert np.array_equal(fast, vals)
    assert b.pos == 8 + 16 * len(vals)

    # unaligned start (3 pad bits): sample data begins mid-byte -> the
    # scalar path must produce the identical samples
    data3 = sub_bytes(3)
    b3 = _Bits(data3, 0)
    b3.read(3)
    scalar = _subframe(b3, len(vals), 16)
    assert np.array_equal(scalar, vals)
