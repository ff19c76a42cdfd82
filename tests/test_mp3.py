"""MPEG-audio frame walker vs independently-built frame streams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geoparquet_io_spark.functions.mp3 import (Mp3Frame, parse_frame_header,
                                               parse_mp3)


def _header(bitrate_idx, sr_idx=1, *, vbits=3, layer=3, pad=0, mode=0,
            crc_absent=1):
    """Build the 4 header bytes straight from the ISO bit layout."""
    lbits = 4 - layer
    h = (0x7FF << 21) | (vbits << 19) | (lbits << 17) | (crc_absent << 16) \
        | (bitrate_idx << 12) | (sr_idx << 10) | (pad << 9) | (mode << 6)
    return struct.pack(">I", h)


def _frame(bitrate_idx, size, fill=b"\x00", **kw):
    return _header(bitrate_idx, **kw) + fill * (size - 4)


def test_single_frame_fields():
    # MPEG-1 Layer III, 128 kbps (idx 9), 48 kHz (idx 1), stereo
    buf = _frame(9, 384)
    fr = parse_frame_header(buf, 0)
    assert fr == Mp3Frame(0, 384, "1", 3, 128, 48000, 1152, "stereo", False)


def test_frame_sizes_by_layer_and_version():
    # Layer I uses the *4 slot rule: 32 kbps idx1 @44.1k pad0
    fr = parse_frame_header(_header(1, 0, layer=1) + b"\x00" * 200, 0)
    assert fr.layer == 1 and fr.size == (12 * 32000 // 44100) * 4
    # MPEG-2 Layer III: 576 samples, 24 kHz (sr idx 1, vbits 2)
    fr2 = parse_frame_header(_header(4, 1, vbits=2) + b"\x00" * 200, 0)
    assert (fr2.version, fr2.samples, fr2.sample_rate) == ("2", 576, 24000)
    assert fr2.size == 576 // 8 * 32 * 1000 // 24000
    # padding adds one byte for layers II/III
    assert parse_frame_header(_frame(9, 385, pad=1), 0).size == 385


def test_walk_cbr_stream():
    buf = _frame(9, 384) * 7
    info = parse_mp3(buf)
    assert len(info.frames) == 7
    assert abs(info.duration_s - 7 * 1152 / 48000) < 1e-12
    assert abs(info.avg_bitrate_kbps - 128.0) < 1e-9
    assert not info.vbr and info.xing_frames is None
    assert info.id3v2_size == 0 and info.trailing_garbage == 0


def test_walk_vbr_mixed_bitrates():
    buf = _frame(9, 384) + _frame(10, 480) + _frame(7, 288)
    info = parse_mp3(buf)
    assert [f.bitrate_kbps for f in info.frames] == [128, 160, 96]
    assert info.vbr
    # average over actual payload bytes
    want = (384 + 480 + 288) * 8 / (3 * 1152 / 48000) / 1000
    assert abs(info.avg_bitrate_kbps - want) < 1e-9


def test_id3v2_skip_and_id3v1_tail():
    tag_body = b"\x00" * 100
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 100 >> 7, 100 & 0x7F]) + tag_body
    id3v1 = b"TAG" + b"\x00" * 125
    buf = id3v2 + _frame(9, 384) * 2 + id3v1
    info = parse_mp3(buf)
    assert info.id3v2_size == len(id3v2)
    assert len(info.frames) == 2


def test_xing_header_first_frame_excluded():
    # Xing lives after 32 bytes of side info (MPEG-1 stereo) in frame 0
    side = b"\x00" * 32
    xing = b"Xing" + struct.pack(">II", 0x1, 9)
    f0 = _header(9) + side + xing
    f0 += b"\x00" * (384 - len(f0))
    buf = f0 + _frame(9, 384) * 3
    info = parse_mp3(buf)
    assert info.xing_frames == 9 and info.vbr
    # duration/bitrate computed over the 3 audio frames only
    assert abs(info.duration_s - 3 * 1152 / 48000) < 1e-12


def test_resync_over_garbage_and_truncated_tail():
    buf = b"\xfe junk!" + _frame(9, 384) + b"\x01\x02" + _frame(9, 384)[:100]
    info = parse_mp3(buf)
    assert len(info.frames) == 1
    assert info.trailing_garbage > 0


def test_rejects_non_audio():
    with pytest.raises(ValueError):
        parse_mp3(b"\x00" * 512)


def test_audio_metadata_spark_dispatch(spark):
    from tests.test_multimodal import _make_wav
    from geoparquet_io_spark.operators.multimodal import (
        extract_audio_metadata)

    wav = _make_wav(8000, np.zeros((1600, 2), dtype=np.int16))
    mp3 = _frame(9, 384, mode=3) * 5   # mono
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(mp3)), (3, None)],
        "id int, data binary")
    rows = {r["id"]: r["audio_meta"]
            for r in extract_audio_metadata(df).collect()}
    w = rows[1]
    assert (w["format"], w["sample_rate"], w["channels"]) == ("wav", 8000, 2)
    assert abs(w["duration_s"] - 0.2) < 1e-12
    assert abs(w["bitrate_kbps"] - 8000 * 2 * 16 / 1000) < 1e-9
    m = rows[2]
    assert (m["format"], m["channels"], m["n_frames"]) == ("mp3", 1, 5)
    assert abs(m["duration_s"] - 5 * 1152 / 48000) < 1e-12
    assert rows[3] is None


def _id3v2(frames, major=4):
    """Independent ID3v2 tag builder (v2.3 plain / v2.4 syncsafe)."""
    body = b""
    for fid, text, enc in frames:
        payload = bytes([enc]) + text.encode(
            {0: "latin-1", 1: "utf-16", 3: "utf-8"}[enc])
        size = len(payload)
        if major == 4:
            sz = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                        (size >> 7) & 0x7F, size & 0x7F])
        else:
            sz = struct.pack(">I", size)
        body += fid.encode() + sz + b"\x00\x00" + payload
    size = len(body)
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3" + bytes([major, 0, 0]) + ss + body


def test_id3v2_text_frames_both_versions():
    from geoparquet_io_spark.functions.mp3 import id3v2_tags, parse_mp3

    frames = [("TIT2", "Nine Lives", 3), ("TPE1", "Café Tacvba", 1),
              ("TALB", "Album", 0)]
    for major in (3, 4):
        tag = _id3v2(frames, major=major)
        buf = tag + _frame(9, 384) * 2
        tags = id3v2_tags(buf)
        assert tags["TIT2"] == "Nine Lives"
        assert tags["TPE1"] == "Café Tacvba"
        assert tags["TALB"] == "Album"
        assert len(parse_mp3(buf).frames) == 2
    assert id3v2_tags(_frame(9, 384)) == {}


def test_lame_info_tag_is_cbr_not_vbr():
    """LAME writes 'Info' (not 'Xing') into CBR files — it must not
    flip the vbr flag."""
    side = b"\x00" * 32
    info_tag = b"Info" + struct.pack(">II", 0x1, 9)
    f0 = _header(9) + side + info_tag
    f0 += b"\x00" * (384 - len(f0))
    buf = f0 + _frame(9, 384) * 3
    info = parse_mp3(buf)
    assert info.xing_frames == 9
    assert info.vbr is False                 # the whole point
    # tag frame still excluded from duration
    assert abs(info.duration_s - 3 * 1152 / 48000) < 1e-12


def test_trailing_junk_bytes_counted():
    """1-3 bytes after the last whole frame are trailing garbage."""
    buf = _frame(9, 384) * 2 + b"\x00\x7f\x31"
    info = parse_mp3(buf)
    assert len(info.frames) == 2
    assert info.trailing_garbage == 3
