"""Real uncompressed-AVI video path (functions/video_codec +
operators/multimodal.video_frame_stats): container dialect coverage and a
pure-numpy oracle for the Spark frame-stats kernel — the video analogue of
tests/test_audio.py (closes VERDICT r3 "What's missing" #3).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etf_topox_spark.functions.video_codec import avi_decode, avi_encode
from etf_topox_spark.operators.multimodal import video_frame_stats
from etf_topox_spark.sources.video import (
    VID_H,
    VID_W,
    synthetic_videos,
    video_frames_np,
)


def test_encode_decode_roundtrip_pixel_exact():
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(5, 18, 25, 3), dtype=np.uint8)  # w=25 → stride pads 75→76
    dec, fps = avi_decode(avi_encode(frames, fps=15))
    assert fps == 15
    assert dec.shape == frames.shape
    assert np.array_equal(dec, frames)


def test_roundtrip_unpadded_stride():
    # w=16 → row stride 48 is already 4-aligned: no padding branch
    frames = np.arange(2 * 8 * 16 * 3, dtype=np.uint8).reshape(2, 8, 16, 3) % 251
    dec, _ = avi_decode(avi_encode(frames, fps=30))
    assert np.array_equal(dec, frames)


def test_bottom_up_and_bgr_order_matter():
    """A decoder that forgets the DIB bottom-up flip or BGR swap cannot
    roundtrip an asymmetric frame."""
    frame = np.zeros((4, 4, 3), dtype=np.uint8)
    frame[0, 0, 0] = 200  # top-left, red only
    dec, _ = avi_decode(avi_encode(frame[None], fps=10))
    assert dec[0, 0, 0, 0] == 200
    assert dec[0, 0, 0, 2] == 0 and dec[0, 3, 0, 0] == 0


def test_compressed_stream_raises():
    blob = bytearray(avi_encode(np.zeros((1, 4, 4, 3), np.uint8)))
    i = bytes(blob).find(b"strf")
    # MJPG stopped being a stub in round 5 (it decodes via jpeg_codec);
    # a codec we genuinely lack must still raise inside the parser
    blob[i + 8 + 16 : i + 8 + 20] = b"H265"  # biCompression fourcc
    with pytest.raises(NotImplementedError, match="compressed"):
        avi_decode(bytes(blob))


def test_not_avi_raises():
    with pytest.raises(ValueError):
        avi_decode(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(ValueError):
        avi_decode(b"\x00" * 20)


def test_junk_chunk_skipped():
    frames = np.full((1, 6, 10, 3), 9, np.uint8)
    blob = avi_encode(frames, fps=20)
    # splice a JUNK chunk between hdrl and movi (word-aligned, odd size)
    i = blob.find(b"movi") - 8  # start of the LIST movi chunk header
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc\x00"
    spliced = blob[:i] + junk + blob[i:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    dec, fps = avi_decode(spliced)
    assert fps == 20 and np.array_equal(dec, frames)


def test_source_formula_matches_codec():
    for vid in (0, 1, 5, 11):
        frames, fps = video_frames_np(vid)
        assert frames.shape[1:] == (VID_H, VID_W, 3)
        dec, dfps = avi_decode(avi_encode(frames, fps))
        assert dfps == fps
        assert np.array_equal(dec, frames)


def test_spark_video_frame_stats_numpy_oracle(spark):
    """Done-criterion: the driver query decodes REAL AVI bytes and the
    per-frame integer stats match a pure-numpy replay exactly."""
    out = (
        video_frame_stats(synthetic_videos(spark, 12), every=3)
        .orderBy("video_id", "frame_idx")
        .toPandas()
    )
    weight = (
        np.arange(VID_H, dtype=np.int64)[:, None] * VID_W
        + np.arange(VID_W, dtype=np.int64)[None, :]
        + 1
    )
    expected_rows = 0
    for vid in range(12):
        frames, fps = video_frames_np(vid)
        for f in range(0, frames.shape[0], 3):
            expected_rows += 1
            r = out[(out.video_id == vid) & (out.frame_idx == f)].iloc[0]
            px = frames[f].astype(np.int64)
            sums = px.sum(axis=(0, 1))
            chks = (px * weight[:, :, None]).sum(axis=(0, 1))
            assert int(r.fps) == fps
            assert [r.sum_r, r.sum_g, r.sum_b] == sums.tolist()
            assert [r.chk_r, r.chk_g, r.chk_b] == chks.tolist()
    assert len(out) == expected_rows


def test_mjpg_roundtrip_psnr():
    """Motion-JPEG round trip (round 5): every frame within the 40 dB
    lossy gate, fps/dims/count preserved through the container."""
    from etf_topox_spark.functions.image_codec import psnr
    from etf_topox_spark.functions.video_codec import avi_decode, avi_encode_mjpg
    from etf_topox_spark.sources.video import video_frames_np

    for vid in (0, 1, 5, 11):
        fr, fps = video_frames_np(vid)
        dec, fps2 = avi_decode(avi_encode_mjpg(fr, fps, quality=98))
        assert fps2 == fps and dec.shape == fr.shape
        assert min(psnr(fr[k], dec[k]) for k in range(len(fr))) >= 40.0


def test_h264_fourcc_still_raises():
    import struct

    from etf_topox_spark.functions.video_codec import avi_decode, avi_encode
    from etf_topox_spark.sources.video import video_frames_np

    fr, fps = video_frames_np(0)
    blob = bytearray(avi_encode(fr, fps))
    i = blob.index(b"strf")
    # biCompression sits 16 bytes into BITMAPINFOHEADER (after cb)
    struct.pack_into("<I", blob, i + 8 + 16, struct.unpack("<I", b"H264")[0])
    with pytest.raises(NotImplementedError, match="H264"):
        avi_decode(bytes(blob))
