"""Batched multi-clip pipeline (ClipBatchDecoder) on CPU-jax.

Covers the dataloader front door: span planning, threaded entropy decode
with per-clip parameter sets, bucketed batched device decode, fused
selection, and the row mapping.
"""

import numpy as np
import pytest

from hwang_tpu import Decoder, VideoDecoderType
from hwang_tpu.pipeline import ClipBatchDecoder
from hwang_tpu.utils.fixtures import encode_video, oracle_decode_all


def test_pipeline_mixed_clip_settings(tmp_path):
    """Clips of equal geometry but DIFFERENT encoder settings (CAVLC vs
    CABAC, weighted vs not) in one batch: each must decode against its
    own SPS/PPS (regression: clip 0's avcC was used for every clip)."""
    specs = [
        ("a", "baseline", "weightp=0:ref=1"),
        ("b", "main", "weightp=0:ref=2:bframes=0"),
        ("c", "main", "weightp=2:ref=2:bframes=0:subme=7"),
    ]
    paths = []
    for name, prof, opts in specs:
        p = str(tmp_path / f"{name}.mp4")
        encode_video(p, 8, 64, 48, profile=prof, gop_size=8, crf=24, seed=7,
                     extra_opts=f"keyint=8:min-keyint=8:no-scenecut=1:{opts}")
        paths.append(p)
    rows = [[0, 3], [1, 7], [2, 5]]
    dec = ClipBatchDecoder(paths, io_threads=3)
    frames, mapping = dec.decode(rows, output="yuv")
    frames = np.asarray(frames)
    dec.close()
    assert mapping == [(c, r) for c, rr in enumerate(rows) for r in rr]
    k = 0
    for p, rr in zip(paths, rows):
        oracle = oracle_decode_all(p, fmt="yuv")
        for r in rr:
            oy, ou, ov = oracle[r]
            want = np.concatenate(
                [oy.reshape(-1), ou.reshape(-1), ov.reshape(-1)]
            )
            assert np.array_equal(frames[k], want), f"{p} frame {r}"
            k += 1
