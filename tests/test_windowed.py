"""Frame-windowed decode (ring carry across jit calls) bit-exactness.

Long spans decode as several window executables chained by the
reference-ring carry (pipeline.py HWANG_FWIN_CAP_MBF); references that
cross a window boundary must resolve against the carried ring.  Forcing
a tiny window cap on a B-frame stream makes nearly every reference
cross-window.
"""

import numpy as np
import pytest

from hwang_tpu.pipeline import ClipBatchDecoder
from hwang_tpu.utils.fixtures import encode_video, oracle_decode_all

pytestmark = pytest.mark.filterwarnings("error:TPU decode failed")


@pytest.mark.parametrize("bframes", [0, 2])
def test_windowed_bit_exact(tmp_path, monkeypatch, bframes):
    # M = 8*6 = 48 MBs; cap 200 forces fw=4 on a 16-frame bucket
    monkeypatch.setenv("HWANG_FWIN_CAP_MBF", "200")
    p = str(tmp_path / "clip.mp4")
    encode_video(
        p, 16, 128, 96, profile="main" if bframes else "baseline",
        gop_size=16, crf=24, b_frames=bframes,
        extra_opts=f"keyint=16:min-keyint=16:no-scenecut=1:ref=3:"
                   f"bframes={bframes}",
    )
    rows = [0, 3, 7, 11, 15]
    dec = ClipBatchDecoder([p])
    frames, index = dec.decode([rows], out_size=None, output="yuv")
    dec.close()
    truth = oracle_decode_all(p, fmt="yuv")
    frames = np.asarray(frames)
    for (clip, row), got in zip(index, frames):
        oy, ou, ov = truth[row]
        want = np.concatenate([oy.ravel(), ou.ravel(), ov.ravel()])
        assert np.array_equal(got, want), f"row {row} differs"


def test_windowed_matches_unwindowed(tmp_path, monkeypatch):
    """Same stream with and without windowing: identical output."""
    p = str(tmp_path / "c.mp4")
    encode_video(p, 12, 64, 64, profile="main", gop_size=12, crf=26,
                 b_frames=2,
                 extra_opts="keyint=12:min-keyint=12:no-scenecut=1:ref=2")
    rows = [[1, 5, 11]]

    def run():
        dec = ClipBatchDecoder([p])
        out, idx = dec.decode(rows, out_size=None, output="yuv")
        dec.close()
        return np.asarray(out)

    base = run()
    monkeypatch.setenv("HWANG_FWIN_CAP_MBF", "64")  # M=16 -> fw=4... 16*4=64
    win = run()
    assert np.array_equal(base, win)
