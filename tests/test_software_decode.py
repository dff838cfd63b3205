"""End-to-end decode tests on the software (oracle) backend.

The core contract (mirroring the reference's GatherFramesComparison,
decoder_automata_test.cpp:262-342): sparse gather decode must be
byte-identical to sequential-from-frame-0 decode.
"""

import numpy as np
import pytest

from hwang_tpu import Decoder
from hwang_tpu.utils.fixtures import oracle_decode_all


def test_decode_all_matches_oracle(small_h264):
    """Config 1: decode all frames sequentially; bit-exact vs the
    independent libavformat demux+decode path."""
    oracle = oracle_decode_all(small_h264)
    with Decoder(small_h264) as dec:
        frames = dec.retrieve(range(len(oracle)))
    assert len(frames) == len(oracle)
    for i, (a, b) in enumerate(zip(frames, oracle)):
        assert np.array_equal(a, b), f"frame {i} differs"


def test_gather_equals_sequential(small_h264):
    """The correctness oracle: decode frame 63 by seeking vs decoding
    everything from 0 — byte-identical RGB."""
    with Decoder(small_h264) as dec:
        sequential = dec.retrieve(range(75))
    with Decoder(small_h264) as dec:
        gathered = dec.retrieve([63])
    assert np.array_equal(gathered[0], sequential[63])


def test_strided_ranges(small_h264):
    """Mirror of GetStridedRangesFrames (decoder_automata_test.cpp:206-260)."""
    rows = list(range(0, 10)) + list(range(30, 55)) + list(range(60, 75, 3))
    oracle = oracle_decode_all(small_h264)
    with Decoder(small_h264) as dec:
        frames = dec.retrieve(rows)
    for r, f in zip(rows, frames):
        assert np.array_equal(f, oracle[r]), f"frame {r} differs"


def test_sparse_stride_gather(small_h264):
    oracle = oracle_decode_all(small_h264)
    rows = list(range(0, 75, 10))
    with Decoder(small_h264) as dec:
        frames = dec.retrieve(rows)
    for r, f in zip(rows, frames):
        assert np.array_equal(f, oracle[r]), f"frame {r} differs"


def test_random_shuffled_rows(small_h264):
    """Config 3 pattern: shuffled request order; output must map back."""
    rng = np.random.default_rng(1)
    rows = rng.permutation(75)[:12].tolist()
    oracle = oracle_decode_all(small_h264)
    with Decoder(small_h264) as dec:
        frames = dec.retrieve(rows)
    for r, f in zip(rows, frames):
        assert np.array_equal(f, oracle[r]), f"frame {r} differs"


def test_fragmented_decode(small_h264_frag):
    oracle = oracle_decode_all(small_h264_frag)
    rows = [0, 7, 21, 40, 59]
    with Decoder(small_h264_frag) as dec:
        frames = dec.retrieve(rows)
    for r, f in zip(rows, frames):
        assert np.array_equal(f, oracle[r]), f"frame {r} differs"


def test_hevc_decode(small_hevc):
    oracle = oracle_decode_all(small_hevc)
    rows = [0, 10, 26, 49]
    with Decoder(small_hevc) as dec:
        frames = dec.retrieve(rows)
    for r, f in zip(rows, frames):
        assert np.array_equal(f, oracle[r]), f"frame {r} differs"


def test_bframes_decode(bframes_h264):
    """B-frames: display order != decode order; gather must still land on
    the right displayed frames."""
    oracle = oracle_decode_all(bframes_h264)
    rows = [0, 5, 23, 41, 59]
    with Decoder(bframes_h264) as dec:
        frames = dec.retrieve(rows)
    for r, f in zip(rows, frames):
        assert np.array_equal(f, oracle[r]), f"frame {r} differs"


def test_bframes_mid_gop_gather(bframes_h264):
    """Regression: sample order is DECODE order; trimming a span at the
    last requested display frame drops mid-display-order frames when the
    stream reorders (B-frames).  Software spans must stay untrimmed."""
    oracle = oracle_decode_all(bframes_h264)
    rows = [4, 17, 34, 46]  # mid-GOP positions on a bframes=3 stream
    with Decoder(bframes_h264) as dec:
        frames = dec.retrieve(rows)
    for r, f in zip(rows, frames):
        assert np.array_equal(f, oracle[r]), f"frame {r} differs"


def test_yuv_output(small_h264):
    with Decoder(small_h264, output_format="yuv420") as dec:
        frames = dec.retrieve([3])
    assert frames[0].shape == (128 * 96 + 2 * 64 * 48,)


def test_multiple_retrieves_same_decoder(small_h264):
    oracle = oracle_decode_all(small_h264)
    with Decoder(small_h264) as dec:
        a = dec.retrieve([5])
        b = dec.retrieve([40, 70])
    assert np.array_equal(a[0], oracle[5])
    assert np.array_equal(b[0], oracle[40])
    assert np.array_equal(b[1], oracle[70])


def test_tpu_decoder_decodes_hevc_natively(small_hevc):
    """TPU decoder type decodes HEVC (incl. inter) on the device path:
    no fallback warning, YUV bit-exact vs the oracle (the RGB epilogue
    is exact-integer BT.601, which differs from swscale by <= 3)."""
    import warnings

    from hwang_tpu import Decoder, VideoDecoderType
    from hwang_tpu.utils.fixtures import oracle_decode_all

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a fallback warning = failure
        with Decoder(small_hevc, decoder_type=VideoDecoderType.TPU,
                     output_format="yuv420") as dec:
            frames = dec.retrieve([0, 10])
    oracle = oracle_decode_all(small_hevc, fmt="yuv")
    for got, idx in zip(frames, (0, 10)):
        truth = np.concatenate([p.ravel() for p in oracle[idx]])
        assert np.array_equal(got.ravel(), truth)


def test_tpu_decoder_handles_cabac_bframes(bframes_h264):
    """CABAC + B-frames decode natively on the TPU path (no fallback);
    YUV output is bit-exact vs the oracle."""
    import warnings

    from hwang_tpu import Decoder, VideoDecoderType
    from hwang_tpu.utils.fixtures import oracle_decode_all

    oracle = oracle_decode_all(bframes_h264, fmt="yuv")
    with warnings.catch_warnings(record=True) as ws:
        warnings.simplefilter("always")
        with Decoder(bframes_h264, decoder_type=VideoDecoderType.TPU,
                     output_format="yuv420") as dec:
            frames = dec.retrieve([5, 23, 41])
    assert not any("falling back" in str(w.message) for w in ws)
    for i, r in enumerate([5, 23, 41]):
        oy, ou, ov = oracle[r]
        want = np.concatenate(
            [oy.reshape(-1), ou.reshape(-1), ov.reshape(-1)]
        )
        assert np.array_equal(frames[i], want), f"frame {r}"
