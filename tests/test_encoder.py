"""Encoder path: the working equivalent of the reference's vestigial
re-encode capability (video_encoder.h:34-65 / BASELINE config 5 stretch)."""

import numpy as np

from hwang_tpu import (
    Decoder,
    EncodeOptions,
    VideoEncoder,
    encode_clip,
    index_video,
)
from hwang_tpu.utils.fixtures import oracle_decode_all, synth_frame


def test_encode_decode_round_trip(tmp_path):
    p = str(tmp_path / "enc.mp4")
    frames = [synth_frame(i, 96, 64) for i in range(20)]
    encode_clip(p, frames, EncodeOptions(quality=18, keyframe_distance=10,
                                         profile="baseline"))
    idx = index_video(p)
    assert idx.frames() == 20
    assert list(idx.keyframe_indices)[:1] == [0]
    with Decoder(p) as dec:
        out = dec.retrieve(range(20))
    # lossy round trip: high-quality CRF should be close to the source
    err = np.mean(
        [np.abs(a.astype(int) - b.astype(int)).mean()
         for a, b in zip(out, frames)]
    )
    assert err < 12.0, f"mean abs error {err}"


def test_encode_keyframe_distance(tmp_path):
    p = str(tmp_path / "gop.mp4")
    frames = [synth_frame(i, 64, 64) for i in range(24)]
    encode_clip(
        p, frames,
        EncodeOptions(quality=25, keyframe_distance=8, profile="baseline",
                      extra_params="keyint=8:min-keyint=8:no-scenecut=1"),
    )
    idx = index_video(p)
    assert list(idx.keyframe_indices) == [0, 8, 16]


def test_encode_hevc(tmp_path):
    p = str(tmp_path / "hevc.mp4")
    frames = [synth_frame(i, 64, 64) for i in range(8)]
    encode_clip(p, frames, EncodeOptions(codec="hevc", profile="main",
                                         quality=25, keyframe_distance=8))
    idx = index_video(p)
    assert idx.frames() == 8
    assert idx.format in ("hvc1", "hev1")
    # decodable through the software backend
    with Decoder(p) as dec:
        out = dec.retrieve([0, 5])
    assert out[0].shape == (64, 64, 3)


def test_encoder_stateful_interface(tmp_path):
    p = str(tmp_path / "st.mp4")
    enc = VideoEncoder()
    enc.configure(p, 64, 48, EncodeOptions(quality=22, profile="baseline"))
    for i in range(6):
        enc.feed(synth_frame(i, 64, 48))
    enc.flush()
    assert index_video(p).frames() == 6


def test_encode_bitrate_abr(tmp_path):
    """EncodeOptions.bitrate (ABR mode, quality=-1): plumbed through to
    the encoder and actually controls output size.  Reference surface:
    video_encoder.h:34-38."""
    import os

    frames = [synth_frame(i, 128, 96) for i in range(48)]
    sizes = {}
    for rate in (40_000, 400_000):
        p = str(tmp_path / f"abr_{rate}.mp4")
        encode_clip(
            p, frames,
            EncodeOptions(quality=-1, bitrate=rate, profile="baseline",
                          keyframe_distance=16),
        )
        assert index_video(p).frames() == 48
        sizes[rate] = os.path.getsize(p)
    # 10x the target bitrate must yield a substantially larger file
    assert sizes[400_000] > 2 * sizes[40_000], sizes


def test_reencode_from_decode(tmp_path):
    """Config 5 stretch shape: decode -> re-encode -> decode."""
    src = str(tmp_path / "src.mp4")
    encode_clip(src, [synth_frame(i, 64, 64) for i in range(10)],
                EncodeOptions(quality=18, profile="baseline"))
    with Decoder(src) as dec:
        frames = dec.retrieve(range(10))
    dst = str(tmp_path / "dst.mp4")
    encode_clip(dst, frames, EncodeOptions(quality=18, profile="baseline"))
    redecoded = oracle_decode_all(dst)
    assert len(redecoded) == 10
