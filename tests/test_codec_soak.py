"""Randomized codec soak: random encoder configurations through the full
TPU decode path, bit-exact vs the libavcodec oracle.

Mirrors the spirit of the reference's GatherFramesComparison oracle test
(decoder_automata_test.cpp:262-342) but sweeps the encoder parameter
space instead of one downloaded clip: entropy mode, profile, B-frame
depth, reference count, slices, GOP length, odd crops and QPs are drawn
from a seeded RNG so failures reproduce.
"""

import numpy as np
import pytest

from hwang_tpu import Decoder, VideoDecoderType
from hwang_tpu.utils.fixtures import encode_video, oracle_decode_all


def _config(rng):
    profile = rng.choice(["baseline", "main", "high"])
    bframes = 0 if profile == "baseline" else int(rng.integers(0, 4))
    cabac = profile != "baseline" and bool(rng.integers(0, 2))
    gop = int(rng.integers(6, 20))
    n = gop + int(rng.integers(2, gop))
    w = int(rng.integers(4, 9)) * 16
    h = int(rng.integers(3, 7)) * 16
    if rng.integers(0, 3) == 0:
        # non-MB-aligned (even) dims exercise frame cropping
        w -= 2 * int(rng.integers(1, 4))
        h -= 2 * int(rng.integers(1, 4))
    opts = [
        f"keyint={gop}", f"min-keyint={gop}", "no-scenecut=1",
        f"ref={int(rng.integers(1, 4))}",
    ]
    if not cabac and profile != "baseline":
        opts.append("cabac=0")
    if rng.integers(0, 3) == 0:
        opts.append(f"slices={int(rng.integers(2, 4))}")
    if rng.integers(0, 4) == 0:
        opts.append("weightp=2")
    if profile == "high" and rng.integers(0, 3) == 0:
        opts.append("cqm=jvt")
    return dict(
        n_frames=n, width=w, height=h, profile=profile, b_frames=bframes,
        gop_size=gop, crf=int(rng.integers(18, 34)),
        extra_opts=":".join(opts),
    )


@pytest.mark.parametrize("seed", [11, 23, 37, 53, 71, 89])
def test_soak_tpu_bit_exact(tmp_path, seed):
    rng = np.random.default_rng(seed)
    cfg = _config(rng)
    p = str(tmp_path / f"soak_{seed}.mp4")
    encode_video(p, cfg.pop("n_frames"), cfg.pop("width"),
                 cfg.pop("height"), seed=seed, **cfg)

    oracle = oracle_decode_all(p, fmt="yuv")
    n = len(oracle)
    rows = sorted(rng.choice(n, size=min(6, n), replace=False).tolist())
    with Decoder(p, decoder_type=VideoDecoderType.TPU,
                 output_format="yuv420") as dec:
        out = dec.retrieve(rows)
    for got, r in zip(out, rows):
        oy, ou, ov = oracle[r]
        want = np.concatenate(
            [oy.reshape(-1), ou.reshape(-1), ov.reshape(-1)]
        )
        assert np.array_equal(got, want), (
            f"seed {seed} frame {r} differs (cfg {cfg})"
        )
