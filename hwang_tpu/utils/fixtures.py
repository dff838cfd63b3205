"""Synthesized video fixtures for tests and benchmarks.

The reference downloaded real videos over the network at test time
(hwang/tests/videos.h:26-43) — tests failed offline.  Here fixtures are
generated locally with libx264/libx265 through the native shim, with
controlled GOP structure, profile, and fragmentation, and cached under a
fixtures directory keyed by their parameters.
"""

from __future__ import annotations

import ctypes
import hashlib
import os

import numpy as np

from ..native import as_u8p, get_lib

_FIXTURE_DIR = os.environ.get(
    "HWANG_FIXTURE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".fixtures"),
)


def synth_frame(i: int, width: int, height: int, seed: int = 0) -> np.ndarray:
    """Deterministic synthetic RGB frame: moving gradients + blocks + noise.

    Designed to exercise the codec: smooth gradients (intra prediction),
    translating structure (motion compensation), and a little noise
    (residual coding).
    """
    # 1-D ramps broadcast to 2-D (identical output to the old mgrid code
    # but ~30x faster at 1080p — mgrid materialized two HxW int64 grids)
    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    r1 = ((x * 255 // max(width - 1, 1)) + 5 * i) % 256
    g1 = ((y * 255 // max(height - 1, 1)) + 3 * i) % 256
    frame = np.empty((height, width, 3), np.uint8)
    frame[..., 0] = r1.astype(np.uint8)[None, :]
    frame[..., 1] = g1.astype(np.uint8)[:, None]
    frame[..., 2] = (
        ((x[None, :] + y[:, None] + 7 * i) // 2) % 256
    ).astype(np.uint8)
    # moving square
    sq = 16
    cx = (10 + 4 * i) % max(width - sq, 1)
    cy = (8 + 3 * i) % max(height - sq, 1)
    frame[cy : cy + sq, cx : cx + sq] = (255, 255, 255)
    # deterministic noise band
    rng = np.random.default_rng(seed * 100003 + i)
    band = rng.integers(0, 256, (min(8, height), width, 3), dtype=np.uint8)
    frame[: band.shape[0]] = band
    return frame


def encode_video(
    path: str,
    n_frames: int,
    width: int,
    height: int,
    fps: int = 24,
    codec: str = "libx264",
    profile: str = "high",
    gop_size: int = 30,
    b_frames: int = 0,
    crf: int = 23,
    fragmented: bool = False,
    extra_opts: str = "",
    frame_fn=synth_frame,
    seed: int = 0,
) -> str:
    lib = get_lib()
    err = ctypes.create_string_buffer(512)
    h = lib.hw_enc_open(
        path.encode(), width, height, fps,
        codec.encode(), profile.encode(),
        gop_size, b_frames, crf, -1, int(fragmented),
        extra_opts.encode(), err, len(err),
    )
    if not h:
        raise RuntimeError(f"encoder open failed: {err.value.decode()}")
    try:
        for i in range(n_frames):
            frame = frame_fn(i, width, height, seed)
            ptr, owner = as_u8p(frame)
            if lib.hw_enc_write_rgb(h, ptr) != 0:
                raise RuntimeError(
                    f"encode failed: {lib.hw_enc_error(h).decode()}"
                )
            del owner
        if lib.hw_enc_close(h) != 0:
            raise RuntimeError("encoder close/flush failed")
        h = None
    finally:
        if h is not None:
            lib.hw_enc_close(h)
    return path


def fixture(
    name: str,
    n_frames: int,
    width: int,
    height: int,
    **kwargs,
) -> str:
    """Create (or reuse a cached) fixture video; returns its path."""
    os.makedirs(_FIXTURE_DIR, exist_ok=True)
    key = hashlib.sha1(
        repr((name, n_frames, width, height, sorted(kwargs.items()))).encode()
    ).hexdigest()[:12]
    path = os.path.join(_FIXTURE_DIR, f"{name}_{key}.mp4")
    if not os.path.exists(path):
        # pid-unique temp: two processes may synthesize the same fixture
        # concurrently (bench + tools); both must not share a .tmp file
        tmp = f"{path}.{os.getpid()}.tmp"
        encode_video(tmp, n_frames, width, height, **kwargs)
        os.replace(tmp, path)
    return path


def oracle_decode_all(path: str, fmt: str = "rgb", n_threads: int = 1):
    """Decode every frame via the independent libavformat+libavcodec path.

    Returns a list of numpy arrays: HxWx3 uint8 for fmt='rgb', or
    (y, u, v) plane tuples for fmt='yuv'.
    """
    lib = get_lib()
    err = ctypes.create_string_buffer(512)
    h = lib.hw_oracle_open(path.encode(), n_threads, err, len(err))
    if not h:
        raise RuntimeError(f"oracle open failed: {err.value.decode()}")
    frames = []
    try:
        w = ctypes.c_int()
        ht = ctypes.c_int()
        lib.hw_oracle_dims(h, ctypes.byref(w), ctypes.byref(ht))
        w, ht = w.value, ht.value
        cw, ch = (w + 1) // 2, (ht + 1) // 2
        while True:
            if fmt == "rgb":
                buf = np.empty((ht, w, 3), np.uint8)
                rc = lib.hw_oracle_next(h, as_u8p(buf)[0], 0)
            else:
                buf = np.empty(ht * w + 2 * cw * ch, np.uint8)
                rc = lib.hw_oracle_next(h, as_u8p(buf)[0], 1)
            if rc == 0:
                break
            if rc < 0:
                raise RuntimeError(
                    f"oracle decode failed: {lib.hw_oracle_error(h).decode()}"
                )
            if fmt == "rgb":
                frames.append(buf)
            else:
                y = buf[: ht * w].reshape(ht, w)
                u = buf[ht * w : ht * w + cw * ch].reshape(ch, cw)
                v = buf[ht * w + cw * ch :].reshape(ch, cw)
                frames.append((y, u, v))
    finally:
        lib.hw_oracle_close(h)
    return frames
