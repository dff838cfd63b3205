"""Test configuration.

Tests run on CPU with an 8-device virtual mesh so multi-chip sharding
(shard_map over a clip axis) is exercised without TPU hardware; the driver
separately compile-checks the TPU path via __graft_entry__.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The TPU-VM image force-registers the axon TPU backend in sitecustomize
# (jax is already imported by the time conftest runs), so selecting the
# virtual CPU mesh needs a config update, not just JAX_PLATFORMS.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the CPU test mesh: the suite compiles the
# decoder many times on 8 virtual devices — caching cuts reruns a lot.
# Separate (gitignored) dir from the committed TPU .jax_cache.
from hwang_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_cpu",
))

# Tests exercise the DEVICE pipeline by default: the latency router would
# send their (tiny) requests to the host decoder and silently bypass the
# code under test.  Router-specific tests opt back in via monkeypatch.
os.environ.setdefault("HWANG_ROUTER", "off")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_h264():
    """75-frame 128x96 baseline-ish H.264, 3 GOPs of 25."""
    from hwang_tpu.utils.fixtures import fixture

    return fixture(
        "small_h264", 75, 128, 96, gop_size=25,
        extra_opts="keyint=25:min-keyint=25:no-scenecut=1",
    )


@pytest.fixture(scope="session")
def small_h264_frag():
    from hwang_tpu.utils.fixtures import fixture

    return fixture(
        "small_h264_frag", 60, 128, 96, gop_size=20, fragmented=True,
        extra_opts="keyint=20:min-keyint=20:no-scenecut=1",
    )


@pytest.fixture(scope="session")
def small_hevc():
    from hwang_tpu.utils.fixtures import fixture

    return fixture(
        "small_hevc", 50, 128, 96, codec="libx265", profile="main",
        gop_size=25, extra_opts="keyint=25:min-keyint=25:scenecut=0",
    )


@pytest.fixture(scope="session")
def bframes_h264():
    """H.264 with B-frames (reorder + CABAC, main profile)."""
    from hwang_tpu.utils.fixtures import fixture

    return fixture(
        "bframes_h264", 60, 128, 96, profile="main", gop_size=20, b_frames=2,
        extra_opts="keyint=20:min-keyint=20:no-scenecut=1",
    )
