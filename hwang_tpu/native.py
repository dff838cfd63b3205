"""Loader for the native runtime library (libhwang_native.so).

Builds the C++ library on first use (cmake + ninja, cached under
native/build/) and exposes its C ABI through ctypes.  The native layer holds
the host-side runtime: the libav-backed software decode backend and fixture
encoder (native/src/shim_ffmpeg.cpp), and the H.264 entropy decoder that
feeds the TPU reconstruction kernels.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
# TSAN builds live in their own tree so toggling HWANG_TSAN never serves
# a stale non-instrumented library (run under LD_PRELOAD=libtsan.so —
# see tests/test_tsan_soak.py)
_TSAN = os.environ.get("HWANG_TSAN") == "1"
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build_tsan" if _TSAN else "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libhwang_native.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None


def _sources_mtime() -> float:
    latest = 0.0
    for root, _, files in os.walk(os.path.join(_NATIVE_DIR, "src")):
        for f in files:
            latest = max(latest, os.path.getmtime(os.path.join(root, f)))
    latest = max(latest, os.path.getmtime(os.path.join(_NATIVE_DIR, "CMakeLists.txt")))
    return latest


def build(force: bool = False) -> str:
    """Build libhwang_native.so if stale; returns its path.

    HWANG_NATIVE_LIB overrides with a prebuilt library path (used by
    perf experiments, e.g. PGO A/B builds) — no staleness check."""
    env_lib = os.environ.get("HWANG_NATIVE_LIB")
    if env_lib:
        return env_lib
    with _lock:
        if (
            not force
            and os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= _sources_mtime()
        ):
            return _LIB_PATH
        os.makedirs(_BUILD_DIR, exist_ok=True)
        subprocess.run(
            ["cmake", "-G", "Ninja", "-DCMAKE_BUILD_TYPE=Release",
             f"-DHWANG_TSAN={'ON' if _TSAN else 'OFF'}", ".."],
            cwd=_BUILD_DIR,
            check=True,
            capture_output=True,
        )
        proc = subprocess.run(
            ["ninja"], cwd=_BUILD_DIR, capture_output=True, text=True
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"native build failed:\n{proc.stdout}\n{proc.stderr}"
            )
        return _LIB_PATH


def _declare(lib: ctypes.CDLL) -> None:
    c = ctypes
    u8p = c.POINTER(c.c_uint8)

    # encoder
    lib.hw_enc_open.restype = c.c_void_p
    lib.hw_enc_open.argtypes = [
        c.c_char_p, c.c_int, c.c_int, c.c_int,  # path, w, h, fps
        c.c_char_p, c.c_char_p,                 # codec, profile
        c.c_int, c.c_int,                       # gop, bframes
        c.c_int, c.c_int, c.c_int,              # crf, bitrate, fragmented
        c.c_char_p, c.c_char_p, c.c_int,        # extra_opts, err, err_cap
    ]
    lib.hw_enc_error.restype = c.c_char_p
    lib.hw_enc_error.argtypes = [c.c_void_p]
    lib.hw_enc_write_rgb.restype = c.c_int
    lib.hw_enc_write_rgb.argtypes = [c.c_void_p, u8p]
    lib.hw_enc_write_yuv.restype = c.c_int
    lib.hw_enc_write_yuv.argtypes = [c.c_void_p, u8p, u8p, u8p]
    lib.hw_enc_close.restype = c.c_int
    lib.hw_enc_close.argtypes = [c.c_void_p]

    # stateful decoder
    lib.hw_dec_open.restype = c.c_void_p
    lib.hw_dec_open.argtypes = [
        c.c_char_p, u8p, c.c_int, c.c_int, c.c_char_p, c.c_int
    ]
    lib.hw_dec_error.restype = c.c_char_p
    lib.hw_dec_error.argtypes = [c.c_void_p]
    lib.hw_dec_feed.restype = c.c_int
    lib.hw_dec_feed.argtypes = [c.c_void_p, u8p, c.c_int, c.c_int]
    lib.hw_dec_frames_buffered.restype = c.c_int
    lib.hw_dec_frames_buffered.argtypes = [c.c_void_p]
    lib.hw_dec_frame_dims.restype = c.c_int
    lib.hw_dec_frame_dims.argtypes = [
        c.c_void_p, c.POINTER(c.c_int), c.POINTER(c.c_int)
    ]
    lib.hw_dec_get_frame.restype = c.c_int
    lib.hw_dec_get_frame.argtypes = [c.c_void_p, u8p, c.c_int]
    lib.hw_dec_discard_frame.restype = c.c_int
    lib.hw_dec_discard_frame.argtypes = [c.c_void_p]
    lib.hw_dec_flush.restype = c.c_int
    lib.hw_dec_flush.argtypes = [c.c_void_p]
    lib.hw_dec_close.restype = None
    lib.hw_dec_close.argtypes = [c.c_void_p]

    # oracle
    lib.hw_oracle_open.restype = c.c_void_p
    lib.hw_oracle_open.argtypes = [c.c_char_p, c.c_int, c.c_char_p, c.c_int]
    lib.hw_oracle_error.restype = c.c_char_p
    lib.hw_oracle_error.argtypes = [c.c_void_p]
    lib.hw_oracle_dims.restype = c.c_int
    lib.hw_oracle_dims.argtypes = [
        c.c_void_p, c.POINTER(c.c_int), c.POINTER(c.c_int)
    ]
    lib.hw_oracle_next.restype = c.c_int
    lib.hw_oracle_next.argtypes = [c.c_void_p, u8p, c.c_int]
    lib.hw_oracle_close.restype = None
    lib.hw_oracle_close.argtypes = [c.c_void_p]


def _retain_big_allocations() -> None:
    """Make glibc recycle the big decode buffers instead of munmapping.

    The decode hot path allocates hundreds of MB of numpy SoA buffers per
    span (GopTensors + pack outputs).  By default glibc serves >128 KB
    requests with fresh mmaps, so every span pays first-touch page faults
    on write and munmap TLB shootdowns on free — measured at ~2x the
    useful pack time at 1080p.  Raising the mmap threshold and disabling
    trim keeps that memory on the heap, where realloc-ed spans hit warm
    pages.  RSS stays bounded by the high-water mark of one in-flight
    chunk set (the pipeline bounds those)."""
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, (1 << 31) - 1)
    except Exception:
        pass  # non-glibc platforms: behave as before


def get_lib() -> ctypes.CDLL:
    """Build (if needed) and load the native library."""
    global _lib
    if _lib is None:
        path = build()
        lib = ctypes.CDLL(path)
        _declare(lib)
        _retain_big_allocations()
        _lib = lib
    return _lib


# ---------------------------------------------------------------------------
# Recycling buffer pool for the big decode SoA arrays.
#
# _retain_big_allocations() fixes the main arena, but the pipeline's
# entropy decode runs on POOL THREADS, whose glibc arenas serve any
# request over the 64 MB per-heap limit straight from mmap regardless of
# mallopt — so every 1080p span paid fresh-page faults + kernel zeroing
# on its ~200 MB SoA and munmap TLB shootdowns on free.  Measured on the
# config2 spans: 11.2 s (9.2 s sys) with churn vs 1.5 s with reuse.
# Spans share shapes, so an explicit mmap-backed freelist recycles
# perfectly: pages stay resident, later spans write warm memory.
# ---------------------------------------------------------------------------

_pool_lock = __import__("threading").Lock()
_pool: dict[int, list] = {}
_pool_bytes = 0
_POOL_CAP = 12 << 30  # stop caching beyond this (plenty on this host)


def _pool_return(n: int, mm) -> None:
    global _pool_bytes
    with _pool_lock:
        if _pool_bytes + n <= _POOL_CAP:
            _pool.setdefault(n, []).append(mm)
            _pool_bytes += n
            return
    mm.close()


def pool_array(shape, dtype, fill=None):
    """A numpy array on a recycled anonymous mmap.

    `fill=None` leaves contents undefined (np.empty semantics — reused
    buffers carry stale bytes); otherwise the array is filled.  The
    backing buffer returns to the pool when the array (and every view of
    it — views keep the base ndarray alive) is garbage-collected.
    """
    import mmap as _mmap
    import weakref

    import numpy as np

    dt = np.dtype(dtype)
    total = 1
    for s in (shape if isinstance(shape, tuple) else (shape,)):
        total *= int(s)
    n = max(total * dt.itemsize, 1)
    # round to 64 KB classes so near-miss shapes still reuse
    n = (n + 0xFFFF) & ~0xFFFF
    global _pool_bytes
    with _pool_lock:
        free = _pool.get(n)
        if free:
            mm = free.pop()
            _pool_bytes -= n
        else:
            mm = None
    if mm is None:
        mm = _mmap.mmap(-1, n)
    a = np.frombuffer(mm, dtype=dt, count=total).reshape(shape)
    weakref.finalize(a, _pool_return, n, mm)
    if fill is not None:
        a.fill(fill)
    return a


def as_u8p(arr):
    """View bytes / a contiguous numpy uint8 array as (uint8*, owner).

    The caller must keep `owner` referenced for the duration of the native
    call; the pointer aliases its memory.
    """
    import numpy as np

    if isinstance(arr, (bytes, bytearray, memoryview)):
        arr = np.frombuffer(arr, dtype=np.uint8)
    else:
        arr = np.ascontiguousarray(arr, dtype=np.uint8)
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), arr
