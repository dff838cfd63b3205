"""Persistent XLA compile-cache enablement.

On this host the TPU is behind a relay where every compile is remote and
slow (30-150 s per executable), so a warm persistent cache is the
difference between a bench that finishes and one that gets killed.  The
usual `JAX_COMPILATION_CACHE_DIR` env var silently does NOTHING here:
the image's sitecustomize (PYTHONPATH=/root/.axon_site) imports jax at
interpreter startup — before any user code runs — and jax freezes the
env-derived config default at import time.  `jax.config.update` after
import is the only switch that works.

Call :func:`enable` once per process (bench.py, __graft_entry__.py and
tests/conftest.py do).  hwang_tpu's own import also honors the env var
if the user set one, repairing its intended meaning.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at `path` (default: the
    repo-local `.jax_cache/`, which is committed warm).  Returns the
    active path.  Idempotent; safe before or after device init."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT
    jax.config.update("jax_compilation_cache_dir", path)
    # the relay charges ~seconds of round trip per compile no matter how
    # trivial the executable — cache everything, not just slow compiles
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def enable_if_requested() -> None:
    """Honor JAX_COMPILATION_CACHE_DIR when the user set it but jax
    imported too early (sitecustomize) for it to take effect."""
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not env:
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            enable(env)
    except Exception:  # pragma: no cover — never break import over this
        pass
