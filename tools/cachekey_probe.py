"""Dump the per-component compile-cache key hashes for a tiny jit.

Run twice (different processes / before+after a TPU worker restart) and
diff the output to find which key component destabilizes the persistent
cache.  jax._src.cache_key logs each component's running digest at
DEBUG level; we capture that plus the final key.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

logging.basicConfig(level=logging.DEBUG)
logging.getLogger().setLevel(logging.DEBUG)
for name in ("jax._src.cache_key", "jax._src.compilation_cache"):
    logging.getLogger(name).setLevel(logging.DEBUG)

from hwang_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


@jax.jit
def probe(x):
    return (x * 3 + 1).sum()


class Cap(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.lines = []

    def emit(self, record):
        self.lines.append(record.getMessage())


cap = Cap()
logging.getLogger("jax._src.cache_key").addHandler(cap)
logging.getLogger("jax._src.compilation_cache").addHandler(cap)

x = jnp.arange(1024, dtype=jnp.int32)
print("result:", probe(x))

for ln in cap.lines:
    if "get (" in ln or "key" in ln.lower():
        print("KEYLOG:", ln)
