"""Persistent JAX compilation cache setup.

On the tunneled TPU backend every *process* pays ~60 s per distinct
executable even when the remote compile cache is warm (measured:
2^19 prove = ~703 s first iteration vs 77 s warm, with ~11 distinct
executables).  JAX's persistent cache serializes compiled executables to
disk so subsequent processes skip that cost entirely — when the PJRT
plugin supports serialization; if it doesn't, enabling it is a no-op.

Call :func:`enable` once, after importing jax, before the first jit
execution.  Used by bench.py and the scripts/ harnesses.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/ligero_tpu_jax")


def enable(cache_dir: str | None = None) -> None:
    import jax

    path = cache_dir or os.environ.get("LIGERO_JAX_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without these flags — harmless
        pass
