"""Persistent XLA compilation cache for chip sessions.

Round-4 relay sessions spent most of their window tracing (sanity run
10.7 min of an 83-min window, docs/onchip_r04/session.log) under the
assumption that the JAX persistent cache "does not cover the axon
backend". Measured 2026-08-19 on the tunnel: it does — a cache-hit
``lowered.compile()`` returns in 0.00 s (vs minutes for a remote
compile), and the entries are ordinary local files keyed by program
fingerprint. Every chip entry point calls :func:`enable` before building
programs so that a repeat measurement session reaches its first number
without recompiling anything (the compile-time-to-first-number lever).

The cache directory defaults to ``<repo>/.jax_cache`` (gitignored) and
can be pointed elsewhere with ``MCSLAM_COMPILE_CACHE``. Safe to call
before or after the first jax import, but must run before the first
computation is traced.
"""

from __future__ import annotations

import os
import pathlib


def enable(path: str | os.PathLike | None = None) -> pathlib.Path:
    """Turn on the persistent compilation cache; returns the cache dir."""
    p = pathlib.Path(
        path
        or os.environ.get("MCSLAM_COMPILE_CACHE")
        or pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    )
    p.mkdir(parents=True, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", str(p))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return p
