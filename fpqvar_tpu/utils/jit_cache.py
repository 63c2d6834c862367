"""Persistent XLA compilation cache.

Cold compiles of the fused d30/d36 generation programs go through a remote
compile tunnel on this TPU setup (30-60 minutes for a full mode suite);
``jax_compilation_cache_dir`` turns every rerun into minutes.  One shared
on-disk cache for all CLIs and tools, keyed by HLO, safe to reuse across
processes (JAX locks per entry).
"""
from __future__ import annotations

import os

_DEFAULT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))


def enable(cache_dir: str | None = None) -> str:
    """Point JAX's compilation cache at ``cache_dir`` (default: repo-root
    ``.jax_cache``, shared with bench.py).  Call before the first jit
    compile; idempotent."""
    import jax

    d = os.path.abspath(cache_dir or os.environ.get(
        "FPQVAR_JIT_CACHE", _DEFAULT))
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # same thresholds bench.py has always used: cache any entry size, skip
    # only sub-0.5s compiles (those don't pay the remote tunnel)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return d
