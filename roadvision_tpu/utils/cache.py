"""Persistent XLA compilation cache.

First compiles of the fused pipeline step are expensive (minutes through a
remote-compile TPU attach); the persistent cache makes every subsequent
process start warm. Called by the entrypoints (bench, preview driver,
graft entry) — safe to call multiple times.
"""
from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.environ.get(
    "RVT_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))


def enable_compilation_cache(path: str = _DEFAULT_DIR) -> None:
    # RVT_NO_CACHE=1 opts a process out entirely — CPU subprocesses must
    # not read entries AOT-compiled for other machines (SIGILL risk)
    if os.environ.get("RVT_NO_CACHE") == "1":
        return
    # separate cache trees per platform: CPU AOT artifacts are
    # machine-feature-specific and must never mix with the remote-compiled
    # TPU entries (and vice versa). CPU gets no persistent cache at all —
    # its compiles are fast and its AOT entries trip machine-feature
    # mismatch warnings (SIGILL risk across hosts).
    platform = os.environ.get("JAX_PLATFORMS", "default").split(",")[0]
    if platform == "cpu":
        return
    path = f"{path}-{platform or 'default'}"
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
