"""Persistent XLA compilation cache (shared by train.py / val.py / bench.py)."""

from __future__ import annotations

import os


def enable_compile_cache(default_dir: str = "/tmp/jax_comp_cache") -> None:
    """Point jax at a persistent compilation cache so the big train/slide
    programs compile once per machine.  Safe no-op on jax versions without
    the options."""
    import jax
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", default_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
