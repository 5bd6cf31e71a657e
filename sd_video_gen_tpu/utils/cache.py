"""Persistent XLA compilation cache.

SD-scale programs (512px UNet denoise loops) take many minutes to compile;
the persistent cache makes every CLI invocation after the first start in
seconds. Called by the CLIs, bench.py and __graft_entry__; set
SDVG_NO_COMPILATION_CACHE=1 to disable.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    if os.environ.get("SDVG_NO_COMPILATION_CACHE", "").lower() \
            not in ("", "0", "false"):
        return None
    import jax
    path = path or os.environ.get(
        "SDVG_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "sdvg_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        return path
    except Exception:
        return None
