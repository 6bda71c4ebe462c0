"""Persistent XLA compilation cache.

The whole-pipeline programs take minutes to compile (one CPU core feeding
the TPU's remote compiler); the persistent cache makes that a once-per-
machine cost instead of once-per-process.  Called by the CLI, the inference
engine and bench.py; set VICKERS_TPU_CACHE to relocate (or to "0"/"off" to
disable).
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)
_done = False


def enable_persistent_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    loc = os.environ.get("VICKERS_TPU_CACHE", "/tmp/vickers_xla_cache")
    if loc.lower() in ("0", "off", "none", ""):
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:  # never fatal
        log.debug("persistent compilation cache unavailable: %s", e)
