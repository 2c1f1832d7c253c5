"""Persistent XLA compilation cache (opt-out).

The flagship train step's first compile is expensive (the Pallas flash
kernels at teacher lengths 2048-4096 alone take minutes each through a
remote-compile hop; VERDICT r2 measured ~28 min end-to-end for the
nested-remat step).  JAX's persistent compilation cache keys serialized
executables on the HLO fingerprint, so every later process on the same
machine/topology pays only deserialization.  The reference has no
equivalent — PyTorch eager pays per-op dispatch instead of compiles.

Default ON for the CLIs; ``LICV_COMPILE_CACHE=0`` disables, and
``LICV_COMPILE_CACHE_DIR`` overrides the location.  Cache failures are
non-fatal by design (``jax_raise_persistent_cache_errors`` defaults False):
backends that cannot serialize executables simply skip the cache with a
debug log, so this is safe to enable unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional

from .log import get_logger

logger = get_logger("compile_cache")

_DEFAULT_DIR = "~/.cache/licv_vqa_tpu/xla"


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the directory in use, or None when disabled/unsupported.  Must
    run before the first compilation to catch it (later calls still apply
    to subsequent compiles).
    """
    if os.environ.get("LICV_COMPILE_CACHE", "1").lower() in ("0", "false", "off"):
        return None
    cache_dir = (
        cache_dir
        or os.environ.get("LICV_COMPILE_CACHE_DIR")
        or os.path.expanduser(_DEFAULT_DIR)
    )
    import jax

    # TPU-only by default: XLA:CPU entries are machine-feature-specific AOT
    # code, and containers migrate hosts — a cross-host load warns "could
    # lead to execution errors such as SIGILL" (observed).  CPU compiles are
    # cheap anyway; LICV_COMPILE_CACHE_CPU=1 opts back in.
    if (
        jax.default_backend() != "tpu"
        and os.environ.get("LICV_COMPILE_CACHE_CPU") != "1"
    ):
        logger.info("compilation cache skipped on %s", jax.default_backend())
        return None

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache anything that took >=10s to compile regardless of size —
        # the big Pallas kernels are exactly the entries we want
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # old jax / read-only fs: feature off, not fatal
        logger.warning("compilation cache unavailable: %r", e)
        return None
    return cache_dir
