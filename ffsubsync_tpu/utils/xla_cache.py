# -*- coding: utf-8 -*-
"""Persistent XLA compilation cache setup.

The compute path compiles a handful of programs per (bucketed) signal length;
on cold processes those compiles dominate start-up (tens of seconds on a
remote-compile TPU relay). The persistent cache keys serialized executables
by HLO hash so every later process — CLI invocations, batch workers, the
benchmark harness — reuses them. The reference has no analog (its "kernels"
are prebuilt C libraries); this is the JAX-native equivalent of shipping
compiled kernels.

Disable with ``FFS_TPU_NO_XLA_CACHE=1``; relocate with
``FFS_TPU_XLA_CACHE_DIR``.
"""
import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "ffsubsync_tpu", "xla"
)

_enabled = False


def enable_persistent_cache() -> bool:
    """Idempotently enable JAX's persistent compilation cache."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get("FFS_TPU_NO_XLA_CACHE") == "1":
        return False
    cache_dir = os.environ.get("FFS_TPU_XLA_CACHE_DIR", _DEFAULT_DIR)
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
        logger.debug("persistent XLA cache at %s", cache_dir)
        return True
    except Exception as e:  # cache is an optimization, never a requirement
        logger.debug("persistent XLA cache unavailable: %s", e)
        return False
