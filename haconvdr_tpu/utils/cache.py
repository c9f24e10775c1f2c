"""Persistent XLA compilation cache.

Remote/first-time compiles of the large jitted programs (train step,
encoder, search kernels) cost tens of seconds to minutes; the persistent
cache makes every CLI invocation after the first start instantly.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def enable_compilation_cache(cache_dir: str = "") -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "HACONVDR_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "haconvdr_tpu_xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        logger.warning("compilation cache unavailable: %s", e)
