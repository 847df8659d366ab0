"""Kernel-tier observability.

Every kernel builder that silently falls back from a faster tier (fused
k-step -> single-step, manual-DMA -> block-mapped, fused -> jnp) routes the
decision through :func:`notify_fallback`, so a user benchmarking a "fused"
configuration is never 2-15x off the expected tier with zero signal.
Builders also stamp an ``active_tier`` attribute on the callables they
return; steppers mirror it as ``stepper.active_tier``.
"""

import logging
import warnings

logger = logging.getLogger("xlb_tpu")


def notify_fallback(message):
    """One-line notice that a faster kernel tier was replaced by a slower
    one, emitted through both ``warnings`` (deduplicated per call site by
    the default filter) and the ``xlb_tpu`` logger."""
    warnings.warn(message, RuntimeWarning, stacklevel=3)
    logger.warning(message)
