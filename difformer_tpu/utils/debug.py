"""Numerical-debug hardening.

Replaces the reference's global ``torch.autograd.set_detect_anomaly(True)``
(``spatial-temporal/gnns.py:13``) and ad-hoc nan prints with the JAX-native
tools: ``jax.debug_nans`` mode and checkify-wrapped step functions
(SURVEY.md §5 race-detection/sanitizer row).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def detect_anomaly():
    """Enable NaN-checking for the enclosed block (forward AND backward —
    jax re-runs the op un-jitted to locate the source when one appears)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checkify_step(step_fn, *, errors=None):
    """Wrap a jitted step function with checkify error accumulation.
    Returns fn(*args) -> (error, out); call error.throw() to raise."""
    from jax.experimental import checkify

    errs = errors or checkify.float_checks
    return checkify.checkify(step_fn, errors=errs)


def assert_all_finite(tree, name="tree"):
    """Host-side finite check over a pytree (use in tests/driver code)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )
