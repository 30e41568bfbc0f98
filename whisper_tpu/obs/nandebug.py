"""NaN sanitizer — the DBG_TEST_NAN analogue (Whisper/stdafx.h:41-44,
dbgFindNaN shader, Whisper/ML/DbgNanTest.h:5-21).

Usage:
  with nan_debug():            # flips jax_debug_nans for the scope
      run...

  check_pytree_finite(params)  # one-shot scan of any pytree
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def nan_debug():
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_pytree_finite(tree, name: str = "pytree") -> None:
    """Raises with the offending leaf path when any leaf has NaN/Inf."""
    bad = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(f"{name}: non-finite values in {bad}")
