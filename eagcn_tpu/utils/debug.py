"""Numerical-safety guards (SURVEY §5 'race detection / sanitizers' row).

JAX's functional model subsumes data-race concerns; what remains is
numerical health.  This module provides:

  * `enable_nan_checks()` — flips `jax_debug_nans` so any NaN produced
    under jit raises at the producing op (CI hook)
  * `checked(fn)` — wraps a function with `checkify` so NaN/OOB errors in
    compiled code surface as Python exceptions with location info
  * `assert_finite_tree(tree)` — host-side guard for checkpoints/metrics
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np


def enable_nan_checks(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


def checked(fn: Callable) -> Callable:
    """checkify-wrapped callable: raises ValueError on NaN / div-by-zero /
    OOB indexing inside compiled code."""
    from jax.experimental import checkify

    cfn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks
    )

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite_tree(tree: Any, what: str = "tree") -> None:
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            name = jax.tree_util.keystr(path)
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{what}{name}: {bad}/{arr.size} non-finite values"
            )
