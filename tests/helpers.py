"""Shared test helpers."""

import jax
import numpy as np


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def assert_trees_equal(a, b, rtol=0.0, atol=0.0):
    """Structure-checked tree equality (zip() would silently truncate)."""
    ta = jax.tree_util.tree_structure(a)
    tb = jax.tree_util.tree_structure(b)
    assert ta == tb, f"tree structures differ:\n{ta}\nvs\n{tb}"
    def cmp(x, y):
        if rtol == 0.0 and atol == 0.0:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        else:
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=rtol, atol=atol)
        return None
    jax.tree_util.tree_map(cmp, a, b)
