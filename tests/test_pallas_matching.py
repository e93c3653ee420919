"""Pallas fused Hamming best-2 kernel vs the jnp reference path.

Runs in interpret mode on CPU (the driver benches the compiled kernel on
the real chip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.ops import matching
from orb_slam3_detailed_comments_kor_tpu.ops import pallas_matching as pm


def _rand_bits(key, n):
    return (jax.random.uniform(key, (n, 256)) > 0.5).astype(jnp.float32)


@pytest.mark.parametrize("n,m", [(128, 128), (200, 300), (513, 130)])
def test_matches_reference(n, m):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    a = _rand_bits(k1, n)
    b = _rand_bits(k2, m)
    mask = jax.random.uniform(k3, (n, m)) > 0.3
    idx, best, second = pm.fused_masked_best2(a, b, mask, interpret=True)
    d_ref = matching.hamming_matrix(a, b)
    idx_r, best_r, second_r = matching.masked_best2(d_ref, mask)
    has = np.asarray(mask.any(axis=1))
    np.testing.assert_array_equal(
        np.asarray(best)[has], np.asarray(best_r)[has]
    )
    np.testing.assert_array_equal(
        np.asarray(second)[has], np.asarray(second_r)[has]
    )
    # argmin may differ only between equal-distance columns
    d_np = np.asarray(d_ref)
    ii = np.arange(n)[has]
    np.testing.assert_array_equal(
        d_np[ii, np.asarray(idx)[has]], np.asarray(best_r)[has]
    )


def test_empty_rows_flagged():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    a = _rand_bits(k1, 64)
    b = _rand_bits(k2, 64)
    mask = jnp.zeros((64, 64), bool).at[3].set(True)
    idx, best, second = pm.fused_masked_best2(a, b, mask, interpret=True)
    assert float(best[0]) >= 1e8  # no candidates → BIG
    assert float(best[3]) <= 256.0
