"""topk_exact must be indistinguishable from jax.lax.top_k (values AND
index tie order) across shapes that hit both the chunked path and the
fallbacks. The chunked lowering is a TPU perf detail (BASELINE.md:
85.1 -> 30.9 ms at [512, 100k] k=160); semantics are the contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesvlm_tpu.ops import topk_exact


def _check(x, k):
    v0, i0 = jax.lax.top_k(x, k)
    v1, i1 = topk_exact(x, k)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


@pytest.mark.parametrize("n,k", [
    (100, 5),          # fallback (too narrow to chunk)
    (5000, 7),         # chunked, k small
    (40_000, 160),     # chunked at kNN-like scale
    (33_333, 33),      # non-divisible -> -inf padding
    (513, 513),        # k == n fallback
])
def test_matches_lax_topk_2d(n, k):
    rng = np.random.default_rng(0)
    _check(jnp.asarray(rng.normal(size=(7, n)), jnp.float32), k)


def test_matches_lax_topk_1d():
    rng = np.random.default_rng(1)
    _check(jnp.asarray(rng.normal(size=(30_000,)), jnp.float32), 50)


def test_tie_order_matches():
    # coarse integer-valued floats force many ties; stable-by-index
    # order must match lax.top_k exactly
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 5, size=(5, 20_000)), jnp.float32)
    _check(x, 64)


def test_neg_inf_rows_match():
    # rows containing real -inf entries: padded -inf must never displace
    # a real index
    rng = np.random.default_rng(3)
    x = np.asarray(rng.normal(size=(3, 10_000)), np.float32)
    x[:, ::3] = -np.inf
    _check(jnp.asarray(x), 40)


def test_fewer_than_k_finite_entries():
    # pathological rows with < k entries above -inf (including none):
    # the chunked path's -inf pad lanes must never surface as indices
    # >= n, and tie order among real -inf lanes must match lax.top_k
    for n, k in [(4095, 4), (4097, 4), (100_001, 160), (8191, 3)]:
        x = np.full((3, n), -np.inf, np.float32)
        x[0, n // 2] = 1.0            # one finite entry
        x[1, -1] = 2.0                # finite entry in the padded chunk
        # row 2: all -inf
        _check(jnp.asarray(x), k)
        _, ids = topk_exact(jnp.asarray(x), k)
        assert (np.asarray(ids) < n).all()


def test_int_dtype_falls_back():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(0, 1000, size=(4, 20_000)), jnp.int32)
    _check(x, 16)


def test_degenerate_shapes():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 20_000)), jnp.float32)
    _check(x, 1)          # single row, k=1 (chunked path)
    _check(x[0], 1)       # 1-D
    _check(x, 0)          # k=0 returns empty


def test_jittable():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 20_000)), jnp.float32)
    v, i = jax.jit(lambda a: topk_exact(a, 32))(x)
    v0, i0 = jax.lax.top_k(x, 32)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i))
