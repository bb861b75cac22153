"""Pallas sorted-segment-sum vs jax.ops.segment_sum (interpret mode off-TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scaling_rgcn_training_tpu.ops.segment_kernels import (
    plan_segmented_reduce, sorted_segment_sum_pallas)


@pytest.fixture(autouse=True)
def interpret_mode():
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


@pytest.mark.parametrize("e,m,s,chunk", [
    (1000, 300, 64, 128),
    (512, 1024, 128, 128),   # more segments than edges (sparse)
    (2048, 100, 32, 256),    # hub-heavy
])
def test_sorted_segment_sum(e, m, s, chunk):
    rng = np.random.default_rng(e + m)
    keys = np.sort(rng.integers(0, m, e).astype(np.int32))
    vals = rng.standard_normal((e, 16)).astype(np.float32)
    plan = plan_segmented_reduce(keys, m, bucket_rows=s, chunk=chunk)
    out = sorted_segment_sum_pallas(jnp.asarray(vals), jnp.asarray(keys), plan)
    ref = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(keys), num_segments=m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_empty_and_full_segments():
    # all edges in one segment + many empty segments
    e, m = 700, 256
    keys = np.full(e, 100, np.int32)
    vals = np.ones((e, 8), np.float32)
    plan = plan_segmented_reduce(keys, m, bucket_rows=64, chunk=128)
    out = np.asarray(sorted_segment_sum_pallas(jnp.asarray(vals), jnp.asarray(keys), plan))
    assert out[100, 0] == e
    assert np.all(np.delete(out, 100, axis=0) == 0)
