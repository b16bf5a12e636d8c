"""Profiling utility tests."""

import jax.numpy as jnp

from fdtpu.utils.profiling import WallClock


def test_wallclock_sections():
    wc = WallClock()
    with wc.section("matmul"):
        a = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    wc.time_fn("matmul", lambda: jnp.ones((32, 32)) @ jnp.ones((32, 32)))
    s = wc.summary()
    assert s["matmul"]["count"] == 2
    assert s["matmul"]["total_s"] > 0
    wc.reset()
    assert wc.summary() == {}
