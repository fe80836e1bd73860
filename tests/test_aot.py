"""Persistent compilation cache (the reference's AOT-target analog)."""

import os

import jax
import jax.numpy as jnp

from eigen_value_tpu.utils import aot


def test_persistent_cache_writes_entries(tmp_path):
    path = str(tmp_path / "xla-cache")
    try:
        assert aot.enable_persistent_cache(path) == path
        from eigen_value_tpu.ops.solver_matvec import solve_matvec

        res = jax.jit(lambda A: solve_matvec(A, eps=1e-3, max_itr=1000))(
            jnp.full((64, 64), 0.5, jnp.float32)
        )
        jax.block_until_ready(res)
        entries = os.listdir(path)
        assert entries, "no cache entries written"
    finally:
        aot.disable_persistent_cache()
