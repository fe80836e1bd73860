"""Experiment: symmetric (upper-triangle-streamed) matvec via scalar-prefetch.

Question: can a Pallas kernel read ONLY the upper-triangle tiles of a
symmetric A (halving HBM traffic) and still produce y = A @ x exactly-ish
(different f32 reduction order)?  Each off-diagonal tile (i, j), i < j,
contributes twice:

    y[i_blk] += T       @ x[j_blk]        (rows i of A)
    y[j_blk] += T^T     @ x[i_blk]        (rows j of A, by symmetry)

Diagonal tiles contribute the standard row term only.  Tile order is
enumerated by scalar-prefetch index arrays (ti, tj) so the grid has
exactly g(g+1)/2 steps per pass — no wasted iterations, no masked DMA.

Run: JAX_PLATFORMS=cpu python scratch/exp_sym_kernel.py
"""

import functools
import sys

sys.path.insert(0, "/root/repo")
from eigen_value_tpu import device as _device  # noqa: E402

_device.unregister_remote_tpu_plugin()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sym_matvec_kernel(ti_ref, tj_ref, x_in, a_ref, y_out, ycol_s, yrow_s, xcol_s):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    n = x_in.shape[1]
    bt = a_ref.shape[0]
    i, j = ti_ref[t], tj_ref[t]

    @pl.when(t == 0)
    def _():
        ycol_s[...] = jnp.zeros_like(ycol_s)
        yrow_s[...] = jnp.zeros_like(yrow_s)
        xcol_s[...] = jnp.transpose(x_in[...])

    tile = a_ref[...]
    # row term: rows i_blk of A are the tile's rows
    part_i = jnp.sum(tile * x_in[:, pl.ds(j * bt, bt)], axis=1, keepdims=True)
    ycol_s[pl.ds(i * bt, bt), :] += part_i

    # transpose term: rows j_blk of A are the tile's COLUMNS (symmetry)
    @pl.when(i != j)
    def _():
        part_j = jnp.sum(
            tile * xcol_s[pl.ds(i * bt, bt), :], axis=0, keepdims=True
        )
        yrow_s[:, pl.ds(j * bt, bt)] += part_j

    @pl.when(t == T - 1)
    def _():
        y_out[...] = jnp.transpose(ycol_s[...]) + yrow_s[...]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def sym_matvec(A, x, *, tile=256, interpret=True):
    n = A.shape[0]
    assert n % tile == 0
    g = n // tile
    tri = [(i, j) for i in range(g) for j in range(i, g)]
    ti = jnp.asarray([i for i, _ in tri], jnp.int32)
    tj = jnp.asarray([j for _, j in tri], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(tri),),
        in_specs=[
            pl.BlockSpec((1, n), lambda t, ti, tj: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile, tile), lambda t, ti, tj: (ti[t], tj[t]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n), lambda t, ti, tj: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((n, 1), A.dtype),
            pltpu.VMEM((1, n), A.dtype),
            pltpu.VMEM((n, 1), A.dtype),
        ],
    )
    y = pl.pallas_call(
        _sym_matvec_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n), A.dtype),
        interpret=interpret,
    )(ti, tj, x[None, :], A)
    return y[0]


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    for n, tile in [(512, 256), (1024, 256), (768, 128)]:
        M = rng.random((n, n)).astype(np.float32)
        A = jnp.asarray(M @ M.T + n * np.eye(n, dtype=np.float32))
        x = jnp.asarray(rng.random(n).astype(np.float32))
        y_ref = A @ x
        y = sym_matvec(A, x, tile=tile)
        rel = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
        print(f"n={n} tile={tile}: max rel err {rel:.3e}")
        assert rel < 1e-5, rel
    print("OK")
