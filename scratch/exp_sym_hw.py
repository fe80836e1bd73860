"""Hardware experiment: symmetric (upper-triangle) matvec vs dense matvec.

The Hilbert matrix is symmetric and the matvec-form solver multiplies by
the ORIGINAL A every round (solver_matvec.py), so reading only the upper
triangle halves HBM traffic per round.  This measures the marginal cost
of the triangle kernel on the real chip in two formulations:

* "vpu": row term as broadcast-multiply + lane reduce (sublane-layout
  partials), transpose term as sublane reduce (lane-layout partials).
* "dot": both terms as MXU dot_general at Precision.HIGHEST, everything
  in lane space (single accumulator).

Run (real TPU): timeout 900 python scratch/exp_sym_hw.py [dims...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from eigen_value_tpu import fixtures  # noqa: E402
from eigen_value_tpu.ops.pallas import kernels  # noqa: E402
from eigen_value_tpu.utils.timing import time_marginal  # noqa: E402
from eigen_value_tpu.device import matvec_blocks  # noqa: E402


def _sym_kernel_vpu(ti_ref, tj_ref, x_in, a_ref, y_out, ycol_s, yrow_s, xcol_s):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    bt = a_ref.shape[0]
    i, j = ti_ref[t], tj_ref[t]

    @pl.when(t == 0)
    def _():
        ycol_s[...] = jnp.zeros_like(ycol_s)
        yrow_s[...] = jnp.zeros_like(yrow_s)
        xcol_s[...] = jnp.transpose(x_in[...])

    tile = a_ref[...]
    part_i = jnp.sum(tile * x_in[:, pl.ds(j * bt, bt)], axis=1, keepdims=True)
    ycol_s[pl.ds(i * bt, bt), :] += part_i

    @pl.when(i != j)
    def _():
        part_j = jnp.sum(
            tile * xcol_s[pl.ds(i * bt, bt), :], axis=0, keepdims=True
        )
        yrow_s[:, pl.ds(j * bt, bt)] += part_j

    @pl.when(t == T - 1)
    def _():
        y_out[...] = jnp.transpose(ycol_s[...]) + yrow_s[...]


def _sym_kernel_dot(ti_ref, tj_ref, x_in, a_ref, y_out, yrow_s):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    bt = a_ref.shape[0]
    i, j = ti_ref[t], tj_ref[t]

    @pl.when(t == 0)
    def _():
        yrow_s[...] = jnp.zeros_like(yrow_s)

    tile = a_ref[...]
    x_j = x_in[:, pl.ds(j * bt, bt)]
    part_i = jax.lax.dot_general(
        x_j, tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    yrow_s[:, pl.ds(i * bt, bt)] += part_i

    @pl.when(i != j)
    def _():
        x_i = x_in[:, pl.ds(i * bt, bt)]
        part_j = jax.lax.dot_general(
            x_i, tile, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        yrow_s[:, pl.ds(j * bt, bt)] += part_j

    @pl.when(t == T - 1)
    def _():
        y_out[...] = yrow_s[...]


@functools.partial(jax.jit, static_argnames=("tile", "form", "interpret"))
def sym_matvec(A, x, *, tile=512, form="vpu", interpret=False):
    n = A.shape[0]
    assert n % tile == 0 and tile % 128 == 0
    g = n // tile
    tri = [(i, j) for i in range(g) for j in range(i, g)]
    ti = jnp.asarray([i for i, _ in tri], jnp.int32)
    tj = jnp.asarray([j for _, j in tri], jnp.int32)
    scratch = [pltpu.VMEM((1, n), jnp.float32)]
    kern = _sym_kernel_dot
    if form == "vpu":
        kern = _sym_kernel_vpu
        scratch = [
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
        ]
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
        scratch_shapes=scratch,
    )
    y = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n,
            bytes_accessed=n * n * 2,  # ~half of the dense pass
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # the vpu form's (n,1) column scratches are lane-padded to
            # (n,128): n*128*4 B each — budget them explicitly
            vmem_limit_bytes=5 * tile * tile * 4 // 2
            + (3 * n * 128 * 4 if form == "vpu" else 0)
            + (4 << 20),
        ),
        interpret=interpret,
    )(ti, tj, x[None, :], A)
    return y[0]


def main():
    dims = [int(a) for a in sys.argv[1:]] or [8192]
    for n in dims:
        print(f"== n={n} ==", flush=True)
        A = fixtures.hilbert_matrix(n)
        x = jnp.sum(A, axis=1)  # a realistic well-scaled vector

        # correctness vs the dense kernel first
        mb = matvec_blocks(n) or (min(512, n), min(512, n))
        y_ref = kernels.matvec(A, x, block_rows=mb[0], block_cols=mb[1])
        for form in ("vpu", "dot"):
            for tile in (256, 512, 1024):
                if n % tile:
                    continue
                t0 = time.perf_counter()
                y = sym_matvec(A, x, tile=tile, form=form)
                rel = float(
                    jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref))
                )
                dt = time.perf_counter() - t0
                assert rel < 1e-5, (form, tile, rel)
                print(f"  {form} tile={tile}: rel err {rel:.2e} "
                      f"(compile+run {dt:.1f}s)", flush=True)

        # marginals, interleaved dense/sym
        def dense_step(i, s):
            Ai, xi = s
            return (Ai, kernels.matvec(Ai, xi, block_rows=mb[0],
                                       block_cols=mb[1]) / xi)

        steps = {"dense": dense_step}
        for form in ("vpu", "dot"):
            for tile in (256, 512, 1024):
                if n % tile:
                    continue
                def sym_step(i, s, _t=tile, _f=form):
                    Ai, xi = s
                    return (Ai, sym_matvec(Ai, xi, tile=_t, form=_f) / xi)
                steps[f"sym_{form}_{tile}"] = sym_step

        k = 64
        for name, step in steps.items():
            ms = time_marginal(step, (A, x), k=k, reps=5)
            frac = 0.5 + 0.5 / (n // (int(name.split("_")[-1])
                                if name.startswith("sym") else n))
            gbs = (n * n * 4 * (frac if name.startswith("sym") else 1.0)
                   ) / ms / 1e6
            print(f"  {name}: {ms*1e3:.1f} us/pass  (~{gbs:.0f} GB/s "
                  f"effective)", flush=True)


if __name__ == "__main__":
    main()
