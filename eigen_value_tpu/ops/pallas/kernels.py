"""Pallas TPU kernels for the two O(n²) passes of the round body.

TPU-native re-design of the reference's SYCL kernel pipeline
(similarity_transform.cpp): the reference's 3-level reduction hierarchy
(subgroup collectives → workgroup local-memory atomics → device atomics,
SURVEY.md §2) maps to Pallas tiling — a grid over (row-block, col-block)
tiles with a VMEM accumulator revisited across the column blocks of a row
block.  No atomics: the grid is executed sequentially per core, so the
accumulation is a plain read-modify-write of the output block, and XLA/
Mosaic pipelines the HBM↔VMEM DMAs behind compute.

The kernel set is an "optimization ladder" mirroring the reference's
benchmark variants (benchmarks/benchmark_similarity_transform.cpp) —
production kernels first, measured-negative rungs retained for the
record (docs/BENCH_RESULTS.md):

* :func:`matvec` — ``A @ x`` (PRODUCTION hot op): the matvec-form solver
  reads A once per round; ≈ HBM roofline.
* :func:`rowsum` — row-sum reduction (reference ``sum_across_rows``,
  similarity_transform.cpp:77-152).  Used for the pre-loop pass of the
  iterated form.
* :func:`scale` — similarity update ``A[r][c] *= (1/v[r]) * v[c]``
  (reference ``compute_next_matrix``, similarity_transform.cpp:286-330).
  Kept standalone for per-kernel benchmark parity.
* :func:`scale_rowsum` — the iterated form's fused kernel: round-k
  similarity update + round-(k+1)'s row sums in one pass (1 read + 1
  write of A; SURVEY.md §7 "the big opportunity"); in-place via
  input/output aliasing.
* :func:`stop` — a real Pallas wraparound stop check (bench-only: the
  production stop is the XLA expression fused into the loop predicate).
* :func:`round_matvec` / :func:`round_fused` — fused-round ladder rungs,
  both MEASURED SLOWER than the production split (rounds 2 and 1
  respectively); retained bit-exact for re-testing on future compilers.

The O(n) ops of the reference (find_max cpp:154-227, eigvec update
cpp:229-265, stop cpp:332-460) are deliberately NOT Pallas in the
production path: XLA fuses them into negligible work between the n²
passes — confirmed twice by the fused-rung negatives above.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Measured per-term cost of the MXU dot_general matvec relative to the
# VPU broadcast-multiply form, f32 HIGHEST, 512² tiles on v5e (scratch/
# exp_mxu_cached.py: all-104-cached-tiles-on-MXU 4.17-4.24 ms vs
# all-on-VPU 1.14-1.37 ms at the same traffic).  Sets the default MXU
# share of the "mixed" formulation at the unit-balance point.
MXU_TERM_COST = 3.5


def _rowsum_kernel(a_ref, out_ref):
    part = jnp.sum(a_ref[...], axis=1, keepdims=True)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = part

    @pl.when(pl.program_id(1) != 0)
    def _():
        out_ref[...] += part


@functools.partial(jax.jit, static_argnames=("block_rows", "block_cols", "interpret"))
def rowsum(
    A: jax.Array,
    *,
    block_rows: int = 256,
    block_cols: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Row sums of A via a tiled Pallas reduction. Returns shape (n,)."""
    n = A.shape[0]
    br, bc = min(block_rows, n), min(block_cols, n)
    assert n % br == 0 and n % bc == 0, (n, br, bc)

    out = pl.pallas_call(
        _rowsum_kernel,
        grid=(n // br, n // bc),
        in_specs=[
            pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), A.dtype),
        cost_estimate=pl.CostEstimate(
            flops=n * n, bytes_accessed=n * n * A.dtype.itemsize, transcendentals=0
        ),
        interpret=interpret,
    )(A)
    return out[:, 0]


def _stop_kernel(eps_ref, bnd_ref, cur_ref, out_ref):
    cur = cur_ref[...]
    R, L = cur.shape
    # row-major 2D view of v: element (r, c) is v[r·L + c], so each lane's
    # neighbor is the next lane; the last lane's neighbor is the NEXT row's
    # lane 0; the block's very last element's neighbor is the next block's
    # first element (prefetched into the tiny bnd side array — wrapping at
    # the grid edge gives the reference's wraparound pair,
    # similarity_transform.cpp:413-417)
    within = pltpu.roll(cur, shift=L - 1, axis=1)  # left-rotate lanes by 1
    first_col = cur[:, :1]
    next_row_first = pltpu.roll(first_col, shift=R - 1, axis=0)  # up by 1
    row = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    boundary = bnd_ref[0, pl.program_id(0)]
    next_row_first = jnp.where(row == R - 1, boundary, next_row_first)
    shifted = jnp.where(lane == L - 1, next_row_first, within)
    ok = jnp.all(jnp.abs(cur - shifted) < eps_ref[0, 0])

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = ok.astype(jnp.int32)

    @pl.when(pl.program_id(0) != 0)
    def _():
        out_ref[0, 0] = out_ref[0, 0] * ok.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("lanes", "block_rows", "interpret"))
def stop(
    v: jax.Array,
    eps,
    *,
    lanes: int = 1024,
    block_rows: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Single-pass Pallas stop criterion: all |v[i] - v[(i+1) % n]| < eps.

    The reference's trickiest kernel (subgroup shuffle_down + boundary
    global read + two-level atomic fetch_min, similarity_transform.cpp:
    332-460).  v is viewed as a row-major (n/lanes, lanes) matrix so blocks
    are hardware-shaped (R, L) tiles; neighbor values come from an in-block
    lane roll + an up-roll of lane 0, and each block's trailing boundary
    from a precomputed g-element side array in SMEM.  One read of v, flag
    min-accumulated across grid steps — no rotated copy (the jnp slice
    formulation pays a relayout pass).

    Requires n divisible by lanes·block_rows (or small enough to fall back
    to a single (1, n) tile).
    """
    n = v.shape[0]
    eps_arr = jnp.asarray(eps, v.dtype).reshape(1, 1)
    L = lanes if n % lanes == 0 and n >= lanes else n
    rows = n // L
    # Largest block-row count ≤ block_rows that divides rows (rows need
    # not be a power of two — e.g. n = 1024·768 gives rows = 768, where
    # min(block_rows, rows) = 512 is not a divisor; shrink to 256).
    R = next(b for b in range(min(block_rows, rows), 0, -1) if rows % b == 0)
    g = rows // R
    v2 = v.reshape(rows, L)
    # bnd[i] = first element of block i+1 (wrapping): v[((i+1)·R·L) % n]
    bnd = jnp.roll(v[:: R * L], -1).reshape(1, g)

    out = pl.pallas_call(
        _stop_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((R, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n, bytes_accessed=n * v.dtype.itemsize, transcendentals=0
        ),
        interpret=interpret,
    )(eps_arr, bnd, v2)
    return out[0, 0] == 1


def _scale_kernel(a_ref, ivr_ref, vc_ref, out_ref):
    # right-associated like the reference (cpp:324-325) and the jnp path:
    # A * ((1/v[r]) * v[c]) — keeps the two backends bit-identical
    out_ref[...] = a_ref[...] * (ivr_ref[...] * vc_ref[...])


@functools.partial(jax.jit, static_argnames=("block_rows", "block_cols", "interpret"))
def scale(
    A: jax.Array,
    v: jax.Array,
    *,
    block_rows: int = 256,
    block_cols: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Similarity update ``A' = D⁻¹ A D``, D = diag(v), elementwise in-place.

    Same reciprocal-then-multiply arithmetic as the reference kernel
    (similarity_transform.cpp:324-325): ``A[r][c] * (1/v[r]) * v[c]``.
    """
    n = A.shape[0]
    br, bc = min(block_rows, n), min(block_cols, n)
    assert n % br == 0 and n % bc == 0, (n, br, bc)
    inv_v = (jnp.asarray(1.0, A.dtype) / v)[:, None]  # (n, 1) row scaling
    v_row = v[None, :]  # (1, n) column scaling

    return pl.pallas_call(
        _scale_kernel,
        grid=(n // br, n // bc),
        in_specs=[
            pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), A.dtype),
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n,
            bytes_accessed=2 * n * n * A.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, inv_v, v_row)


def _matvec_kernel(a_ref, x_ref, y_ref):
    part = jnp.sum(a_ref[...] * x_ref[...], axis=1, keepdims=True)

    @pl.when(pl.program_id(1) == 0)
    def _():
        y_ref[...] = part

    @pl.when(pl.program_id(1) != 0)
    def _():
        y_ref[...] += part


@functools.partial(jax.jit, static_argnames=("block_rows", "block_cols", "interpret"))
def matvec(
    A: jax.Array,
    x: jax.Array,
    *,
    block_rows: int = 512,
    block_cols: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``A @ x`` as a tiled Pallas kernel — the hot op of the matvec-form
    solver (see solver_matvec.py).  Purely memory-bound: one read of A per
    call; measured ≈ HBM roofline on v5e (vs ~550 GB/s for XLA's gemv).

    VPU formulation (broadcast-multiply + row reduction) — the MXU is no
    faster here because a gemv is bandwidth-bound, and this avoids MXU
    tiling constraints on the x operand.
    """
    n, m = A.shape
    br, bc = min(block_rows, n), min(block_cols, m)
    assert n % br == 0 and m % bc == 0, (n, m, br, bc)

    y = pl.pallas_call(
        _matvec_kernel,
        grid=(n // br, m // bc),
        in_specs=[
            pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), A.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m, bytes_accessed=n * m * A.dtype.itemsize, transcendentals=0
        ),
        interpret=interpret,
    )(A, x[None, :])
    return y[:, 0]


def _scale_rowsum_kernel(a_ref, ivr_ref, vc_ref, a_out_ref, v_out_ref):
    scaled = a_ref[...] * (ivr_ref[...] * vc_ref[...])
    a_out_ref[...] = scaled
    part = jnp.sum(scaled, axis=1, keepdims=True)

    @pl.when(pl.program_id(1) == 0)
    def _():
        v_out_ref[...] = part

    @pl.when(pl.program_id(1) != 0)
    def _():
        v_out_ref[...] += part


@functools.partial(jax.jit, static_argnames=("block_rows", "block_cols", "interpret"))
def scale_rowsum(
    A: jax.Array,
    v: jax.Array,
    *,
    block_rows: int = 256,
    block_cols: int = 512,
    interpret: bool = False,
):
    """Fused similarity update + next row sums: one read + one write of A.

    Returns ``(A', v')`` with ``A'[r][c] = A[r][c] * (1/v[r]) * v[c]`` and
    ``v'[r] = Σ_c A'[r][c]``.  The column-block grid axis is innermost, so
    the (br, 1) row-sum accumulator block stays resident in VMEM across the
    column sweep of each row block (SURVEY.md §7 "hard parts").
    """
    n = A.shape[0]
    br, bc = min(block_rows, n), min(block_cols, n)
    assert n % br == 0 and n % bc == 0, (n, br, bc)
    inv_v = (jnp.asarray(1.0, A.dtype) / v)[:, None]
    v_row = v[None, :]

    A_out, v_out = pl.pallas_call(
        _scale_rowsum_kernel,
        grid=(n // br, n // bc),
        in_specs=[
            pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, n), A.dtype),
            jax.ShapeDtypeStruct((n, 1), A.dtype),
        ),
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=3 * n * n,
            bytes_accessed=2 * n * n * A.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, inv_v, v_row)
    return A_out, v_out[:, 0]


def _round_matvec_kernel(
    a_ref,
    evrow_ref,
    vrow_ref,
    evcol_ref,
    vcol_ref,
    m_ref,
    vnext_ref,
    evnew_ref,
):
    i, j = pl.program_id(0), pl.program_id(1)
    m = m_ref[0, 0]
    evs_c = evrow_ref[...] * (vrow_ref[...] / m)  # (1, bc): updated ev chunk

    @pl.when(i == 0)
    def _():
        evnew_ref[...] = evs_c

    part = jnp.sum(a_ref[...] * evs_c, axis=1, keepdims=True)  # (br, 1)

    @pl.when(j == 0)
    def _():
        vnext_ref[...] = part

    @pl.when(j != 0)
    def _():
        vnext_ref[...] += part

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        evs_r = evcol_ref[...] * (vcol_ref[...] / m)  # (br, 1)
        vnext_ref[...] = vnext_ref[...] / evs_r


@functools.partial(
    jax.jit, static_argnames=("block_rows", "block_cols", "interpret")
)
def round_matvec(
    A: jax.Array,
    ev: jax.Array,
    v: jax.Array,
    m: jax.Array,
    *,
    block_rows: int = 512,
    block_cols: int = 512,
    interpret: bool = False,
):
    """One matvec-form round MINUS the reductions: given the previous
    round's ``v`` and its (XLA-computed) max ``m``, fuses the eigenvector
    update, the O(n²) matvec, and the division into ONE kernel —
    ``ev_new = ev · v/m``; ``v_next = (A @ ev_new) / ev_new`` — returning
    ``(v_next, ev_new)``.

    Design lesson from :func:`round_fused` (measured slower): the max /
    stop / λ SCALAR reductions ran serially at grid step (0,0) and stalled
    the DMA pipeline.  Here they stay in XLA between kernel calls (they
    reduce the O(n) ``v``, not the O(n²) pass) and every grid step does
    only elementwise VPU work alongside its tile's DMA — the kernel keeps
    the plain matvec's pipeline while absorbing the two O(n) elementwise
    ops the loop body otherwise pays as separate fusions.

    Arithmetic is expression-for-expression identical to the unfused path
    (solver_matvec.py round body + :func:`matvec`'s tiling), so the float32
    v-sequence — and therefore the round count — is bit-identical.
    """
    n, ncols = A.shape
    br, bc = min(block_rows, n), min(block_cols, ncols)
    assert n % br == 0 and ncols % bc == 0, (n, ncols, br, bc)

    m_arr = jnp.asarray(m, A.dtype).reshape(1, 1)
    vnext, evnew = pl.pallas_call(
        _round_matvec_kernel,
        grid=(n // br, ncols // bc),
        in_specs=[
            pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), A.dtype),
            jax.ShapeDtypeStruct((1, ncols), A.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ncols,
            bytes_accessed=n * ncols * A.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, ev[None, :], v[None, :], ev[:, None], v[:, None], m_arr)
    return vnext[:, 0], evnew[0, :]


def _round_prologue(
    r, n, raw_fn, budget_in,
    ev_s, vrow_s, done_s, adv_s, lam_s,
    *, eps, init, eps_mode,
):
    """The once-per-round prologue SHARED by both multiround kernels:
    finish the previous round's division (``raw_fn`` supplies the
    formulation-specific merged raw row sums in lane space), then the
    production loop's COND + body-head — stop check on v, λ snapshot,
    max, eigenvector update.  Expressions match
    solver_matvec._make_cond_body / solver.stop_check bit-for-bit (the
    roll pairs element j with v[(j+1) % n], the reference wraparound).
    ONE definition so the bit-exact chunking contract cannot silently
    diverge between the dense and symmetric kernels (review r5c: the
    two hand-kept copies were identical only by eye)."""
    active = done_s[0] == 0

    @pl.when((r != 0) & active)
    def _():
        vrow_s[...] = raw_fn() / ev_s[...]

    # init chunks compute v₀ at r == 0 with no check and no update
    # (the pre-loop row-sum pass, solver_matvec._init_carry)
    check = (active & (r != 0)) if init else active
    v = vrow_s[...]
    e = jnp.asarray(eps, v.dtype)
    if eps_mode == "relative":
        e = e * jnp.max(jnp.abs(v))
    nbr = pltpu.roll(v, shift=n - 1, axis=1)
    fired = jnp.all(jnp.abs(v - nbr) < e)
    halt = fired | (adv_s[0] >= budget_in[0, 0])

    @pl.when(check & halt)
    def _():
        done_s[0] = 1

    @pl.when(check & jnp.logical_not(halt))
    def _():
        lam_s[0] = v[0, 0]
        m = jnp.max(v)
        ev_s[...] = ev_s[...] * (v / m)
        adv_s[0] = adv_s[0] + 1


def _multiround_kernel(
    ev_in,
    v_in,
    lam_in,
    budget_in,
    a_ref,
    ev_out,
    v_out,
    adv_out,
    lam_out,
    ev_s,
    vrow_s,
    vraw_s,
    done_s,
    adv_s,
    lam_s,
    *,
    eps,
    init,
    eps_mode,
    formulation,
):
    r = pl.program_id(0)  # round within the chunk (outermost)
    i = pl.program_id(1)  # row block
    k, g = pl.num_programs(0), pl.num_programs(1)
    n = ev_s.shape[1]
    br = a_ref.shape[0]

    def _merged_raw():
        # vpu: raw row sums accumulated in column layout; one XLU
        # transpose per round brings them to lane space
        return (
            vraw_s[...]
            if formulation == "dot"
            else jnp.transpose(vraw_s[...])
        )

    @pl.when((r == 0) & (i == 0))
    def _():
        ev_s[...] = ev_in[...]
        vrow_s[...] = v_in[...]
        done_s[0] = 0
        adv_s[0] = 0
        lam_s[0] = lam_in[0, 0]

    @pl.when(i == 0)
    def _():
        _round_prologue(
            r, n, _merged_raw, budget_in,
            ev_s, vrow_s, done_s, adv_s, lam_s,
            eps=eps, init=init, eps_mode=eps_mode,
        )

    # The matvec: row block i of (A @ ev), written into the raw-v scratch.
    # Runs UNCONDITIONALLY — frozen rounds recompute vraw from the frozen
    # ev (bit-identical values, discarded at output; their block DMAs
    # stream regardless, and a per-step done guard would put an SMEM
    # load + branch on the hot path of every grid step).
    # Formulations: "dot" contracts on the MXU and lands the partial
    # directly in lane space (1, br); "vpu" uses the production matvec
    # kernel's broadcast-multiply + lane reduction (identical f32
    # reduction order ⇒ bit-identical v-sequence), landing in sublane
    # space (br, 1) — transposed once per round in the prologue.
    if formulation == "dot":
        part = jax.lax.dot_general(
            ev_s[...],
            a_ref[...].astype(ev_s.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        vraw_s[:, pl.ds(i * br, br)] = part.astype(vraw_s.dtype)
    else:
        # reduced-precision STORAGE keeps full-precision products: bf16
        # values are exactly representable in f32, so cast-then-multiply
        # loses nothing (tighter than bf16×bf16 product rounding)
        part = jnp.sum(
            a_ref[...].astype(ev_s.dtype) * ev_s[...], axis=1, keepdims=True
        )
        vraw_s[pl.ds(i * br, br), :] = part

    @pl.when((r == k - 1) & (i == g - 1))
    def _():
        d = done_s[0] == 1
        ev_out[...] = ev_s[...]
        # an advanced final round leaves its division to us; a frozen one
        # already holds the stop-checked v in vrow_s
        v_out[...] = jnp.where(d, vrow_s[...], _merged_raw() / ev_s[...])
        adv_out[0, 0] = adv_s[0]
        lam_out[0, 0] = lam_s[0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "init", "eps", "eps_mode", "block_rows", "interpret",
        "formulation",
    ),
)
def multiround(
    A: jax.Array,
    ev: jax.Array,
    v: jax.Array,
    lam: jax.Array,
    budget: jax.Array,
    *,
    chunk: int,
    eps: float,
    init: bool = False,
    eps_mode: str = "absolute",
    block_rows: int = 256,
    interpret: bool = False,
    formulation: str = "vpu",
):
    """Up to ``chunk`` matvec-form rounds in ONE Pallas invocation.

    The round-3 rung of the optimization ladder (VERDICT r2 item 1): the
    measured ~50 µs/round gap between the in-loop and standalone matvec
    is per-invocation pipeline restart, which no single-round kernel can
    recover — so the grid grows a ROUND axis (outermost), with the O(n)
    state (ev, v, raw row sums) carried across rounds in VMEM scratch
    (3·n·4B = 96 KB at 8192²) and the per-round O(n) glue (stop, max,
    eigenvector update, λ snapshot) computed in a once-per-round prologue
    at row-block 0.

    Semantics are the production loop's, chunked bit-exactly: each round
    checks the stop BEFORE advancing (reference break-before-update,
    similarity_transform.cpp:39-54) and the kernel FREEZES at the
    converging round — remaining grid steps stream their A blocks but
    compute nothing — so ``(ev, v, λ, rounds_advanced)`` after any chunk
    split equals the unchunked sequence (the checkpoint.step chunking
    argument).  ``init=True`` makes round 0 the pre-loop row-sum pass
    (no stop check, not counted).

    Returns ``(ev', v', advanced, λ')``; the caller loops chunks until
    its own stop/cap check fires (solver_matvec.solve_multiround).

    The matvec runs one full-width row stripe per (round, row-block)
    grid step, in the configured ``formulation``: the default "vpu"
    (broadcast-multiply + lane-tree reduce) reproduces :func:`matvec`'s
    reduction order exactly — the v-sequence is BIT-IDENTICAL to the
    production loop's — while "dot" (MXU ``dot_general`` at
    ``Precision.HIGHEST``) is a different f32 reduction order whose
    v-sequence differs in ulps (round-count parity asserted by tests at
    every benchmark dim either way).
    """
    n, ncols = A.shape
    assert n == ncols, (n, ncols)
    assert formulation in ("dot", "vpu"), formulation
    if eps_mode not in ("absolute", "relative"):
        raise ValueError(f"unknown eps_mode {eps_mode!r}")
    # Largest row-stripe ≤ block_rows that divides n and meets the store
    # alignment: "vpu" writes (br, 1) partials at sublane offsets (br
    # multiple of 8); "dot" writes (1, br) at lane offsets (multiple of
    # 128, the f32 lane width).
    step = 128 if formulation == "dot" else 8
    top = min(block_rows, n) // step * step
    br = next((b for b in range(top, step - 1, -step) if n % b == 0), None)
    if br is None:
        raise ValueError(
            f"dim {n} admits no {formulation}-aligned row stripe "
            f"(need a divisor that is a multiple of {step})"
        )
    g = n // br

    state_dt = ev.dtype  # f32 even when A is reduced-precision STORAGE
    lam_arr = jnp.asarray(lam, state_dt).reshape(1, 1)
    budget_arr = jnp.asarray(budget, jnp.int32).reshape(1, 1)
    vraw_shape = (1, n) if formulation == "dot" else (n, 1)

    evn, vn, adv, lamn = pl.pallas_call(
        functools.partial(
            _multiround_kernel,
            eps=float(eps),
            init=init,
            eps_mode=eps_mode,
            formulation=formulation,
        ),
        grid=(chunk, g),
        in_specs=[
            pl.BlockSpec((1, n), lambda r, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda r, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda r, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda r, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((br, n), lambda r, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n), lambda r, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda r, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda r, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda r, i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), state_dt),
            jax.ShapeDtypeStruct((1, n), state_dt),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), state_dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, n), state_dt),  # ev
            pltpu.VMEM((1, n), state_dt),  # v (divided, stop-checked)
            pltpu.VMEM(vraw_shape, state_dt),  # raw A @ ev of the round
            pltpu.SMEM((1,), jnp.int32),  # done
            pltpu.SMEM((1,), jnp.int32),  # rounds advanced
            pltpu.SMEM((1,), state_dt),  # λ snapshot
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * chunk * n * n,
            bytes_accessed=chunk * n * n * A.dtype.itemsize,
            transcendentals=0,
        ),
        # the double-buffered (br, n) A stripes dominate VMEM: budget
        # 2.5× the stripe pair (Mosaic's measured stack overhead scales
        # ~18% above the buffers) plus 4 MiB for the O(n) state/IO
        # blocks, so big-stripe shapes compile instead of tripping the
        # 16 MiB default scoped limit; the chip has 128 MiB.  The vpu
        # formulation's COLUMN-layout (n, 1) vraw scratch is physically
        # lane-padded to (n, 128) — n·128·itemsize, 16 MiB at 32768² —
        # the same effect multiround_sym budgets explicitly (the round-4
        # OOM), so it gets its own term here too (review r5c: the dense
        # large-dim rung ran with ~zero margin without it).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(
                5 * br * n * A.dtype.itemsize // 2
                + (
                    n * 128 * jnp.dtype(state_dt).itemsize
                    if formulation == "vpu"
                    else 0
                )
                + (4 << 20)
            ),
        ),
        interpret=interpret,
    )(ev[None, :], v[None, :], lam_arr, budget_arr, A)
    return evn[0, :], vn[0, :], adv[0, 0], lamn[0, 0]


def _multiround_sym_kernel(
    *args,
    eps,
    init,
    eps_mode,
    formulation,
    cached=(),
    slots=0,
    mxu_slots=0,
    sym=True,
    fill="prologue",
):
    # ``cached`` (static): the (i, j) tile coordinates of the strictly-
    # off-diagonal tiles held VMEM-resident across the whole chunk —
    # see :func:`multiround_sym`'s cache_tiles.  With caching the
    # argument list gains three more scalar-prefetch arrays (the
    # per-grid-step cached-work slots), A again pinned to HBM (the DMA
    # source), a packed cache scratch and a DMA semaphore array.
    if cached and formulation == "mixed":
        # three extra scalar-prefetch arrays (the MXU share's per-step
        # cached-work slots — the "cs/cdi/cdj" triple of the dot loop)
        # and one extra lane-space accumulator: the MXU terms get their
        # OWN accumulator so their writes carry no memory dependency on
        # the VPU transpose terms' rawrow writes (a shared accumulator
        # would serialize the two units)
        (ti_ref, tj_ref, cs_ref, cdi_ref, cdj_ref,
         ms_ref, mdi_ref, mdj_ref,
         ev_in, v_in, lam_in, budget_in, a_ref, a_hbm,
         ev_out, v_out, adv_out, lam_out,
         ev_s, evcol_s, vrow_s, rawrow_s, rawcol_s, done_s, adv_s, lam_s,
         rawmxu_s, cache_s, dma_sem) = args
    elif cached:
        (ti_ref, tj_ref, cs_ref, cdi_ref, cdj_ref,
         ev_in, v_in, lam_in, budget_in, a_ref, a_hbm,
         ev_out, v_out, adv_out, lam_out,
         ev_s, evcol_s, vrow_s, rawrow_s, rawcol_s, done_s, adv_s, lam_s,
         cache_s, dma_sem) = args
    else:
        (ti_ref, tj_ref,
         ev_in, v_in, lam_in, budget_in, a_ref,
         ev_out, v_out, adv_out, lam_out,
         ev_s, evcol_s, vrow_s, rawrow_s, rawcol_s, done_s, adv_s,
         lam_s) = args
    r = pl.program_id(0)  # round within the chunk (outermost)
    t = pl.program_id(1)  # upper-triangle tile index
    k, T = pl.num_programs(0), pl.num_programs(1)
    n = ev_s.shape[1]
    bt = a_ref.shape[0]
    i, j = ti_ref[t], tj_ref[t]

    def _dyn_copy(s, ci, cj):
        """Copy descriptor for cached tile ``s`` (traced indices — the
        pipelined fill resolves tiles through the per-step slot arrays)."""
        return pltpu.make_async_copy(
            a_hbm.at[pl.ds(ci * bt, bt), pl.ds(cj * bt, bt)],
            cache_s.at[pl.ds(s * bt, bt), :],
            dma_sem.at[s],
        )

    def _issue_step(tt):
        """Start the fill DMAs for every cached tile first USED at
        streamed step ``tt`` (both the VPU and — in mixed — the MXU
        share's slots)."""
        for kc in range(slots):
            s = cs_ref[tt * slots + kc]
            ci = cdi_ref[tt * slots + kc]
            cj = cdj_ref[tt * slots + kc]

            @pl.when(s >= 0)
            def _(s=s, ci=ci, cj=cj):
                _dyn_copy(s, ci, cj).start()
        if formulation == "mixed":
            for kc in range(mxu_slots):
                s = ms_ref[tt * mxu_slots + kc]
                ci = mdi_ref[tt * mxu_slots + kc]
                cj = mdj_ref[tt * mxu_slots + kc]

                @pl.when(s >= 0)
                def _(s=s, ci=ci, cj=cj):
                    _dyn_copy(s, ci, cj).start()

    @pl.when((r == 0) & (t == 0))
    def _():
        ev_s[...] = ev_in[...]
        vrow_s[...] = v_in[...]
        done_s[0] = 0
        adv_s[0] = 0
        lam_s[0] = lam_in[0, 0]
        if cached and fill == "prologue":
            # Fill the packed VMEM cache ONCE per solve: each cached
            # tile is DMA'd from the HBM-resident A at full bandwidth
            # and then reused by every round — the whole point of the
            # cached variant (the one-shot ~130 µs fill is charged to
            # the solve; the per-round HBM traffic drops by the cached
            # area).  Up to 8 copies are kept in flight (strided starts
            # against an 8-slot semaphore ring) so the fill runs at
            # stream bandwidth without assuming an unbounded hardware
            # DMA queue.
            depth = min(8, len(cached))

            def _copy(s):
                tii, tjj = cached[s]
                return pltpu.make_async_copy(
                    a_hbm.at[tii * bt:(tii + 1) * bt,
                             tjj * bt:(tjj + 1) * bt],
                    cache_s.at[s * bt:(s + 1) * bt, :],
                    dma_sem.at[s % depth],  # depth = min(8, C) >= 1 here
                )

            for s in range(len(cached)):
                if s >= depth:
                    _copy(s - depth).wait()
                _copy(s).start()
            for s in range(max(0, len(cached) - depth), len(cached)):
                _copy(s).wait()
        elif cached:
            # PIPELINED fill (round 5c): only step 0's tiles start here;
            # each round-0 step issues the NEXT step's tiles and waits
            # its own just before first use, so the ~130 µs fill rides
            # under round-0 compute instead of stalling it (the VPU sat
            # idle through the prologue fill).  One semaphore per cached
            # tile; in-flight ≤ 2 steps' worth (≈ 2·slots ≤ 8 at the
            # headline config — the same queue-depth budget as above).
            _issue_step(0)

    if cached and fill == "pipelined":
        @pl.when((r == 0) & (t + 1 < T))
        def _():
            _issue_step(t + 1)

    def _merged_raw():
        raw = (
            rawrow_s[...]
            if formulation == "dot"
            else rawrow_s[...] + jnp.transpose(rawcol_s[...])
        )
        if formulation == "mixed":
            raw = raw + rawmxu_s[...]
        return raw

    # Round prologue (once per round): the shared division/stop/λ/max/
    # ev-update (:func:`_round_prologue` — one definition with the dense
    # kernel), then zero this round's triangle accumulators.
    @pl.when(t == 0)
    def _():
        _round_prologue(
            r, n, _merged_raw, budget_in,
            ev_s, vrow_s, done_s, adv_s, lam_s,
            eps=eps, init=init, eps_mode=eps_mode,
        )

        rawrow_s[...] = jnp.zeros_like(rawrow_s)
        if formulation in ("vpu", "mixed"):
            rawcol_s[...] = jnp.zeros_like(rawcol_s)
            if sym:
                # evcol feeds only the transpose terms — dense tiled
                # mode (sym=False) has none, and this O(n) XLU
                # transpose sits in the pipeline-stalling t==0 prologue
                # (review r5c: the dense cached rung paid it for
                # nothing every round)
                evcol_s[...] = jnp.transpose(ev_s[...])
        if formulation == "mixed":
            rawmxu_s[...] = jnp.zeros_like(rawmxu_s)

    # The symmetric matvec: tile (i, j) of the UPPER triangle contributes
    # rows i_blk directly and — off-diagonal — rows j_blk through its
    # transpose (A[jc, ir] == A[ir, jc]).  Runs unconditionally after
    # convergence (frozen rounds stream + recompute, values discarded) —
    # same rationale as _multiround_kernel's hot path.
    tile = a_ref[...].astype(ev_s.dtype)
    if formulation == "dot":
        part_i = jax.lax.dot_general(
            ev_s[:, pl.ds(j * bt, bt)],
            tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        rawrow_s[:, pl.ds(i * bt, bt)] += part_i

        if sym:
            @pl.when(i != j)
            def _():
                part_j = jax.lax.dot_general(
                    ev_s[:, pl.ds(i * bt, bt)],
                    tile,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                rawrow_s[:, pl.ds(j * bt, bt)] += part_j
    else:
        part_i = jnp.sum(
            tile * ev_s[:, pl.ds(j * bt, bt)], axis=1, keepdims=True
        )
        rawcol_s[pl.ds(i * bt, bt), :] += part_i

        if sym:
            @pl.when(i != j)
            def _():
                part_j = jnp.sum(
                    tile * evcol_s[pl.ds(i * bt, bt), :], axis=0,
                    keepdims=True
                )
                rawrow_s[:, pl.ds(j * bt, bt)] += part_j

    # Cached-tile contributions, SPREAD ACROSS the streamed grid steps
    # (``slots`` per step): each step's cached work (~0.3 µs of VPU per
    # tile on resident data) hides under that step's ~1.3 µs streamed-
    # tile DMA.  Concentrating it in the round prologue instead stalls
    # the stream — the pipeline prefetches only one block ahead, so a
    # long t==0 compute serializes with ALL later DMAs (measured: level-1
    # quadrants at 4.58 ms vs 3.51 ms pure streaming).  Every cached
    # tile is strictly off-diagonal ⇒ always both the direct and the
    # transpose term.  Same freeze rationale as the streamed path.
    if cached:
        for kc in range(slots):
            s = cs_ref[t * slots + kc]
            ci = cdi_ref[t * slots + kc]
            cj = cdj_ref[t * slots + kc]

            @pl.when(s >= 0)
            def _(s=s, ci=ci, cj=cj):
                if fill == "pipelined":
                    @pl.when(r == 0)
                    def _(s=s, ci=ci, cj=cj):
                        _dyn_copy(s, ci, cj).wait()
                blk = cache_s[pl.ds(s * bt, bt), :].astype(ev_s.dtype)
                if formulation == "dot":
                    part_ci = jax.lax.dot_general(
                        ev_s[:, pl.ds(cj * bt, bt)],
                        blk,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    rawrow_s[:, pl.ds(ci * bt, bt)] += part_ci
                    if sym:
                        part_cj = jax.lax.dot_general(
                            ev_s[:, pl.ds(ci * bt, bt)],
                            blk,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )
                        rawrow_s[:, pl.ds(cj * bt, bt)] += part_cj
                else:
                    part_ci = jnp.sum(
                        blk * ev_s[:, pl.ds(cj * bt, bt)],
                        axis=1,
                        keepdims=True,
                    )
                    rawcol_s[pl.ds(ci * bt, bt), :] += part_ci
                    if sym:
                        part_cj = jnp.sum(
                            blk * evcol_s[pl.ds(ci * bt, bt), :],
                            axis=0,
                            keepdims=True,
                        )
                        rawrow_s[:, pl.ds(cj * bt, bt)] += part_cj

        # "mixed" (round 5c, retained measured negative): the MXU share
        # of the cached tiles runs as dot_general while the VPU share
        # above keeps the vpu form.  Both terms accumulate into the
        # DEDICATED rawmxu_s so these writes carry no memory dependency
        # on the VPU terms' rawrow/rawcol writes; the merge adds
        # rawmxu once per round.
        if formulation == "mixed":
            for kc in range(mxu_slots):
                s = ms_ref[t * mxu_slots + kc]
                ci = mdi_ref[t * mxu_slots + kc]
                cj = mdj_ref[t * mxu_slots + kc]

                @pl.when(s >= 0)
                def _(s=s, ci=ci, cj=cj):
                    if fill == "pipelined":
                        @pl.when(r == 0)
                        def _(s=s, ci=ci, cj=cj):
                            _dyn_copy(s, ci, cj).wait()
                    blk = cache_s[pl.ds(s * bt, bt), :].astype(ev_s.dtype)
                    part_ci = jax.lax.dot_general(
                        ev_s[:, pl.ds(cj * bt, bt)],
                        blk,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    rawmxu_s[:, pl.ds(ci * bt, bt)] += part_ci
                    if sym:
                        part_cj = jax.lax.dot_general(
                            ev_s[:, pl.ds(ci * bt, bt)],
                            blk,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )
                        rawmxu_s[:, pl.ds(cj * bt, bt)] += part_cj

    @pl.when((r == k - 1) & (t == T - 1))
    def _():
        d = done_s[0] == 1
        ev_out[...] = ev_s[...]
        v_out[...] = jnp.where(d, vrow_s[...], _merged_raw() / ev_s[...])
        adv_out[0, 0] = adv_s[0]
        lam_out[0, 0] = lam_s[0]


def sym_tile(n: int, tile: int = 512) -> int | None:
    """Largest square tile edge ≤ ``tile`` that divides ``n`` and is a
    multiple of 128 (the f32 lane width — both the lane-offset writes
    into the (1, n) accumulator and the A tile itself need it).  None if
    the dim admits no such tile (callers fall back to the dense path)."""
    top = min(tile, n) // 128 * 128
    return next((b for b in range(top, 127, -128) if n % b == 0), None)


def sym_auto_cache_tiles(
    n: int, bt: int, itemsize: int = 4, budget_mb: int = 104,
    sym: bool = True,
) -> int:
    """Largest safe ``cache_tiles`` for :func:`multiround_sym` on a v5e:
    fill ``budget_mb`` of VMEM with resident tiles, capped at the
    cacheable tile count — the strictly-off-diagonal count for the
    symmetric kernel, all-but-one of the g² tiles for the dense
    (``sym=False``) tiled kernel (at least one tile must stream).  The
    default budget is the measured-good flagship point: 104 MiB of
    cache + ~10.5 MiB of stream/state/margin compiles inside the
    128 MiB VMEM and measures 1.30 ms at 8192² f32 (vs 3.51 ms pure
    streaming; 110 MiB+ risks the Mosaic scoped-vmem OOM —
    scratch/exp_sym_cached.py).

    The budget is additionally capped by what the kernel's OWN VMEM
    demand leaves free: the vpu formulation's two lane-padded (n, 1)
    scratches cost 2·n·128·4 bytes (32 MiB at 32768²!) and the
    double-buffered stream tiles 2.5·bt²·itemsize — without this cap the
    fixed 104 MiB default would push large-dim compiles past the chip's
    128 MiB (review round 5: the defaults at 16384²+ would have OOMed
    where the round-4 stripes default worked)."""
    g = n // bt
    per_tile = bt * bt * itemsize
    cap = g * (g - 1) // 2 if sym else g * g - 1
    state = 2 * n * 128 * 4  # lane-padded (n, 1) f32 vpu scratches
    stream = 5 * bt * bt * itemsize // 2
    avail = (126 << 20) - state - stream - (8 << 20)
    budget = min(budget_mb << 20, max(0, avail))
    return max(0, min(budget // per_tile, cap))


def sym_cache_split(n: int, bt: int, cache_tiles: int):
    """Partition the upper-triangle tile grid into (streamed, cached):
    up to ``cache_tiles`` strictly-off-diagonal tiles — those FURTHEST
    from the diagonal first (an arbitrary but fixed choice; any strictly-
    off-diagonal tile is cacheable) — go VMEM-resident, the diagonal
    tiles plus the remainder stream.  Returns (streamed, cached) as
    tuples of (i, j) tile coordinates."""
    g = n // bt
    offdiag = sorted(
        ((i, j) for i in range(g) for j in range(i + 1, g)),
        key=lambda ij: ij[0] - ij[1],  # j - i descending
    )
    # clamp like the dense branch: a negative count must mean "no cache",
    # not Python negative slicing (offdiag[:-1] would silently cache
    # nearly the whole triangle and OOM the VMEM budget)
    c = max(0, min(cache_tiles, len(offdiag)))
    cached = tuple(offdiag[:c])
    streamed = tuple(sorted([(i, i) for i in range(g)] + offdiag[c:]))
    return streamed, cached


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "init", "eps", "eps_mode", "tile", "interpret",
        "formulation", "cache_tiles", "sym", "mxu_tiles", "fill_mode",
    ),
)
def multiround_sym(
    A: jax.Array,
    ev: jax.Array,
    v: jax.Array,
    lam: jax.Array,
    budget: jax.Array,
    *,
    chunk: int,
    eps: float,
    init: bool = False,
    eps_mode: str = "absolute",
    tile: int = 512,
    interpret: bool = False,
    formulation: str = "vpu",
    cache_tiles: int = 0,
    sym: bool = True,
    mxu_tiles: int | None = None,
    fill_mode: str = "prologue",
):
    """:func:`multiround` for a SYMMETRIC matrix: each round reads only
    the ``g(g+1)/2`` upper-triangle tiles of A — ~HALF the HBM traffic of
    the dense kernel, which is the entire cost of this memory-bound solve
    (the round-4 rung of the optimization ladder).

    Correctness rests on the power-form algebra (solver_matvec.py): every
    round multiplies by the ORIGINAL A, and for symmetric A the matvec
    needs each off-diagonal tile only once —

        raw[i_blk] += T    @ ev[j_blk]      (rows i of A)
        raw[j_blk] += T^T  @ ev[i_blk]      (rows j of A, by symmetry)

    with diagonal tiles contributing the plain row term.  The reference
    has no symmetric path (its kernels always stream the full matrix,
    similarity_transform.cpp:77-152) — this is the TPU-native analog of a
    BLAS ``symv`` fast path, reachable via ``SolverConfig(symmetric=True)``.
    The caller DECLARES symmetry; nothing is checked here (api-level
    ``validate=True`` checks it on device).

    The tile order is enumerated by scalar-prefetch index arrays, so the
    grid has exactly ``chunk · len(streamed)`` steps (= ``chunk ·
    g(g+1)/2`` without caching) — no masked iterations, no wasted DMA.
    Diagonal tiles are streamed whole (their lower halves are
    the only excess traffic: ½·n·bt elements per round, ≤ 6.3% at the
    default tile=512, 8192²).  Prologue/freeze/chunk semantics are
    bit-identical in structure to :func:`multiround`; the reduction order
    differs from every dense formulation, so round-count parity is
    asserted by tests at every benchmark dim (as with every tile-shape
    change, it held).

    Formulations: "vpu" (broadcast-multiply + lane reduce for the row
    term, sublane reduce for the transpose term; two accumulators merged
    once per round), "dot" (MXU ``dot_general`` at HIGHEST for both
    terms, single lane-space accumulator), and "mixed" (round 5c: an
    ``mxu_tiles``-sized share of the CACHED tiles runs as MXU
    ``dot_general`` — with its OWN accumulator so the writes carry no
    memory dependency on the VPU terms — while everything else keeps
    the vpu form; default share = the unit-balance point
    ``total_terms / (1 + MXU_TERM_COST)``).

    MEASURED NEGATIVE (retained rung): in the compute-bound cached
    regime the hoped-for VPU/MXU co-issue does not materialize — the
    cost model is strictly ADDITIVE at ~4× per MXU term (M=1 wastes
    7/8 of the MXU sublanes and f32 HIGHEST's bf16x3 decomposition
    spends VPU cycles anyway), so every MXU share loses:
    vpu 1.20 ms vs mixed m16/m28/auto 1.67/1.78/2.10 ms and pure dot
    4.2 ms at 8192²/C104 (scratch/exp_mxu_cached.py,
    scratch/exp_mixed_sweep.py, 2026-08-20).  "vpu" stays the
    production default; the rung is kept bit-correct for recheck on
    future compilers/chips (wider MXU issue or native-f32 MXUs would
    flip the balance).

    ``cache_tiles`` (round 5) holds that many strictly-off-diagonal
    tiles VMEM-RESIDENT across all rounds: the v5e has ~128 MiB of VMEM
    and this solve is pure HBM streaming, so any part of A that fits on
    chip needs to cross HBM exactly once per SOLVE instead of once per
    ROUND (packed cache filled by in-kernel DMA at the first grid step;
    tile choice: :func:`sym_cache_split`).  The cached tiles' matvec
    contributions are spread across the streamed grid steps so the VPU
    work hides under the stream DMAs (the kernel docstring's measured
    prologue-stall negative).  At 8192²/tile=512 with cache_tiles=96
    (96 MiB), per-solve HBM traffic is (18·40 + 96)/(18·256) ≈ 0.18× of
    the dense stream.  The reference has no analog — its largest
    on-chip memory is a workgroup local buffer
    (similarity_transform.cpp:96-99); this is the TPU-native
    exploitation of a 3-orders-larger on-chip store.
    """
    n, ncols = A.shape
    assert n == ncols, (n, ncols)
    assert formulation in ("dot", "vpu", "mixed"), formulation
    if eps_mode not in ("absolute", "relative"):
        raise ValueError(f"unknown eps_mode {eps_mode!r}")
    bt = sym_tile(n, tile)
    if bt is None:
        raise ValueError(
            f"dim {n} admits no 128-aligned square tile for the symmetric "
            f"kernel (need a divisor of n that is a multiple of 128); use "
            f"the dense multiround kernel"
        )
    g = n // bt
    if sym:
        tri, cached = sym_cache_split(n, bt, cache_tiles)
    else:
        # DENSE tiled mode (``sym=False``, round 5): the same grid/cache
        # machinery over ALL g² tiles with direct terms only — the
        # general-matrix analog of the cached kernel (any tile is
        # cacheable; ≥1 tile must stream so every round has grid steps).
        all_tiles = [(i, j) for i in range(g) for j in range(g)]
        c = max(0, min(cache_tiles, len(all_tiles) - 1))
        order = sorted(all_tiles, key=lambda ij: -abs(ij[0] - ij[1]))
        cached = tuple(order[:c])
        cset = set(cached)
        tri = tuple(t for t in all_tiles if t not in cset)
    ti = jnp.asarray([i for i, _ in tri], jnp.int32)
    tj = jnp.asarray([j for _, j in tri], jnp.int32)
    # per-step cached-work slot arrays: cached tile s is handled at
    # streamed step s % T, slot s // T (round-robin), so the resident
    # compute spreads evenly across the round's DMA timeline
    T, C = len(tri), len(cached)
    mixed = formulation == "mixed"
    if mxu_tiles is not None and not mixed:
        raise ValueError(
            "mxu_tiles is only meaningful with formulation='mixed'"
        )
    if mixed and not C:
        raise ValueError(
            "formulation='mixed' needs cache_tiles > 0 (the MXU share "
            "is carved out of the VMEM-resident tiles)"
        )
    if fill_mode not in ("prologue", "pipelined"):
        raise ValueError(f"unknown fill_mode {fill_mode!r}")
    if fill_mode == "pipelined" and not C:
        raise ValueError(
            "fill_mode='pipelined' schedules the cache fill; it needs "
            "cache_tiles > 0"
        )
    # The pipelined fill issues step t+1's tiles at step t and waits at
    # first use, so in-flight DMAs are bounded by two steps' worth of
    # slots.  Keep that bound within the same 8-deep queue budget the
    # prologue fill enforces (low-T configs — e.g. dense tiled mode
    # with nearly everything cached — would otherwise start arbitrarily
    # many concurrent DMAs).  Checked after the slot split below.
    if mixed:
        # the MXU share: by default the term-count balance point between
        # the units, given the measured per-term MXU/VPU cost ratio
        # (exp_mxu_cached: all-104-tiles-on-MXU 4.2 ms vs all-on-VPU
        # 1.14-1.37 ⇒ ~3.5× per term).  terms: streamed diagonals 1,
        # everything else 2 in sym mode; every tile 1 in dense mode.
        if sym:
            t_stream = sum(1 if i == j else 2 for i, j in tri)
            per_cached = 2
        else:
            t_stream = len(tri)
            per_cached = 1
        total = t_stream + per_cached * C
        if mxu_tiles is None:
            m = round(total / (1.0 + MXU_TERM_COST) / per_cached)
        else:
            m = mxu_tiles
        m = max(0, min(m, C))
    else:
        m = 0

    def _slot_arrays(idxs):
        """Round-robin the cached-tile indices ``idxs`` across the T
        streamed grid steps; -1 marks an empty slot.  Zero-slot shares
        get a single dummy -1 so the prefetch operand is never empty
        (the kernel's range(0) loop reads nothing)."""
        k = len(idxs)
        sl = -(-k // T) if k else 0
        s_arr = [-1] * max(1, T * sl)
        di = [0] * max(1, T * sl)
        dj = [0] * max(1, T * sl)
        for q, s in enumerate(idxs):
            t_idx, kc = q % T, q // T
            s_arr[t_idx * sl + kc] = s
            di[t_idx * sl + kc] = cached[s][0]
            dj[t_idx * sl + kc] = cached[s][1]
        return (
            jnp.asarray(s_arr, jnp.int32),
            jnp.asarray(di, jnp.int32),
            jnp.asarray(dj, jnp.int32),
            sl,
        )

    if C:
        cs, cdi, cdj, slots = _slot_arrays(range(C - m))
        ms_, mdi, mdj, mxu_slots = _slot_arrays(range(C - m, C))
    else:
        slots = mxu_slots = 0
    if fill_mode == "pipelined" and 2 * (slots + mxu_slots) > 8:
        raise ValueError(
            f"fill_mode='pipelined' would keep up to "
            f"{2 * (slots + mxu_slots)} fill DMAs in flight "
            f"(2 steps x {slots + mxu_slots} slots) — over the 8-deep "
            f"queue budget; use the prologue fill or cache fewer tiles "
            f"relative to the streamed count"
        )

    state_dt = ev.dtype  # f32 even when A is reduced-precision STORAGE
    lam_arr = jnp.asarray(lam, state_dt).reshape(1, 1)
    budget_arr = jnp.asarray(budget, jnp.int32).reshape(1, 1)

    scratch = [
        pltpu.VMEM((1, n), state_dt),  # ev
        # evcol/rawcol exist only for the vpu formulation; Mosaic allocates
        # nothing for refs the kernel never touches, but the arity is fixed
        pltpu.VMEM((n, 1), state_dt),  # ev in column layout
        pltpu.VMEM((1, n), state_dt),  # v (divided, stop-checked)
        pltpu.VMEM((1, n), state_dt),  # raw accumulator (lane layout)
        pltpu.VMEM((n, 1), state_dt),  # raw accumulator (column layout)
        pltpu.SMEM((1,), jnp.int32),  # done
        pltpu.SMEM((1,), jnp.int32),  # rounds advanced
        pltpu.SMEM((1,), state_dt),  # λ snapshot
    ]
    if mixed:
        # the MXU share's own lane-space accumulator (no memory
        # dependency on the VPU terms' writes)
        scratch.append(pltpu.VMEM((1, n), state_dt))
    if C:
        # the packed resident cache + fill semaphores: an 8-slot ring
        # for the one-shot prologue fill, or one per tile for the
        # pipelined wait-at-first-use fill
        scratch.append(pltpu.VMEM((C * bt, bt), A.dtype))
        scratch.append(pltpu.SemaphoreType.DMA(
            (C if fill_mode == "pipelined" else min(8, C),)
        ))
    # index-map lambdas take (r, t, *prefetch-refs); *pref keeps one
    # definition valid for both the 2-array and the 5-array (cached) form
    in_specs = [
        pl.BlockSpec(
            (1, n), lambda r, t, *pref: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, n), lambda r, t, *pref: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, 1), lambda r, t, *pref: (0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (1, 1), lambda r, t, *pref: (0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (bt, bt),
            lambda r, t, ti, tj, *pref: (ti[t], tj[t]),
            memory_space=pltpu.VMEM,
        ),
    ]
    if C:
        # A again, un-blocked and PINNED to HBM: the DMA source for the
        # resident cache (passing the SAME array twice costs nothing —
        # no copy; the tiled spec above streams it, this ref feeds the
        # one-shot cache fills).  ANY must not be used here: the
        # compiler "helpfully" places an ANY-space operand in VMEM when
        # it fits its model, which charges the whole 256 MiB of A
        # against the 128 MiB budget (measured: 322 MiB requested, OOM).
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=(8 if mixed else 5) if C else 2,
        grid=(chunk, len(tri)),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, n), lambda r, t, *pref: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n), lambda r, t, *pref: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1), lambda r, t, *pref: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1), lambda r, t, *pref: (0, 0), memory_space=pltpu.SMEM
            ),
        ),
        scratch_shapes=scratch,
    )
    cache_bytes = C * bt * bt * A.dtype.itemsize
    operands = [ti, tj]
    if C:
        operands += [cs, cdi, cdj]
        if mixed:
            operands += [ms_, mdi, mdj]
    operands += [ev[None, :], v[None, :], lam_arr, budget_arr, A]
    if C:
        operands.append(A)
    evn, vn, adv, lamn = pl.pallas_call(
        functools.partial(
            _multiround_sym_kernel,
            eps=float(eps),
            init=init,
            eps_mode=eps_mode,
            formulation=formulation,
            cached=cached,
            slots=slots,
            mxu_slots=mxu_slots,
            sym=sym,
            fill=fill_mode,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, n), state_dt),
            jax.ShapeDtypeStruct((1, n), state_dt),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), state_dt),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * chunk * n * n,
            bytes_accessed=(
                chunk * len(tri) * bt * bt * A.dtype.itemsize + cache_bytes
            ),
            transcendentals=0,
        ),
        # Double-buffered (bt, bt) tiles (2.5× the pair — Mosaic's
        # measured ~18% stack overhead, as in multiround) + 4 MiB for the
        # O(n) lane-space state.  The vpu formulation's two COLUMN-layout
        # (n, 1) scratches are physically lane-padded to (n, 128) —
        # n·128·itemsize each (measured: 8.03 MiB scoped at 8192² f32,
        # the round-4 OOM) — so they get their own explicit term.  The
        # resident cache (cache_tiles > 0) adds its exact footprint plus
        # a doubled margin (measured 604 KiB past the 4 MiB margin with
        # resident buffers present).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(
                5 * bt * bt * A.dtype.itemsize // 2
                + (
                    2 * n * 128 * jnp.dtype(state_dt).itemsize
                    if formulation in ("vpu", "mixed")
                    else 0
                )
                + cache_bytes
                + ((8 << 20) if C else (4 << 20))
            ),
        ),
        interpret=interpret,
    )(*operands)
    return evn[0, :], vn[0, :], adv[0, 0], lamn[0, 0]


def _round_fused_kernel(
    a_ref,
    evrow_ref,
    vrow_ref,
    evcol_ref,
    vcol_ref,
    vfull_ref,
    vnext_ref,
    evnew_ref,
    done_ref,
    lam_ref,
    m_ref,
    *,
    eps,
):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        v = vfull_ref[...]  # (1, n)
        n = v.shape[1]
        m_ref[0, 0] = jnp.max(v)
        # neighbor-with-wraparound via lane roll: element k pairs with
        # v[(k+1) % n] (reference stop semantics, cpp:385-417)
        nbr = pltpu.roll(v, shift=n - 1, axis=1)
        done_ref[0, 0] = jnp.all(jnp.abs(v - nbr) < eps).astype(jnp.int32)
        lam_ref[0, 0] = v[0, 0]

    m = m_ref[0, 0]
    evs_c = evrow_ref[...] * (vrow_ref[...] / m)  # (1, bc): updated ev chunk

    @pl.when(i == 0)
    def _():
        evnew_ref[...] = evs_c

    part = jnp.sum(a_ref[...] * evs_c, axis=1, keepdims=True)  # (br, 1)

    @pl.when(j == 0)
    def _():
        vnext_ref[...] = part

    @pl.when(j != 0)
    def _():
        vnext_ref[...] += part

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        evs_r = evcol_ref[...] * (vcol_ref[...] / m)  # (br, 1)
        vnext_ref[...] = vnext_ref[...] / evs_r


@functools.partial(
    jax.jit, static_argnames=("eps", "block_rows", "block_cols", "interpret")
)
def round_fused(
    A: jax.Array,
    ev: jax.Array,
    v: jax.Array,
    *,
    eps: float,
    block_rows: int = 512,
    block_cols: int = 512,
    interpret: bool = False,
):
    """ONE kernel = one full round of the matvec-form solver.

    Fuses everything the round body does — find_max (cpp:154-227), the
    eigenvector update (cpp:229-265), the wraparound stop check
    (cpp:332-460), the λ readout (cpp:60-65), and the O(n²) matvec that
    subsumes sum_across_rows/compute_next_matrix (see solver_matvec.py) —
    into a single Pallas call.  Motivation: measured in the production
    `lax.while_loop`, the O(n) glue between kernel invocations costs
    ~45 µs/round (~13% of the round); the scalars live in SMEM, written
    at grid step (0,0) and read by every later step of the sequential
    grid.  Measured on v5e this does NOT beat the cond-skip loop (see
    solve_fused_round) — retained as the documented end of the
    optimization ladder.

    Returns ``(v_next, ev_new, done, lam)`` where, matching the reference
    ordering exactly: ``m = max(v)``; ``ev_new = ev · v/m``;
    ``done = all |v[k] − v[(k+1)%n]| < eps``; ``lam = v[0]``; and
    ``v_next = (A @ ev_new) / ev_new`` (row-sum vector of the next
    iterate; garbage-but-cheap to discard when ``done``).  Reduction
    order of the matvec is identical to :func:`matvec` (same tiling), so
    round counts are unchanged.
    """
    n, ncols = A.shape
    br, bc = min(block_rows, n), min(block_cols, ncols)
    assert n % br == 0 and ncols % bc == 0, (n, ncols, br, bc)

    ev_row, v_row = ev[None, :], v[None, :]
    ev_col, v_col = ev[:, None], v[:, None]

    vnext, evnew, done, lam = pl.pallas_call(
        functools.partial(_round_fused_kernel, eps=float(eps)),
        grid=(n // br, ncols // bc),
        in_specs=[
            pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncols), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((br, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), A.dtype),
            jax.ShapeDtypeStruct((1, ncols), A.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), A.dtype),
        ),
        scratch_shapes=[pltpu.SMEM((1, 1), A.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ncols,
            bytes_accessed=n * ncols * A.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, ev_row, v_row, ev_col, v_col, v_row)
    return vnext[:, 0], evnew[0, :], done[0, 0] > 0, lam[0, 0]
