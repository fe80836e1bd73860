"""Matvec ("power-form") solver: the algebraic fast path.

The similarity update is a pure diagonal conjugation, so the iterated
matrix never needs to be materialized: with ``A_{k+1} = D_k⁻¹ A_k D_k``
(D_k = diag(v_k)) one shows by induction that

    A_k[r][c] = A_0[r][c] · q_k[c] / q_k[r],     q_{k+1} = q_k ∘ v_k,

and therefore the only quantity the algorithm observes — the row-sum
vector — is

    v_k[r] = (A_0 · q_k)[r] / q_k[r].

Because this ratio is scale-invariant in q, the reference's own
eigenvector accumulator ``ev_k = Π v_i/m_i`` (proportional to q_k) can be
used directly:  **one matvec against the ORIGINAL matrix per round**:

    v_k = (A_0 @ ev_k) / ev_k.

This is the similarity-transform method revealed as (diagonally
renormalized) power iteration.  Per-round HBM traffic drops from the
reference's 3·n²·4B (read for row-sum + read/write for the update,
similarity_transform.cpp:40,52) to 1·n²·4B — 3× less than the reference's
structure and 2× less than our fused Pallas scale+sum kernel — and A is
never written, so max-size solves need only one matrix buffer.

Convergence semantics are IDENTICAL to the iterated form (same v_k
sequence in exact arithmetic; float32 rounding differs slightly from the
mutate-A-each-round path, which tests pin to the reference's round counts
— SURVEY.md §7 "hard parts").  ev stays max-normalized every round, so no
overflow for convergent inputs (unnormalized q_k would grow like λ^k).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .solver import SolveResult, stop_check


def dot_f32(A: jax.Array, x: jax.Array) -> jax.Array:
    """``A @ x`` pinned to f32-faithful precision on every backend.

    TPU MXU matmuls default to bf16 multiplies; the resulting row-sum
    noise (~λ·2⁻⁸) dwarfs the absolute eps=1e-3 stop whenever λ ≳ 1 and
    the solve silently exhausts MAX_ITR — the failure diagnosed on the
    Kronecker operator in round 2 (ops/structured._matmul_f32) applies to
    every dense matvec of a large-λ matrix (e.g. random-positive batches,
    λ ≈ n/2).  Precision.HIGHEST costs extra MXU passes the memory-bound
    gemv never notices.  The production Hilbert path uses the Pallas VPU
    kernel (exact f32 by construction); this guards the jnp fallbacks.
    """
    return jnp.dot(A, x, precision=jax.lax.Precision.HIGHEST)


class _Carry(NamedTuple):
    ev: jax.Array
    v: jax.Array
    lam: jax.Array  # λ snapshot (v[0]) of the last round advanced past
    i: jax.Array


def _make_cond_body(matvec, eps: float, max_itr: int, eps_mode: str = "absolute"):
    """The ONE definition of the matvec-form round (shared by the plain
    and λ-traced loops so their semantics can never diverge).

    Round-2 structure: the stop check lives in the while-loop COND, so the
    body is branch-free — no `lax.cond` matvec skip, no `where`
    bookkeeping, no `done` carry (measured ~50 µs/solve of glue at 8192²
    on v5e).  The converging round's eigenvector update moves to
    :func:`_finish`; the v-sequence — and hence the float32 round count —
    is bit-identical to the round-1 structure (same expressions, same
    order).
    """

    def cond(c: _Carry) -> jax.Array:
        return (c.i < max_itr) & jnp.logical_not(stop_check(c.v, eps, eps_mode))

    def body(c: _Carry) -> _Carry:
        v = c.v
        m = jnp.max(v)
        ev = c.ev * (v / m)
        lam = v[0]
        return _Carry(ev, matvec(ev), lam, c.i + 1)

    return cond, body


def _init_carry(n: int, matvec, dtype, ev0=None) -> _Carry:
    if ev0 is None:
        ev0 = jnp.ones((n,), dtype)
    else:
        # a caller-supplied start vector joins the O(n) state: cast it to
        # the state dtype (review r5c: a mismatched ev0 either crashed
        # the while_loop carry at trace time or silently dropped the
        # stop check to reduced precision)
        ev0 = jnp.asarray(ev0, dtype)
    v0 = matvec(ev0)  # == row sums of A_0
    return _Carry(ev0, v0, jnp.asarray(0.0, dtype), jnp.asarray(0, jnp.int32))


def _finish(out: _Carry, max_itr: int) -> SolveResult:
    """Post-loop epilogue shared by every matvec-form solver.

    Exit cases (reference semantics, similarity_transform.cpp:39-54):
      * converged at round k < max_itr — the loop exited because the stop
        fired on ``out.v``: apply the converging round's ev update, read
        λ = v[0], rounds = k.
      * cap exhaustion (i == max_itr) — rounds v_0..v_{max−1} were checked
        and advanced past; report the last CHECKED round's λ (the ``lam``
        carry), ev as updated through round max_itr−1, converged = False.
        ``out.v`` (= v_max) was computed but never checked — exactly like
        the reference, whose loop exits before round max_itr's stop.
    """
    converged = out.i < max_itr  # early exit ⇔ stop fired on out.v
    m = jnp.max(out.v)
    ev = jnp.where(converged, out.ev * (out.v / m), out.ev)
    lam = jnp.where(converged, out.v[0], out.lam)
    return SolveResult(lam, ev, out.i, converged)


def solve_matvec_loop(
    A: jax.Array,
    matvec,
    eps: float,
    max_itr: int,
    state_dtype=None,
    ev0=None,
    eps_mode: str = "absolute",
) -> SolveResult:
    """Convergence loop over a pluggable ``matvec(ev) -> (A @ ev) / ev``.

    ``state_dtype`` sets the dtype of the O(n) iteration state (ev, v, λ,
    stop check) independently of the matrix storage — reduced-precision
    storage keeps float32 state (bf16 cannot even represent the 1e-3 stop
    tolerance at λ-scale values).

    ``ev0`` overrides the all-ones start vector (the iteration is
    scale-invariant in ev, solver_matvec module docstring) — used by the
    bench harness to thread inter-solve data dependence through one O(n)
    op per SOLVE instead of one per round."""
    cond, body = _make_cond_body(matvec, eps, max_itr, eps_mode)
    if state_dtype is None:
        # reduced-precision A without an explicit state dtype still gets
        # f32 O(n) state (checkpoint._state_dtype's rule): bf16 cannot
        # even represent the 1e-3 stop tolerance at λ-scale values, so a
        # bf16 state would silently mis-count rounds or exhaust the cap
        # (review r5c)
        state_dtype = (
            jnp.float32 if jnp.dtype(A.dtype).itemsize < 4 else A.dtype
        )
    init = _init_carry(A.shape[0], matvec, state_dtype, ev0)
    out = lax.while_loop(cond, body, init)
    return _finish(out, max_itr)


def solve_operator(
    matvec,
    n: int,
    eps: float,
    max_itr: int,
    dtype=jnp.float32,
    ev0: jax.Array | None = None,
    eps_mode: str = "absolute",
) -> SolveResult:
    """MATRIX-FREE solve: ``matvec(x) -> A @ x`` for an implicit positive
    matrix that is never materialized.

    The power-form loop (module docstring) observes A only through one
    matvec per round, so any positive linear operator works: structured
    matrices with fast matvecs (Hankel/Toeplitz via FFT — the Hilbert
    benchmark matrix is Hankel, giving O(n log n) PER-ROUND cost instead
    of O(n²); see ops/structured.py and examples/matrix_free.py),
    sums/products of operators, or matrices too large to materialize at
    all.  The reference requires a
    dense float32 buffer (similarity_transform.hpp:8-9) — this entry has
    no reference analog; it falls out of the TPU-native functional
    design.

    Semantics are the standard ones (wraparound stop, λ = v[0], 0-based
    rounds, stop before update).  Round counts may differ ±1 from the
    dense solver when the operator's floating-point matvec differs from
    the dense row-sum reduction order (e.g. FFT).  Traced — wrap in
    ``jax.jit`` (with ``n``/``eps``/``max_itr`` static) for production.
    """

    def next_v(ev):
        return matvec(ev) / ev

    cond, body = _make_cond_body(next_v, eps, max_itr, eps_mode)
    init = _init_carry(n, next_v, dtype, ev0)
    out = lax.while_loop(cond, body, init)
    return _finish(out, max_itr)


@partial(jax.jit, static_argnames=("eps", "max_itr", "eps_mode"))
def solve_matvec(
    A: jax.Array,
    eps: float,
    max_itr: int,
    ev0: jax.Array | None = None,
    eps_mode: str = "absolute",
) -> SolveResult:
    """Single-chip matvec-form solve (works for any n, no tile alignment).

    ``ev0`` overrides the all-ones start vector (scale-invariant in ev;
    see :func:`solve_matvec_loop`)."""

    def matvec(ev):
        return dot_f32(A, ev) / ev

    return solve_matvec_loop(A, matvec, eps, max_itr, ev0=ev0, eps_mode=eps_mode)


@partial(jax.jit, static_argnames=("eps", "max_itr"))
def solve_matvec_traced(A: jax.Array, eps: float, max_itr: int):
    """Matvec-form solve that also records the PER-ROUND λ estimate (v[0]
    at each round's stop check) — convergence observability the reference
    has no analog for (its only per-solve metrics are ms + final rounds,
    SURVEY.md §5).  Returns ``(SolveResult, lam_history)`` where
    ``lam_history`` has shape ``(max_itr,)``; entries past the converging
    round repeat the final λ (the loop exits early — no extra compute).

    The round itself is the SAME ``_make_cond_body`` body as
    :func:`solve_matvec` — only the history write wraps it — so the two
    stay bit-identical by construction.
    """

    def next_v(ev):
        return dot_f32(A, ev) / ev

    return _solve_traced(next_v, A.shape[0], A.dtype, eps, max_itr)


def solve_operator_traced(
    matvec, n: int, eps: float, max_itr: int, dtype=jnp.float32,
    eps_mode: str = "absolute",
):
    """:func:`solve_operator` with the per-round λ history of
    :func:`solve_matvec_traced` — convergence observability for
    MATRIX-FREE operators (feed the history to
    `ops.spectral.convergence_report` to estimate |λ₂/λ₁|; for a
    stochastic operator like the PageRank Google matrix that ratio IS the
    chain's mixing rate).  Traced — wrap in ``jax.jit`` with the
    non-array arguments static."""

    def next_v(ev):
        return matvec(ev) / ev

    return _solve_traced(next_v, n, dtype, eps, max_itr, eps_mode)


def _solve_traced(
    next_v, n: int, dtype, eps: float, max_itr: int, eps_mode: str = "absolute"
):
    cond, body = _make_cond_body(next_v, eps, max_itr, eps_mode)
    init = _init_carry(n, next_v, dtype)
    hist0 = jnp.zeros((max_itr,), dtype)

    def cond_t(ch):
        return cond(ch[0])

    def body_t(ch):
        c, hist = ch
        c2 = body(c)
        # the body just advanced past round c.i, whose λ is c2.lam
        return c2, lax.dynamic_update_index_in_dim(hist, c2.lam, c.i, axis=0)

    out, hist = lax.while_loop(cond_t, body_t, (init, hist0))
    res = _finish(out, max_itr)
    if max_itr > 0:
        # the converging round never ran a body — write its λ (on cap
        # exhaustion the clamped index rewrites hist[max-1] with the same
        # value, a no-op), then pad the tail with the final λ so
        # downstream plots/deltas are clean
        hist = lax.dynamic_update_index_in_dim(
            hist, res.eigenvalue, jnp.minimum(res.rounds, max_itr - 1), axis=0
        )
        hist = jnp.where(jnp.arange(max_itr) <= res.rounds, hist, res.eigenvalue)
    return res, hist


@partial(
    jax.jit, static_argnames=("eps", "max_itr", "storage_dtype", "eps_mode")
)
def solve_matvec_storage(
    A: jax.Array,
    eps: float,
    max_itr: int,
    storage_dtype=jnp.bfloat16,
    ev0: jax.Array | None = None,
    eps_mode: str = "absolute",
) -> SolveResult:
    """Matvec-form solve with reduced-precision matrix STORAGE.

    A is cast once to ``storage_dtype`` (halving HBM traffic per round in
    bf16 — measured at roofline, ~159 µs/round at 8192² on v5e); products
    are accumulated in float32 (``preferred_element_type``), and all O(n)
    state (v, ev, stop check, λ) stays float32.

    Accuracy: bf16 storage quantizes A entries to ~3 decimal digits, so λ
    carries a ~1e-3 relative error and ``A·v ≈ λ·v`` holds to ~2e-3 —
    looser than the float32 path's 1e-3.  Round counts land within ±1 of
    the float32 reference (measured exact 9/…/17 parity on TPU v5e at every
    benchmark dim, but that is accumulation-order luck, not a contract).
    This is the opt-in fast mode; default stays float32.

    ``A`` may already be in ``storage_dtype`` (the cast is then a no-op) —
    how dims whose float32 copy would not fit HBM are solved (65536² bf16
    = 8 GB, generated on device directly in bf16); the O(n) state is
    float32 regardless.

    ``storage_dtype=jnp.float16`` is also supported and carries ~5× less
    λ error than bf16 at the same bytes (measured 7.9e-5 vs 3.9e-4
    relative on Hilbert 1024²) — but f16's narrow exponent underflows
    below ~6e-5, so it is only safe when the matrix entries stay above
    f16's normal range (Hilbert beyond ~16384² does not); bf16, with
    f32's exponent range, remains the default fast mode.
    """
    Aq = A.astype(storage_dtype)

    def matvec(ev):
        q = ev.astype(storage_dtype)
        y = jnp.dot(Aq, q, preferred_element_type=jnp.float32)
        # divide by the SAME quantized vector (cast back to f32), not the
        # unquantized ev: each round is then an EXACT similarity
        # transform with D = diag(q) — a valid iteration — whereas the
        # mixed q/ev ratio injects a systematic ~λ·2⁻⁹/√n per-component
        # noise floor into v that corresponds to no valid D and that the
        # absolute stop may never cross (review r5c; checkpoint's
        # _state_matvec mirrors this expression bit-for-bit)
        return y / q.astype(jnp.float32)

    return solve_matvec_loop(
        Aq, matvec, eps, max_itr, state_dtype=jnp.float32, ev0=ev0,
        eps_mode=eps_mode,
    )


@partial(
    jax.jit,
    static_argnames=(
        "eps", "max_itr", "chunk", "block_rows", "interpret", "eps_mode",
        "formulation", "storage_dtype", "symmetric", "tile", "cache_tiles",
        "mxu_tiles", "fill_mode",
    ),
)
def solve_multiround(
    A: jax.Array,
    eps: float,
    max_itr: int,
    chunk: int = 18,
    block_rows: int | None = None,
    interpret: bool = False,
    ev0: jax.Array | None = None,
    eps_mode: str = "absolute",
    formulation: str = "vpu",
    storage_dtype=None,
    symmetric: bool = False,
    tile: int | None = None,
    cache_tiles: int = 0,
    mxu_tiles: int | None = None,
    fill_mode: str = "prologue",
) -> SolveResult:
    """Matvec-form solve where up to ``chunk`` ROUNDS run per Pallas
    invocation (:func:`..pallas.kernels.multiround`) — the round-3 attack
    on the measured ~50 µs/round per-invocation pipeline restart
    (docs/BENCH_RESULTS.md: in-loop vs standalone matvec gap; VERDICT r2
    item 1).  A 17-round 8192² solve with the default ``chunk=18`` runs
    ONE kernel invocation (init pass + 17 rounds) instead of 18.

    Chunk semantics are bit-exact with :func:`solve_matvec_pallas`'s loop
    given the same matvec arithmetic: the kernel checks the stop before
    each round and freezes at convergence, the chunk loop re-checks
    between invocations, and the epilogue is the shared :func:`_finish`.
    The kernel's dot_general matvec is a different f32 reduction order
    than the VPU kernel's, so the v-sequence differs in ulps (round-count
    parity asserted by tests at every benchmark dim).

    ``chunk`` trades per-invocation restart against convergence overshoot:
    frozen in-chunk rounds stream their A blocks without computing, so a
    solve converging at round c wastes ``(-c-1) mod chunk`` DMA passes.
    Size it to the workload's known round count + 1 when available
    (HILBERT_ROUNDS); the default matches the flagship 17-round solve.

    ``symmetric=True`` DECLARES A symmetric and switches to the
    upper-triangle kernel (:func:`..pallas.kernels.multiround_sym`):
    each round streams only the ``g(g+1)/2`` square ``tile``-edge blocks
    on or above the diagonal — ~half the HBM traffic, which is the whole
    cost of this memory-bound solve.  Nothing is checked here (api-level
    ``validate`` can check on device); a non-symmetric A gives a wrong
    answer, exactly like lying to a BLAS ``symv``.  ``tile`` must admit a
    128-aligned square divisor of n (``kernels.sym_tile``); round-count
    parity at the benchmark dims is asserted by tests (different f32
    reduction order than every dense formulation).

    ``cache_tiles`` (round 5) holds that many tiles VMEM-RESIDENT
    across the whole solve — they cross HBM once per solve instead of
    once per round, their matvec work spread across the streamed steps
    (kernels.multiround_sym docstring; ~0.18× dense traffic with 96
    cached tiles at 8192²/tile=512 symmetric).  With ``symmetric=True``
    the cache holds strictly-off-diagonal triangle tiles; WITHOUT it,
    ``cache_tiles > 0`` switches from the stripes kernel to the tiled
    direct-terms kernel over all g² tiles (any tile cacheable —
    measured 4.00 vs 6.36 ms at 8192² dense).  0 = the pure-streaming
    kernels.

    ``formulation="mixed"`` (+ ``mxu_tiles``) and ``fill_mode=
    "pipelined"`` are RETAINED MEASURED-NEGATIVE rungs of the cached
    kernel (MXU share of the resident matvec; wait-at-first-use cache
    fill) — bit-correct, validated honored-or-rejected, kept for
    recheck on future compilers/chips; see docs/BENCH_RESULTS.md round
    5c before using either in production.
    """
    from .pallas import kernels

    n = A.shape[0]
    if storage_dtype is not None:
        # reduced-precision STORAGE (solve_matvec_storage semantics): A is
        # cast once — halving HBM traffic per in-kernel round for bf16 —
        # while all O(n) state (ev, v, stop, λ) stays float32; products
        # are computed in f32 inside the kernel (bf16 storage values are
        # exact in f32).  Accuracy/round-count caveats as documented at
        # solve_matvec_storage (±1 round, ~1e-3 relative λ).
        A = A.astype(storage_dtype)
        dtype = jnp.float32
    elif jnp.dtype(A.dtype).itemsize < 4:
        # a matrix ALREADY in reduced precision gets f32 O(n) state too
        # (the kernels' state_dt = ev.dtype): bf16 cannot represent the
        # 1e-3 stop tolerance at λ-scale values, so a bf16 in-kernel
        # stop would silently mis-count rounds (review r5c) — this makes
        # a pre-cast A behave exactly like the storage_dtype path
        dtype = jnp.float32
    else:
        dtype = A.dtype
    if ev0 is None:
        ev0 = jnp.ones((n,), dtype)
    else:
        ev0 = jnp.asarray(ev0, dtype)  # ev0 joins the O(n) state
    kw = dict(
        chunk=chunk,
        eps=eps,
        eps_mode=eps_mode,
        interpret=interpret,
        formulation=formulation,
    )
    if symmetric or cache_tiles > 0:
        # the TILED kernel (symmetric triangle, or dense direct-terms
        # when ``symmetric`` is not declared): ``tile`` is its square
        # edge; ``block_rows`` is a STRIPES knob and would be silently
        # dropped here (review r5c: the validation used to be
        # asymmetric — explicit tile was likewise ignored by the
        # stripes branch below)
        if block_rows is not None:
            raise ValueError(
                f"block_rows={block_rows} is a stripes-kernel knob; the "
                f"tiled kernel (symmetric=True or cache_tiles > 0) uses "
                f"square tiles — set `tile`, or drop block_rows"
            )
        kernel = kernels.multiround_sym
        kw["tile"] = 512 if tile is None else tile
        # VMEM-resident tiles (round 5): the cached area crosses HBM
        # once per SOLVE instead of once per round — see
        # kernels.multiround_sym's cache_tiles notes
        kw["cache_tiles"] = cache_tiles
        kw["mxu_tiles"] = mxu_tiles
        kw["fill_mode"] = fill_mode
        if not symmetric:
            kw["sym"] = False
    else:
        if mxu_tiles is not None:
            raise ValueError(
                "mxu_tiles needs the tiled kernel (symmetric=True or "
                "cache_tiles > 0) with formulation='mixed'"
            )
        if fill_mode != "prologue":
            raise ValueError(
                "fill_mode needs the tiled kernel with cache_tiles > 0"
            )
        if formulation == "mixed":
            raise ValueError(
                "formulation='mixed' needs cache_tiles > 0 (the MXU "
                "share is carved out of the VMEM-resident tiles)"
            )
        if tile is not None:
            raise ValueError(
                f"tile={tile} is a tiled-kernel knob (symmetric=True or "
                f"cache_tiles > 0); the stripes kernel streams full-width "
                f"row stripes — set `block_rows`, or drop tile"
            )
        kernel = kernels.multiround
        kw["block_rows"] = 256 if block_rows is None else block_rows
    ev, v, adv, lam = kernel(
        A, ev0, ev0, jnp.asarray(0.0, dtype), max_itr, init=True, **kw
    )
    init = _Carry(ev, v, lam, adv)

    def cond(c: _Carry) -> jax.Array:
        return (c.i < max_itr) & jnp.logical_not(stop_check(c.v, eps, eps_mode))

    def body(c: _Carry) -> _Carry:
        ev, v, adv, lam = kernel(
            A, c.ev, c.v, c.lam, max_itr - c.i, init=False, **kw
        )
        return _Carry(ev, v, lam, c.i + adv)

    out = lax.while_loop(cond, body, init)
    return _finish(out, max_itr)


@partial(
    jax.jit,
    static_argnames=("eps", "max_itr", "block_rows", "block_cols", "interpret"),
)
def solve_fused_round(
    A: jax.Array,
    eps: float,
    max_itr: int,
    block_rows: int = 512,
    block_cols: int = 512,
    interpret: bool = False,
) -> SolveResult:
    """Matvec-form solve where EACH ROUND IS ONE PALLAS KERNEL
    (:func:`..pallas.kernels.round_fused`): max, eigenvector update,
    wraparound stop, λ readout, and the matvec all execute inside a single
    kernel invocation, eliminating the ~45 µs/round of O(n) glue the
    `lax.while_loop` body otherwise pays between kernel launches.

    Semantics are identical to :func:`solve_matvec` (same op order, same
    reduction order as the :func:`..pallas.kernels.matvec` tiling ⇒ same
    float32 round counts; verified bit-exact λ/ev/rounds vs
    solve_matvec_pallas on TPU at 8192²).  The trade: the converging
    round's matvec is computed-and-discarded rather than skipped (done is
    only known inside the kernel) — one extra O(n²) pass per solve.

    MEASURED OUTCOME (v5e, 8192², chained): 8.19 ms/solve vs 7.81 for the
    cond-skip loop — the serial scalar work at grid step (0,0) stalls the
    DMA pipeline for more than the O(n) glue it absorbs, and the extra
    final-round pass isn't repaid.  Kept as the last rung of the
    optimization ladder and as the measured justification for the
    production design (kernels stay single-purpose; O(n) work stays XLA).
    """
    from .pallas import kernels

    n = A.shape[0]
    dtype = A.dtype
    kw = dict(block_rows=block_rows, block_cols=block_cols, interpret=interpret)
    ev0 = jnp.ones((n,), dtype)
    v0 = kernels.matvec(A, ev0, **kw) / ev0

    def cond(c):
        ev, v, lam, i, done = c
        return jnp.logical_not(done) & (i < max_itr)

    def body(c):
        cev, cv, clam, ci, cdone = c
        vnext, ev, done, lam = kernels.round_fused(A, cev, cv, eps=eps, **kw)
        v = jnp.where(done, cv, vnext)
        i = jnp.where(done, ci, ci + 1)
        return (ev, v, lam, i, done)

    init = (
        ev0, v0, jnp.asarray(0.0, dtype), jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    ev, _, lam, i, done = lax.while_loop(cond, body, init)
    return SolveResult(lam, ev, i, done)


@partial(
    jax.jit,
    static_argnames=("eps", "max_itr", "block_rows", "block_cols", "interpret"),
)
def solve_matvec_pallas_fused(
    A: jax.Array,
    eps: float,
    max_itr: int,
    block_rows: int = 512,
    block_cols: int = 512,
    interpret: bool = False,
) -> SolveResult:
    """Matvec-form solve where the eigenvector update, matvec, and division
    fuse into ONE Pallas kernel (:func:`..pallas.kernels.round_matvec`) and
    the stop check lives in the loop cond — an intermediate rung of the
    round-2 optimization ladder between :func:`solve_fused_round` (all
    scalars in-kernel: slowest) and the production
    :func:`solve_matvec_pallas` (all O(n) glue in XLA).

    MEASURED OUTCOME (v5e, 8192², interleaved chained A/B): consistently
    ~0.15 ms/solve SLOWER than the unfused kernel with the same loop
    structure — the extra operand/result plumbing per grid step costs more
    than the two XLA fusions it absorbs, completing round 1's finding that
    XLA already schedules the O(n) glue near-optimally.  Retained for the
    ladder record (docs/BENCH_RESULTS.md round-2 section); bit-identical
    results to :func:`solve_matvec_pallas` (verified, incl. cap
    exhaustion).
    """
    from .pallas import kernels

    n = A.shape[0]
    dtype = A.dtype
    kw = dict(block_rows=block_rows, block_cols=block_cols, interpret=interpret)
    ev0 = jnp.ones((n,), dtype)
    v0 = kernels.matvec(A, ev0, **kw) / ev0

    def cond(c: _Carry):
        return (c.i < max_itr) & jnp.logical_not(stop_check(c.v, eps))

    def body(c: _Carry):
        m = jnp.max(c.v)
        lam = c.v[0]  # λ snapshot of the round being advanced past
        v_next, ev_new = kernels.round_matvec(A, c.ev, c.v, m, **kw)
        return _Carry(ev_new, v_next, lam, c.i + 1)

    init = _Carry(ev0, v0, jnp.asarray(0.0, dtype), jnp.asarray(0, jnp.int32))
    out = lax.while_loop(cond, body, init)
    # the shared epilogue (review r5c: this rung hand-copied _finish's
    # cap/convergence semantics; the body stays local because the fused
    # kernel returns (v, ev) together and cannot use _make_cond_body's
    # separable matvec)
    return _finish(out, max_itr)


@partial(
    jax.jit,
    static_argnames=(
        "eps", "max_itr", "block_rows", "block_cols", "interpret", "eps_mode",
    ),
)
def solve_matvec_pallas(
    A: jax.Array,
    eps: float,
    max_itr: int,
    block_rows: int = 512,
    block_cols: int = 512,
    interpret: bool = False,
    ev0: jax.Array | None = None,
    eps_mode: str = "absolute",
) -> SolveResult:
    """Matvec-form solve with the Pallas matvec kernel (≈ HBM roofline).

    ``ev0`` overrides the all-ones start vector (scale-invariant in ev;
    see :func:`solve_matvec_loop`)."""
    from .pallas import kernels

    def matvec(ev):
        y = kernels.matvec(
            A, ev, block_rows=block_rows, block_cols=block_cols, interpret=interpret
        )
        return y / ev

    return solve_matvec_loop(A, matvec, eps, max_itr, ev0=ev0, eps_mode=eps_mode)
