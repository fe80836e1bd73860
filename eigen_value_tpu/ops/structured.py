"""Fast matvecs for structured matrices — operands for the matrix-free
operator API (:func:`..api.max_eigenvalue_operator`).

A structured positive matrix need never be materialized: its matvec is
all the power-form solver observes (solver_matvec.py module docstring).
The constructors here replace the O(n²) dense pass with the structure's
natural cost — O(n log n) FFT for Hankel/Toeplitz/circulant (the
benchmark family itself: the Hilbert matrix ``A[r][c] = 1/(r+c+1)`` is
Hankel with profile ``h[k] = 1/(k+1)``), MXU matmuls for Kronecker and
low-rank, O(nnz) gathers for sparse — and the combinators
(:func:`add_matvec`, :func:`scale_matvec`) compose them.

The reference has no analog: its kernels require a dense float32 buffer
(similarity_transform.hpp:8-9).  FFT rounding differs from the dense
row-sum reduction order, so round counts may differ ±1 from the dense
solver (documented at the operator entry).

Everything is jit-compatible; the FFT plans are baked at trace time for
a static ``n``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _fft_len(min_len: int) -> int:
    """Smallest power of two ≥ min_len (power-of-two FFTs are the fast
    path on TPU and everywhere else)."""
    return 1 << (min_len - 1).bit_length()


def _spectrum_rfft(arr, m: int):
    """rfft of a profile vector, as a HOST constant when possible.

    The factories below close over the precomputed spectrum.  For an
    eagerly-built operator a ``jnp.fft.rfft`` result is a DEVICE array;
    embedding it as an mlir constant requires a trace-time device→host
    pull, and that complex64 transfer is UNIMPLEMENTED on the remote-TPU
    tunnel (first observed running --suite operator on silicon,
    2026-08-18).  Computing the O(n) spectrum with numpy avoids exactly
    that trace-time pull; the spectrum is still baked into every
    remote-compile payload either way (acceptable: it is O(n), vs the
    O(n²) arrays the measurement rules forbid closing over).  Precision:
    the host spectrum is f64-computed then cast to complex64, so it
    differs from a device f32 FFT by f32 accumulation error that grows
    with m — covered by the operators' documented ±1 round-count
    tolerance.  Traced inputs (factory called under jit) keep the jnp
    path.
    """
    if isinstance(arr, jax.core.Tracer):
        return jnp.fft.rfft(arr.astype(jnp.float32), m)
    return np.fft.rfft(np.asarray(arr, np.float32), m).astype(np.complex64)


def _spectrum_operand(Sf):
    """Device-safe closure over a precomputed spectrum — call it inside
    the matvec to get the spectrum as a usable operand.

    A host (numpy) complex64 spectrum must never be consumed directly as
    an EAGER operand: the implicit device_put of complex64 is
    UNIMPLEMENTED on the remote-TPU tunnel (observed on silicon
    2026-08-20 via an eager `solve_operator(hilbert_matvec(8192), …)`;
    worse, the failed transfer poisons the process's subsequent
    dispatches).  Split the spectrum into its two f32 halves — transfers
    every backend implements — and rebuild with ``lax.complex`` ON
    DEVICE per call.  Under jit both halves embed as mlir constants and
    the complex() folds at compile time, so the jitted paths lower to
    exactly what the raw complex constant did; eager callers pay two
    O(n) f32 transfers per matvec (eager is the slow path regardless).
    Traced spectra (factory called under jit) pass through untouched."""
    if isinstance(Sf, np.ndarray) and np.iscomplexobj(Sf):
        re = np.ascontiguousarray(Sf.real.astype(np.float32))
        im = np.ascontiguousarray(Sf.imag.astype(np.float32))

        def get(like=None):
            rej, imj = jnp.asarray(re), jnp.asarray(im)
            if like is not None and not isinstance(like, jax.core.Tracer):
                # EAGER with a default device that differs from the
                # data's (e.g. the test harness pins default=CPU while x
                # is committed to the TPU): the halves must be PLACED on
                # the data's device BEFORE the complex is built —
                # otherwise the complex64 result itself would have to
                # cross devices for the multiply, which is exactly the
                # unimplemented transfer this function exists to avoid
                # (observed: conftest's jax_default_device=cpu pin +
                # eager mv(x) on TPU, 2026-08-20).  f32 transfers are
                # implemented everywhere.
                devs = getattr(like, "devices", None)
                d = next(iter(devs()), None) if callable(devs) else None
                if d is not None:
                    rej = jax.device_put(rej, d)
                    imj = jax.device_put(imj, d)
            return jax.lax.complex(rej, imj)

        return get
    return lambda like=None: Sf


def _matmul_f32(a, b):
    """Matmul pinned to full float32 on every backend.

    TPU MXU matmuls default to bf16 multiplies (f32 accumulate): fine for
    ML, fatal for the operator stop check — a row-sum noise of
    ~λ·2⁻⁸ dwarfs the ABSOLUTE eps=1e-3 stop whenever λ ≳ 1, so the
    Kronecker/low-rank solves silently exhaust MAX_ITR on silicon while
    converging on CPU (diagnosed from docs/bench/operator_tpu_r2.jsonl
    rows 3-4: kron at λ≈300–2500 hit rounds=1000, rounds_ok=false).
    ``Precision.HIGHEST`` (6-pass bf16) keeps f32-faithful products at a
    FLOP cost that is irrelevant here (these matvecs are thin).
    """
    return jnp.matmul(
        a,
        b,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def hankel_matvec(h: jax.Array, n: int):
    """Matvec closure for the n×n Hankel matrix ``A[r][c] = h[r+c]``
    (constant anti-diagonals; ``len(h) = 2n-1``).

    ``y[r] = Σ_c h[r+c] x[c]`` is a correlation — equivalently the slice
    ``[n-1 : 2n-1]`` of the linear convolution ``h ⊛ reverse(x)`` —
    computed by real FFT in O(n log n).
    """
    if h.shape[0] != 2 * n - 1:
        raise ValueError(f"need len(h) == 2n-1 == {2 * n - 1}, got {h.shape[0]}")
    # m >= 2n-1 suffices even though the full linear convolution is length
    # 3n-2: circular aliasing wraps entries s >= m onto s - m < n-1, all
    # in the DISCARDED prefix of the slice below (verified bit-comparable
    # to the 3n-2 transform).  rfft rejects bf16/f16, so compute in f32
    # and cast back — the operator then composes with reduced-precision
    # solver state.
    m = _fft_len(2 * n - 1)
    Hf = _spectrum_operand(_spectrum_rfft(h, m))

    def matvec(x: jax.Array) -> jax.Array:
        z = jnp.fft.irfft(Hf(x) * jnp.fft.rfft(x[::-1].astype(jnp.float32), m), m)
        return z[n - 1 : 2 * n - 1].astype(x.dtype)

    return matvec


def toeplitz_matvec(c: jax.Array, r: jax.Array, n: int):
    """Matvec closure for the n×n Toeplitz matrix with first column ``c``
    and first row ``r`` (``A[i][j] = c[i-j]`` for i ≥ j, ``r[j-i]`` for
    j ≥ i; ``c[0]`` must equal ``r[0]``).

    ``y = A x`` is the middle slice of the linear convolution of the
    diagonal profile ``t = [r[n-1..1] reversed | c]`` with ``x``:
    ``y[i] = Σ_j t[(n-1) + (i-j)] x[j]``.
    """
    if c.shape[0] != n or r.shape[0] != n:
        raise ValueError(f"need len(c) == len(r) == n == {n}")
    # t[k] = A[i][j] with i-j = k-(n-1).  Eager inputs build t on host:
    # a jnp.concatenate would commit t to the default device (outside
    # pytest: the tunneled remote TPU) only for _spectrum_rfft to pull it
    # straight back — a pointless remote round trip per factory call.
    if isinstance(c, jax.core.Tracer) or isinstance(r, jax.core.Tracer):
        t = jnp.concatenate([r[1:][::-1], c])
    else:
        t = np.concatenate(
            [np.asarray(r, np.float32)[1:][::-1], np.asarray(c, np.float32)]
        )
    m = _fft_len(2 * n - 1)  # aliasing only corrupts the discarded prefix
    Tf = _spectrum_operand(_spectrum_rfft(t, m))

    def matvec(x: jax.Array) -> jax.Array:
        z = jnp.fft.irfft(Tf(x) * jnp.fft.rfft(x.astype(jnp.float32), m), m)
        return z[n - 1 : 2 * n - 1].astype(x.dtype)

    return matvec


def hilbert_matvec(n: int, dtype=jnp.float32):
    """The Hilbert matrix ``A[r][c] = 1/(r+c+1)`` as an O(n)-memory FFT
    operator — the benchmark family without its n² bytes."""
    h = 1.0 / jnp.arange(1, 2 * n, dtype=dtype)
    return hankel_matvec(h, n)


def circulant_matvec(c: jax.Array, n: int):
    """Matvec closure for the n×n circulant matrix ``A[i][j] =
    c[(i-j) mod n]`` (first column ``c``).

    Circulants diagonalize in the Fourier basis, so ``y = A x`` is the
    EXACT circular convolution ``irfft(rfft(c)·rfft(x))`` — no padding,
    no aliasing slice (the special case of Toeplitz where wraparound is
    the structure itself).  O(n log n) per matvec, O(n) memory.
    """
    if c.shape[0] != n:
        raise ValueError(f"need len(c) == n == {n}, got {c.shape[0]}")
    Cf = _spectrum_operand(_spectrum_rfft(c, n))

    def matvec(x: jax.Array) -> jax.Array:
        z = jnp.fft.irfft(Cf(x) * jnp.fft.rfft(x.astype(jnp.float32)), n)
        return z.astype(x.dtype)

    return matvec


def low_rank_matvec(U: jax.Array, V: jax.Array, diag: jax.Array | None = None):
    """Matvec closure for ``A = U Vᵀ (+ diag)`` — a positive rank-k
    matrix (plus an optional elementwise-nonnegative diagonal), never
    materialized.

    ``y = U (Vᵀ x) + diag·x`` is two skinny matmuls, O(n·k) FLOPs and
    O(n·k) memory vs the dense pass's O(n²) — and like
    :func:`kron_matvec` the matmuls land on the MXU.  Positivity
    contract (the solver requires a positive A,
    similarity_transform.hpp:4-5 semantics): every entry of ``U Vᵀ``
    must be > 0 — entrywise-positive ``U`` and ``V`` suffice — and
    ``diag``, if given, must be ≥ 0 elementwise.  Rank-one positive
    updates of a known operator (e.g. teleportation terms in
    PageRank-style chains) are the canonical use.
    """
    n, k = U.shape
    n2, k2 = V.shape
    if n != n2 or k != k2:
        raise ValueError(f"need U and V both n×k, got {U.shape} and {V.shape}")
    if diag is not None and diag.shape != (n,):
        raise ValueError(f"need diag of shape ({n},), got {diag.shape}")

    def matvec(x: jax.Array) -> jax.Array:
        # f32-pinned matmuls: default MXU precision breaks the absolute-eps
        # stop for λ ≳ 1 (see _matmul_f32).
        y = _matmul_f32(U, _matmul_f32(V.T, x)).astype(x.dtype)
        return y if diag is None else y + diag * x

    return matvec


def sparse_matvec(A_sp):
    """Matvec closure for a ``jax.experimental.sparse.BCOO`` matrix —
    O(nnz) per round instead of the dense pass's O(n²).

    Positivity contract: the similarity-transform method's convergence
    theory assumes a POSITIVE matrix (similarity_transform.hpp comments;
    SURVEY.md §0), and a sparse matrix is at best NONNEGATIVE.  The
    iteration remains well-defined (all iterates stay positive) whenever
    every row has at least one positive entry, and the row sums converge
    to λ_max whenever the matrix is primitive (irreducible + aperiodic —
    e.g. any irreducible matrix with a positive diagonal entry).  For
    merely irreducible-periodic matrices the row-sum sequence oscillates
    and the solve hits the MAX_ITR cap (``converged=False``) — the same
    failure surface the dense solver has for that input.

    TPU note: BCOO matvec lowers to gather/segment-sum — correct and
    jit-compatible everywhere, but scalar-access heavy on TPU.  For
    bounded row degree, :func:`ell_matvec` is the TPU-native layout
    (dense vectorized gather, no scatter).
    """
    from jax.experimental import sparse as jsparse

    if not isinstance(A_sp, jsparse.BCOO):
        raise TypeError(f"need a jax.experimental.sparse.BCOO, got {type(A_sp)}")
    n, n2 = A_sp.shape
    if n != n2:
        raise ValueError(f"need a square matrix, got {A_sp.shape}")

    def matvec(x: jax.Array) -> jax.Array:
        return A_sp @ x

    return matvec


def ell_matvec(cols: jax.Array, vals: jax.Array):
    """Matvec closure for a sparse matrix in padded ELL row format — the
    TPU-NATIVE sparse layout: ``cols``/``vals`` are (n, k) with row ``i``
    holding its ≤k nonzeros ``A[i, cols[i, j]] = vals[i, j]`` (pad unused
    slots with ``vals = 0``; the padded ``cols`` entry is arbitrary, 0 by
    convention).

    ``y = (vals * x[cols]).sum(axis=1)`` is one dense vectorized gather
    plus a lane reduction — no scatter, no segment sums, static shapes —
    which is why ELL beats COO/CSR on vector hardware whenever the row
    degree is bounded.  O(n·k) per round.  Positivity contract as in
    :func:`sparse_matvec` (rows must not be all-padding).
    """
    if cols.shape != vals.shape or cols.ndim != 2:
        raise ValueError(
            f"need matching (n, k) cols/vals, got {cols.shape} and {vals.shape}"
        )

    def matvec(x: jax.Array) -> jax.Array:
        return jnp.sum(vals * x[cols], axis=1)

    return matvec


def ell_from_coo(rows, cols, vals, n: int):
    """Pack COO triplets into the padded (cols, vals) ELL arrays of
    :func:`ell_matvec` (host-side preprocessing, NumPy in, jax.Array out).
    k = max row degree; duplicate (row, col) entries land in separate
    slots, so the matvec's lane reduction sums them.

    Fully vectorized (argsort + cumsum + one fancy-indexed scatter): the
    dims this sparse path exists for are 10⁵–10⁶ rows, where a Python
    per-row loop would take minutes.
    """
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    if len(rows) and (rows.min() < 0 or rows.max() >= n):
        raise ValueError(f"row indices must be in [0, {n}), got [{rows.min()}, {rows.max()}]")
    if len(cols) and (cols.min() < 0 or cols.max() >= n):
        raise ValueError(f"col indices must be in [0, {n}), got [{cols.min()}, {cols.max()}]")
    order = np.argsort(rows, kind="stable")
    rows_s, cols_s, vals_s = rows[order], cols[order], np.asarray(vals)[order]
    counts = np.bincount(rows_s, minlength=n) if len(rows) else np.zeros(n, np.int64)
    k = int(counts.max()) if len(rows) else 1
    ell_cols = np.zeros((n, max(k, 1)), np.int32)
    ell_vals = np.zeros((n, max(k, 1)), np.float32)
    if len(rows):
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        slot = np.arange(len(rows_s)) - starts[rows_s]  # position within row
        ell_cols[rows_s, slot] = cols_s
        ell_vals[rows_s, slot] = vals_s
    return jnp.asarray(ell_cols), jnp.asarray(ell_vals)


def add_matvec(*matvecs):
    """Operator sum: the matvec of ``A₁ + A₂ + …`` from the constituent
    matvecs.  Sums of positive (or nonnegative, per the sparse contract)
    operators are positive — the composition rule that lets structured
    parts combine without materializing anything (e.g. sparse + rank-one
    teleportation = the PageRank operator, examples/pagerank.py)."""
    if not matvecs:
        raise ValueError("need at least one matvec")

    def matvec(x: jax.Array) -> jax.Array:
        y = matvecs[0](x)
        for mv in matvecs[1:]:
            y = y + mv(x)
        return y

    return matvec


def scale_matvec(matvec, alpha: float):
    """Operator scaling: the matvec of ``α·A`` (α > 0 preserves
    positivity and scales λ_max by exactly α — the eigenvector is
    unchanged, a useful normalization for operators whose λ would
    over/underflow reduced-precision state)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 to preserve positivity, got {alpha}")

    def scaled(x: jax.Array) -> jax.Array:
        return alpha * matvec(x)

    return scaled


def kron_matvec(B: jax.Array, C: jax.Array):
    """Matvec closure for the Kronecker product ``A = B ⊗ C`` (B p×p,
    C q×q, A n×n with n = p·q) — never materialized.

    With x viewed row-major as the p×q matrix X (``x[i·q + j] = X[i,j]``),
    ``(B ⊗ C) x = vec(B X Cᵀ)``: two dense matmuls, O(pq(p+q)) FLOPs vs
    the dense pass's O(p²q²) — and unlike the FFT operators these run ON
    THE MXU (the systolic array), so large Kronecker-structured solves
    are compute-dense, not bandwidth-bound.  B, C positive ⇒ A positive
    (entrywise product of positives), and λ_max(A) = λ_max(B)·λ_max(C) —
    tests pin that identity against the dense solve.
    """
    p, p2 = B.shape
    q, q2 = C.shape
    if p != p2 or q != q2:
        raise ValueError(f"need square factors, got {B.shape} and {C.shape}")

    def matvec(x: jax.Array) -> jax.Array:
        X = x.reshape(p, q)
        # f32-pinned matmuls: at the λ = λ_B·λ_C scales Kronecker products
        # reach (10²–10³ for random positive factors), default MXU bf16
        # multiplies leave row-sum noise ≫ the absolute eps=1e-3 stop and
        # the solve exhausts MAX_ITR on TPU (see _matmul_f32).
        Y = _matmul_f32(_matmul_f32(B, X), C.T)
        return Y.reshape(-1).astype(x.dtype)

    return matvec
