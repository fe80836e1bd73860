"""Checkpoint / resume of an in-flight solve.

The reference has no checkpointing (solves run in ms–s; SURVEY.md §5), but
its iteration state is tiny and well-defined.  Here the production
(matvec-form, ops/solver_matvec.py) solver state is a first-class pytree —
``(A₀, ev, v, λ, rounds, done)`` — that can be stepped a bounded number of
rounds at a time, snapshotted to disk between steps, and resumed
bit-exactly: chunked stepping replays the identical op sequence as the
one-shot ``lax.while_loop``, so a solve split across process restarts
returns the same eigenvalue, eigenvector, and round count.

Intended for very large solves (the matvec form solves 65536² matrices
where a single step is minutes of work on preemptible capacity) and for
the driver pattern: ``step → save → (maybe die) → load → step``.

The state composes with sharding: pass a row-sharded ``A``
(``NamedSharding(mesh, P("rows", None))``) and ``init_state``/``step``
run partitioned under GSPMD with results bit-identical to the
single-device path (tested) — checkpointed solves scale to multi-chip
unchanged.

Formats: ``.npz`` (single-host, no extra deps) and Orbax (sharded
multi-host state, optional).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .config import EPS, MAX_ITR
from .ops.solver import SolveResult, stop_check


class SolverState(NamedTuple):
    """Resumable state of a matvec-form solve.

    ``A`` is the ORIGINAL matrix (the matvec form never mutates it —
    solver_matvec.py); ``v`` is the row-sum vector of the CURRENT iterate;
    ``rounds`` follows the reference's 0-based parallel counting
    (similarity_transform.cpp:39-54).
    """

    A: jax.Array
    ev: jax.Array
    v: jax.Array
    lam: jax.Array
    rounds: jax.Array
    done: jax.Array


@jax.jit
def init_state(A: jax.Array) -> SolverState:
    """Start a solve: ev = 1, v = row sums of A (initialise_eigen_vector +
    first sum_across_rows of the reference loop)."""
    n = A.shape[0]
    dtype = A.dtype
    ev0 = jnp.ones((n,), dtype)
    v0 = (A @ ev0) / ev0
    return SolverState(
        A,
        ev0,
        v0,
        jnp.asarray(0.0, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )


@partial(jax.jit, static_argnames=("eps", "max_itr"), donate_argnums=(0,))
def step(
    state: SolverState,
    num_rounds: jax.Array,
    eps: float = EPS,
    max_itr: int = MAX_ITR,
) -> SolverState:
    """Advance the solve by at most ``num_rounds`` rounds (on device, one
    executable).  A no-op once ``done`` or the global ``max_itr`` cap is
    reached.  Stepping in chunks of k then k' is bit-identical to one
    chunk of k+k': the body is the exact solver_matvec.py round.

    The input ``state`` is DONATED (its buffers are reused for the output
    so stepping never holds two copies of A) — use the returned state.
    """
    A = state.A

    def matvec(ev):
        return (A @ ev) / ev

    def cond(c):
        st, j = c
        return (
            jnp.logical_not(st.done)
            & (st.rounds < max_itr)
            & (j < num_rounds)
        )

    def body(c):
        st, j = c
        v = st.v
        m = jnp.max(v)
        ev = st.ev * (v / m)
        done = stop_check(v, eps)
        lam = v[0]
        v = lax.cond(done, lambda e: st.v, matvec, ev)
        i = jnp.where(done, st.rounds, st.rounds + 1)
        return SolverState(st.A, ev, v, lam, i, done), j + 1

    out, _ = lax.while_loop(cond, body, (state, jnp.asarray(0, jnp.int32)))
    return out


def to_result(state: SolverState) -> SolveResult:
    """Project the state onto the public result pytree."""
    return SolveResult(state.lam, state.ev, state.rounds, state.done)


def solve_checkpointed(
    A: jax.Array,
    chunk_rounds: int = 8,
    checkpoint_path: Optional[str] = None,
    eps: float = EPS,
    max_itr: int = MAX_ITR,
) -> SolveResult:
    """Run a full solve in ``chunk_rounds``-round steps, optionally saving
    an ``.npz`` snapshot after every chunk (the preemption-tolerant driver
    loop).  Resumes automatically if ``checkpoint_path`` already exists —
    after verifying the snapshot was taken for THIS matrix (shape, dtype,
    and boundary-row equality); a stale snapshot from a different solve
    raises instead of silently returning the wrong result."""
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        state = load_state(checkpoint_path)
        _check_same_matrix(state.A, A, checkpoint_path)
    else:
        state = init_state(A)
    while not bool(state.done) and int(state.rounds) < max_itr:
        state = jax.block_until_ready(step(state, chunk_rounds, eps, max_itr))
        if checkpoint_path is not None:
            save_state(checkpoint_path, state)
    return to_result(state)


def _check_same_matrix(saved: jax.Array, given, path: str) -> None:
    """Cheap identity check between a snapshot's matrix and the caller's:
    shape, dtype, and exact equality of the first and last rows (O(n), not
    O(n²) — sufficient to catch a reused checkpoint path in practice)."""
    given = jnp.asarray(given)
    if saved.shape != given.shape or saved.dtype != given.dtype:
        raise ValueError(
            f"checkpoint {path!r} holds a {saved.dtype} {saved.shape} matrix "
            f"but the solve was called with {given.dtype} {given.shape}"
        )
    for row in (0, -1):
        if not np.array_equal(np.asarray(saved[row]), np.asarray(given[row])):
            raise ValueError(
                f"checkpoint {path!r} was created for a different matrix "
                f"(row {row} differs) — pass a fresh checkpoint_path"
            )


# ---------------------------------------------------------------- storage

_FIELDS = SolverState._fields


def save_state(path: str, state: SolverState) -> None:
    """Snapshot to a single ``.npz`` (atomic rename; single-host sizes)."""
    arrs = {k: np.asarray(v) for k, v in zip(_FIELDS, state)}
    tmp = f"{path}.tmp.{os.getpid()}.npz"  # np.savez appends .npz otherwise
    np.savez(tmp, **arrs)
    os.replace(tmp, path)


def load_state(path: str) -> SolverState:
    """Load an ``.npz`` snapshot saved by :func:`save_state`."""
    with np.load(path) as z:
        return SolverState(*(jnp.asarray(z[k]) for k in _FIELDS))


def save_state_orbax(path: str, state: SolverState) -> None:
    """Snapshot via Orbax (handles sharded/multi-host state; optional dep)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), dict(state._asdict()), force=True)


def load_state_orbax(path: str, template: SolverState) -> SolverState:
    """Restore an Orbax snapshot; ``template`` supplies shapes/shardings
    (e.g. ``jax.eval_shape``-style abstract state or a freshly built one)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.abspath(path), target=dict(template._asdict())
        )
    return SolverState(**restored)
