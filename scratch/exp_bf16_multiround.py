"""A/B: bf16 storage fast mode — plain jnp.dot loop (solve_matvec_storage)
vs the multiround kernel with bf16 storage.  Chained, interleaved.
bf16 rounds at 8192² measured 17 on this chip (parity luck, documented);
chunk=18 is the exact fit, chunk=19 the +1-safety arm.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from eigen_value_tpu import fixtures
from eigen_value_tpu.config import EPS, MAX_ITR
from eigen_value_tpu.ops.solver_matvec import solve_matvec_storage, solve_multiround

DIM = 8192
CHAIN = 9
REPEATS = 9


def _sync(x):
    return float(np.asarray(x))


def _min_ms(fn, reps=REPEATS):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best


def solve_storage(Hb, s):
    ev0 = jnp.ones((DIM,), jnp.float32) * s
    return solve_matvec_storage(
        Hb, EPS, MAX_ITR, storage_dtype=jnp.bfloat16, ev0=ev0
    ).eigenvalue


def make_multi(chunk):
    def solve(Hb, s):
        ev0 = jnp.ones((DIM,), jnp.float32) * s
        return solve_multiround(
            Hb, EPS, MAX_ITR, chunk=chunk, ev0=ev0, storage_dtype=jnp.bfloat16
        ).eigenvalue

    return solve


def chain(solve, k):
    @jax.jit
    def run(Hb):
        def step(i, acc):
            s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
            return solve(Hb, s)

        return lax.fori_loop(0, k, step, jnp.float32(0.0))

    return run


def measure(pair, name, Hb):
    long, short = pair
    lam = _sync(long(Hb))
    tl = _min_ms(lambda: _sync(long(Hb)))
    ts = _min_ms(lambda: _sync(short(Hb)))
    ms = (tl - ts) / (CHAIN - 1)
    print(f"  {name}: {ms:7.3f} ms/solve (lam={lam:.5f})", flush=True)
    return ms


if __name__ == "__main__":
    Hb = jax.block_until_ready(fixtures.hilbert_matrix(DIM).astype(jnp.bfloat16))
    # round-count check first (chunk sizing depends on it)
    r = solve_multiround(Hb, EPS, MAX_ITR, chunk=19, storage_dtype=jnp.bfloat16)
    print(f"bf16 multiround rounds: {int(r.rounds)} lam {float(r.eigenvalue):.5f}", flush=True)
    arms = [
        ("storage    ", solve_storage),
        ("multi18bf16", make_multi(18)),
        ("multi19bf16", make_multi(19)),
    ]
    pairs = {n: (chain(f, CHAIN), chain(f, 1)) for n, f in arms}
    for cyc in range(3):
        print(f"cycle {cyc}:", flush=True)
        for n, _f in arms:
            measure(pairs[n], n, Hb)
