"""Injected-regression dry run for the round-4 multiround hardware gate
(tests/test_tpu_hw.py::TestHardwarePerfGate::test_multiround_headline_gate).

VERDICT r3 item 2's done-criterion: an injected multiround regression must
FAIL a test.  The gate has two teeth; this experiment drives a real
regression through both, interleaved in one process so every arm sees the
same chip state:

  * arm A — healthy: multiround, exact-fit chunk (18 at 8192²) = ONE
    kernel invocation per solve, 256-row stripes.
  * arm B — injected STREAMING regression: block_rows=8 stripes make
    every A-block DMA 8×8192×4 B = 256 KB of strided traffic — measured
    8.66 ms/solve (+35%) vs the healthy 6.40.  (A forced chunk=1 was
    tried first and measures only ~+0.1 ms — round 3's "~50 µs/round
    restart" was mostly chip-state lottery, so invocation count is NOT
    a gateable regression class; inefficient block streaming is.)
  * arm C — the matvec-loop chain (the gate's A/B reference).

The first dry run also demonstrated WHY the A/B invariant must use
per-rep deltas, not independent per-arm minima: a chip-state flip
during one arm's slot produced a physically-impossible 5.70 ms minimum
for that arm (below the 18-pass floor at the session's marginal).

Expected: median(A−C) ≤ 0.10 (gate passes), median(B−C) > 0.10 (gate
FAILS the injected regression), and min(B) also exceeds the chip-state
bound.  Output: exp_multiround_gate_dryrun.out.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scratch/exp_multiround_gate_dryrun.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from eigen_value_tpu import fixtures
from eigen_value_tpu.config import EPS, MAX_ITR
from eigen_value_tpu.device import matvec_blocks
from eigen_value_tpu.ops.pallas import kernels
from eigen_value_tpu.ops.solver_matvec import solve_matvec_loop, solve_multiround
from eigen_value_tpu.utils.timing import time_marginal

DIM = 8192
tpu = jax.devices("tpu")[0]
H = jax.device_put(np.asarray(fixtures.hilbert_matrix(DIM)), tpu)
br, bc = matvec_blocks(DIM)
CHUNK = fixtures.HILBERT_ROUNDS[DIM] + 1


def chain_multiround(k, block_rows=256):
    @jax.jit
    def run(H):
        def body(i, acc):
            s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
            ev0 = jnp.ones((DIM,), jnp.float32) * s
            return solve_multiround(
                H, EPS, MAX_ITR, chunk=CHUNK, block_rows=block_rows, ev0=ev0
            ).eigenvalue

        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    return run


def chain_loop(k):
    @jax.jit
    def run(H):
        def body(i, acc):
            s = jnp.float32(1.0) + acc * jnp.float32(1e-38)

            def matvec(ev):
                return kernels.matvec(H, ev, block_rows=br, block_cols=bc) / ev

            ev0 = jnp.ones((DIM,), jnp.float32) * s
            return solve_matvec_loop(H, matvec, EPS, MAX_ITR, ev0=ev0).eigenvalue

        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    return run


arms = {
    "A_multiround_healthy": (chain_multiround(9), chain_multiround(1)),
    "B_injected_br8": (chain_multiround(9, 8), chain_multiround(1, 8)),
    "C_matvec_loop": (chain_loop(9), chain_loop(1)),
}
for long, short in arms.values():
    float(np.asarray(long(H)))
    float(np.asarray(short(H)))


def pass_step(i, s):
    Hi, xi = s
    return (Hi, kernels.matvec(Hi, xi, block_rows=br, block_cols=bc))


x = jax.device_put(np.ones(DIM, np.float32), tpu)
pass_before = time_marginal(pass_step, (H, x), k=64)

REPS = 9
samples = {k: [] for k in arms}
for rep in range(REPS):
    for name, (long, short) in arms.items():
        t0 = time.perf_counter()
        float(np.asarray(long(H)))
        tl = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        float(np.asarray(short(H)))
        ts = (time.perf_counter() - t0) * 1e3
        samples[name].append((tl - ts) / 8)

pass_after = time_marginal(pass_step, (H, x), k=64)
pass_ms = max(pass_before, pass_after)
bound = 18 * pass_ms * 1.10 + 0.25

print(f"pass marginal before/after: {pass_before*1e3:.0f}/{pass_after*1e3:.0f} us")
print(f"chip-state bound: {bound:.3f} ms")
for name, ss in samples.items():
    print(f"{name}: min {min(ss):.3f} ms/solve, per-rep "
          + " ".join(f"{s:.3f}" for s in ss))

# A/B via PER-REP deltas: both arms inside one rep see the same chip
# state (each rep is ~0.5 s; the state drifts on minutes), so a
# regression shifts every rep's delta while drift cancels.  Median
# across reps rejects the occasional within-rep state flip.
def median(xs):
    s = sorted(xs)
    return (s[(len(s) - 1) // 2] + s[len(s) // 2]) / 2


dA = [a - c for a, c in zip(samples["A_multiround_healthy"], samples["C_matvec_loop"])]
dB = [b - c for b, c in zip(samples["B_injected_br8"], samples["C_matvec_loop"])]
print(f"per-rep delta A-C: " + " ".join(f"{d:+.3f}" for d in dA))
print(f"per-rep delta B-C: " + " ".join(f"{d:+.3f}" for d in dB))
print(f"gate A/B invariant (healthy):  median(A-C)={median(dA):+.3f} <= 0.10 -> "
      f"{'PASS' if median(dA) <= 0.10 else 'FAIL'}")
print(f"gate A/B invariant (injected): median(B-C)={median(dB):+.3f} <= 0.10 -> "
      f"{'PASS (bad: regression undetected)' if median(dB) <= 0.10 else 'FAIL (good: gate catches it)'}")
b = min(samples["B_injected_br8"])
print(f"chip-state bound (injected):   min(B)={b:.3f} < {bound:.3f} -> "
      f"{'passes bound' if b < bound else 'fails bound too'}")
