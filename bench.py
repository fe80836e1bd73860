"""Headline benchmark: 8192² Hilbert end-to-end solve on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 126 ms / 17 rounds — the reference's best machine (Xeon Platinum
8358, reference README.md:92; see BASELINE.md).  vs_baseline is the speedup
factor (baseline_ms / our_ms), so >1 beats the reference.
"""

import json
import sys

import jax

BASELINE_MS = 126.0  # reference best-CPU 8192² e2e (BASELINE.md)
DIM = 8192
ROUNDS_EXPECTED = 17
REPEATS = 5


def main() -> None:
    from eigen_value_tpu import EigenValue, SolverConfig, fixtures

    cfg = SolverConfig(backend="auto")
    ev = EigenValue(cfg)
    H = jax.block_until_ready(fixtures.hilbert_matrix(DIM))

    # First call compiles via the class's AOT cache; time the rest.
    results = [ev.similarity_transform(H) for _ in range(1 + REPEATS)]
    best_ms = min(r[2] for r in results[1:])
    rounds = results[-1][3]

    if rounds != ROUNDS_EXPECTED:
        print(
            f"WARNING: round-count parity broken: {rounds} != {ROUNDS_EXPECTED}",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "hilbert_8192_e2e",
                "value": round(best_ms, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / best_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
