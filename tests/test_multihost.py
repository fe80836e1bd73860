"""Real multi-process multi-host test.

The reference is single-device; multi-host row-partitioned solving is a
capability the TPU build adds (SURVEY.md §2/§5).  This test exercises the
FULL multi-host path — ``jax.distributed.initialize`` process-group
bootstrap, host-local data placement (each process materializes only its
own row block), global-array assembly, and the shard_map solve — with two
actual OS processes of 4 virtual CPU devices each, the CI stand-in for two
TPU hosts (DCN boundary = process boundary).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from eigen_value_tpu import fixtures
from eigen_value_tpu.reference_impl import parallel_oracle

DIM = 256


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize("solver", ["gather", "ring", "2d"])
def test_two_process_solve_parity(solver):
    port = _free_port()
    from conftest import subprocess_env

    env = subprocess_env()
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "eigen_value_tpu.bench.mh_worker",
                "--reps",
                "1",
                "--process-id",
                str(pid),
                "--num-processes",
                "2",
                "--coordinator",
                f"127.0.0.1:{port}",
                "--dim",
                str(DIM),
                "--solver",
                solver,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
            outs.append(json.loads(out.strip().splitlines()[-1]))
    finally:
        # a failed/timed-out worker must not leave its sibling blocked
        # forever in jax.distributed.initialize
        for q in procs:
            if q.poll() is None:
                q.kill()
                q.wait()

    oracle = parallel_oracle(np.asarray(fixtures.hilbert_matrix(DIM)))
    for res in outs:
        assert res["num_processes"] == 2
        assert res["global_devices"] == 8
        assert res["converged"]
        assert res["rounds"] == fixtures.HILBERT_ROUNDS[DIM]
        assert res["eigenvalue"] == pytest.approx(oracle.eigenvalue, abs=1e-3)
        assert res["residual"] < 1e-3
    # λ must be bit-identical across processes (replicated readout).
    assert outs[0]["eigenvalue"] == outs[1]["eigenvalue"]
