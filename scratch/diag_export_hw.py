"""One-shot diagnostic for the exported-artifact hardware failure
(test_exported_artifact_runs_on_hardware raised ValueError on the
2026-08-17 21:57 run; the message was lost to a tail-20 pipe).

Run on a HEALTHY tunnel:  timeout 600 python scratch/diag_export_hw.py

Prints every fact needed to pick the fix without a second window:
  * what the backend/device report as their platform names (the
    exported-call check compares the caller's LOWERING platform —
    xb.canonicalize_platform of the backend — against exported.platforms,
    jax _export.py:1667-1681, so a plugin whose registered name differs
    from its device platform fails exactly there);
  * whether export itself succeeds and for which platforms;
  * whether serialize/deserialize round-trips;
  * the full traceback of the .call, stage by stage.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    from jax._src import xla_bridge as xb

    from eigen_value_tpu import fixtures
    from eigen_value_tpu.config import SolverConfig
    from eigen_value_tpu.utils import aot

    dev = jax.devices()[0]
    print("device:", dev, "| device.platform:", dev.platform)
    print("default_backend():", xb.default_backend())
    print("canonicalize(default):", xb.canonicalize_platform(xb.default_backend()))
    try:
        from jax import export as jexport

        print("default_export_platform():", jexport.default_export_platform())
    except Exception as e:
        print("default_export_platform failed:", e)

    cfg = SolverConfig(backend="matvec_pallas", interpret=False)
    A = np.asarray(fixtures.hilbert_matrix(1024))

    for plats in (("tpu",), None):
        label = f"platforms={plats}"
        try:
            exp = aot.export_solver(1024, cfg, platforms=plats)
            print(f"[{label}] export OK; exported.platforms={exp.platforms} "
                  f"nr_devices={exp.nr_devices}")
        except Exception:
            print(f"[{label}] EXPORT FAILED:")
            traceback.print_exc()
            continue
        try:
            path = aot.save_exported(exp, f"/tmp/diag_solver_{plats is None}.bin")
            loaded = aot.load_exported(path)
            print(f"[{label}] serialize/deserialize OK")
        except Exception:
            print(f"[{label}] SERIALIZE/DESERIALIZE FAILED:")
            traceback.print_exc()
            continue
        try:
            res = loaded.call(A)
            print(f"[{label}] call OK: rounds={int(res.rounds)} "
                  f"lambda={float(res.eigenvalue):.6f}")
        except Exception:
            print(f"[{label}] CALL FAILED:")
            traceback.print_exc()


if __name__ == "__main__":
    main()
