"""Benchmark CLI — `python -m eigen_value_tpu.bench`.

Reproduces the reference driver's report shape (main.cpp:7-162: e2e sweep
table then per-kernel sweeps, fixed-width `dim x dim   ms   rounds` rows —
README.md:64-76) so side-by-side diffing against the reference README is
trivial, plus bandwidth/roofline columns.
"""

from __future__ import annotations

import argparse
import json
import sys


def _fmt_e2e(rows) -> str:
    out = []
    backend = None
    for r in rows:
        if r["backend"] != backend:
            backend = r["backend"]
            out.append(f"\nSimilarity Transform (backend: {backend})\n")
        if "skipped" in r:  # e.g. sym rung at an unalignable dim
            out.append(
                f"{r['dim']:<5} x {r['dim']:>5}\t\tskipped: {r['skipped']}"
            )
            continue
        parity = "" if r["rounds_ok"] else "   [PARITY BREAK]"
        dev = (
            f"{r['device_ms']:.3f} ms"
            if r["device_ms"] is not None
            else "below chain resolution"
        )
        out.append(
            f"{r['dim']:<5} x {r['dim']:>5}\t\t{r['ms']:>10.3f} ms"
            f"\t\t{r['rounds']:>6} round(s)"
            f"\t\t(device {dev}, chained){parity}"
        )
    return "\n".join(out)


def _fmt_kernels(rows, size_key="dim") -> str:
    out = []
    kernel = None
    rows = sorted(rows, key=lambda r: (r["kernel"], r[size_key]))
    for r in rows:
        if r["kernel"] != kernel:
            kernel = r["kernel"]
            out.append(f"\n{kernel}\n")
        gbps = r.get("gbps")
        gb = f"{gbps:>8.0f} GB/s" if gbps is not None and "gbps" in r else " " * 13
        roof = r.get("roofline_pct")
        roof_s = f"{roof:>6.1f}% roofline" if roof is not None else ""
        out.append(
            f"{r[size_key]:<10}\t\t{r['ms'] * 1e3:>10.1f} us\t{gb}\t{roof_s}"
        )
    return "\n".join(out)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="eigen_value_tpu.bench")
    p.add_argument(
        "--suite",
        choices=[
            "e2e",
            "kernels",
            "vector",
            "sharded",
            "multihost",
            "native",
            "model",
            "calibrate",
            "drift",
            "operator",
            "batched",
            "large",
            "all",
        ],
        default="all",
    )
    p.add_argument(
        "--windows",
        type=int,
        default=10,
        help="measurement windows for --suite drift",
    )
    p.add_argument(
        "--gap-s",
        type=float,
        default=20.0,
        help="seconds between drift windows",
    )
    p.add_argument("--dims", type=int, nargs="*", help="matrix dims to sweep")
    p.add_argument(
        "--sizes",
        type=int,
        nargs="*",
        help="vector sizes for --suite vector (default 2^16..2^25; on CPU "
        "the interpret-mode 2^25 rows take minutes — pass smaller sizes)",
    )
    p.add_argument("--backends", nargs="*", help="e2e backends to run")
    p.add_argument(
        "--batch",
        type=int,
        help="batch size for --suite batched (default 256, config 4)",
    )
    p.add_argument("--json", action="store_true", help="emit JSON lines")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument(
        "--device",
        choices=["cpu", "tpu"],
        help="pin the default device (default: platform default)",
    )
    p.add_argument(
        "--cpu-devices",
        type=int,
        default=8,
        help="virtual CPU device count (applies with --device cpu, before jax init)",
    )
    args = p.parse_args(argv)

    if args.device == "cpu":
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu_devices}"
            ).strip()
        # CPU runs must work while the remote-TPU tunnel is wedged or busy
        # (and must not serialize against a concurrent TPU bench through
        # the tunnel): make this interpreter CPU-only before backend init.
        from ..device import unregister_remote_tpu_plugin

        unregister_remote_tpu_plugin()
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.device:
        import jax

        jax.config.update("jax_default_device", jax.devices(args.device)[0])

    from . import suite

    dims = args.dims or suite.MATRIX_DIMS
    all_rows = []
    if args.suite in ("e2e", "all"):
        rows = suite.bench_e2e(dims, backends=args.backends, reps=args.reps)
        all_rows += rows
        if not args.json:
            print(_fmt_e2e(rows))
    if args.suite in ("kernels", "all"):
        rows = suite.bench_kernels(dims)
        all_rows += rows
        if not args.json:
            print(_fmt_kernels(rows))
    if args.suite == "native":
        rows = suite.bench_native(dims)
        all_rows += rows
        if not args.json:
            for r in rows:
                if r["bench"] == "native_kernel":
                    print(
                        f"{r['kernel']:<24} {r['dim']:<6}"
                        f"{r['ms'] * 1e3:>12.1f} us   [native C++]"
                    )
                else:
                    print(
                        f"[{r['backend']}] {r['dim']:<5} x {r['dim']:>5}"
                        f"\t{r['ms']:>10.3f} ms"
                        f"\t\t{r['rounds']:>6} round(s)   [native C++]"
                    )
    if args.suite == "operator":
        rows = suite.bench_operator(dims, reps=args.reps)
        all_rows += rows
        if not args.json:
            for r in rows:
                parity = "" if r.get("rounds_ok", True) else "   [PARITY BREAK]"
                dev = (
                    f"{r['device_ms']:>10.4f} ms dev (chained)"
                    if r["device_ms"] is not None
                    else "  below chain resolution  "
                )
                print(
                    f"[{r['backend']}] {r['dim']:<5} x {r['dim']:>5}"
                    f"\t{dev}"
                    f"\t{r['rounds']:>4} round(s){parity}"
                )
    if args.suite == "batched":
        kw = {}
        if args.dims:
            kw["dim"] = args.dims[0]
        if args.batch:
            kw["batch"] = args.batch
        rows = suite.bench_batched(reps=args.reps, **kw)
        all_rows += rows
        if not args.json:
            for r in rows:
                print(
                    f"[batched] {r['batch']} x {r['dim']}^2: "
                    f"{r['device_ms_per_batch']:.2f} ms/batch dev, "
                    f"{r['solves_per_s']:.0f} solves/s, rounds {r['rounds_hist']}, "
                    f"max resid {r['max_rel_residual']:.1e}"
                    + ("" if r["rounds_ok"] else "   [CHECK FAILED]")
                )
    if args.suite == "large":
        rows = suite.bench_large(reps=args.reps)
        all_rows += rows
        if not args.json:
            for r in rows:
                if "error" in r:
                    print(f"[large:{r['backend']}] ERROR: {r['error']}")
                else:
                    print(
                        f"[large:{r['backend']}] {r['dim']} x {r['dim']}: "
                        f"{r['device_ms']:.1f} ms dev, {r['rounds']} round(s), "
                        f"lam {r['eigenvalue']:.5f}"
                        + ("" if r["rounds_ok"] else "   [CHECK FAILED]")
                    )
    if args.suite == "sharded":
        rows = suite.bench_sharded(dim=(args.dims or [4096])[0], reps=args.reps)
        all_rows += rows
        if not args.json:
            for r in rows:
                print(
                    f"[{r['solver']}] {r['dim']} x {r['dim']} on "
                    f"{r['shards']} shard(s): "
                    f"{r['device_ms']:.2f} ms dev, {r['rounds']} round(s), "
                    f"{r['elems_per_s_per_chip']:.2e} elems/s/chip, "
                    f"eff {r['scaling_efficiency'] * 100:.0f}%"
                )
    if args.suite == "multihost":
        rows = suite.bench_multihost(dim=(args.dims or [2048])[0], reps=args.reps)
        all_rows += rows
        if not args.json:
            for r in rows:
                print(
                    f"[{r.get('solver', 'gather')}] "
                    f"{r['processes']} process(es) x "
                    f"{r['global_devices'] // r['processes']} device(s): "
                    f"{r['dim']} x {r['dim']}  {r['ms']:.2f} ms, "
                    f"{r['rounds']} round(s), {r['elems_per_s']:.2e} elems/s, "
                    f"eff {r['scaling_efficiency'] * 100:.0f}%"
                )
    if args.suite == "model":
        from ..utils.scaling_model import prediction_table, sensitivity_table

        rows = prediction_table(dims=args.dims or [8192, 32768, 65536])
        sens = sensitivity_table()
        all_rows += rows + sens
        if not args.json:
            print(
                "Predicted multi-chip scaling (ANALYTICAL MODEL anchored to"
                " measured 1-chip numbers — not a measurement)\n"
            )
            for r in rows:
                print(
                    f"[{r['solver']}] {r['dim']}² on {r['chips']:>3} chip(s) / "
                    f"{r['hosts']:>2} host(s): {r['round_us']:>9.1f} us/round, "
                    f"eff {r['efficiency'] * 100:5.1f}%"
                )
            print(
                "\nSensitivity of predicted efficiency to the UNVALIDATED"
                " ici parameters (bandwidth 100-800 GB/s, latency 0.5-25 us):"
            )
            for r in sens:
                print(
                    f"[{r['solver']}] {r['dim']}² on {r['chips']:>3} chips: "
                    f"ici {r['ici_gbps']:>5.0f} GB/s, {r['ici_latency_us']:>4.1f} us"
                    f" -> eff {r['efficiency'] * 100:5.1f}%"
                )
    if args.suite == "calibrate":
        rows = suite.bench_exchange_calibration(
            dim=(args.dims or [8192])[0], reps=args.reps
        )
        all_rows += rows
        if not args.json:
            for r in rows:
                if r["bench"] in ("model_calibration", "model_calibration_crossP"):
                    ratio = r["ratio"]
                    ratio_s = f"{ratio:.2f}" if ratio is not None else "n/a"
                    cross = (
                        f" [cross-P: fitted on {r['fitted_on_chips']} shards]"
                        if r["bench"] == "model_calibration_crossP"
                        else ""
                    )
                    print(
                        f"all_gather n={r['dim']:>7} over {r['chips']} shards: "
                        f"measured {r['measured_us']:>9.1f} us, "
                        f"model (gloo-fitted spec) {r['predicted_us']:>9.1f} us, "
                        f"ratio {ratio_s}{cross}"
                    )
                else:
                    # fit_gbps is None in the latency-dominated regime
                    # (unresolvable slope) — the common case on loopback gloo
                    gbps = r["fit_gbps"]
                    gbps_s = f"{gbps:.3f} GB/s" if gbps is not None else (
                        "unresolvable (latency-dominated)"
                    )
                    print(
                        f"fitted gloo exchange: {gbps_s}, "
                        f"{r['fit_latency_us']:.1f} us/step"
                    )
    if args.suite == "drift":
        rows = suite.bench_drift(
            dim=(args.dims or [8192])[0], windows=args.windows, gap_s=args.gap_s
        )
        all_rows += rows
        if not args.json:
            for r in rows:
                if r["bench"] == "drift":
                    gbps = r["gbps"]
                    gbps_s = f"{gbps:>7.0f} GB/s" if gbps is not None else "   n/a"
                    sus = "  [SUSPECT: transport artifact]" if r["suspect"] else ""
                    print(
                        f"t+{r['t_s']:>6.1f}s  window {r['window']:>2}: "
                        f"{r['ms'] * 1e3:>8.1f} us/pass  {gbps_s}{sus}"
                    )
                else:
                    sp = r["spread_pct"]
                    sp_s = f"{sp:.1f}%" if sp is not None else "n/a"
                    print(
                        f"spread over {r['windows']} windows: {sp_s} "
                        f"(>5% = chip state drifted; cross-run absolute"
                        f" comparisons invalid)"
                    )
    if args.suite in ("vector", "all"):
        rows = suite.bench_vector_kernels(sizes=args.sizes or suite.VECTOR_SIZES)
        all_rows += rows
        if not args.json:
            print(_fmt_kernels(rows, size_key="size"))
    if args.json:
        for r in all_rows:
            print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
