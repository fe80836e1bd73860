"""Headline benchmark: 8192² Hilbert end-to-end solve on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: 126 ms / 17 rounds — the reference's best machine (Xeon Platinum
8358, reference README.md:92; see BASELINE.md).  vs_baseline is the
speedup factor (baseline_ms / our_ms), so >1 beats the reference.

``value`` is the on-device e2e solve time measured by CHAINED
differencing: one executable runs k data-dependent full solves, another
runs 1; per-solve time is (T_k − T_1)/(k−1), so the remote-TPU tunnel's
~30 ms per-executable launch latency (and its ±1.5 ms jitter, comparable
to the device time itself) cancels exactly.  The inter-solve dependence
is threaded through an O(n) scaling of the solver's internal vector —
mathematically a no-op (the iteration is scale-invariant in ev,
ops/solver_matvec.py) and costs no extra O(n²) traffic, but it defeats
loop-invariant hoisting so all k solves really execute.  What is timed
matches what the reference times: the full convergence loop on an
already-resident matrix (its clock starts after buffer setup,
similarity_transform.cpp:36).  Raw chain walls are in the JSON for
transparency.

Because the chip's sustained HBM state drifts on a minutes timescale
(see WINDOWS below), the measurement repeats in several spaced windows;
``value`` is the best window (min-of-reps convention) and every window's
reading plus the median is in the JSON so the spread is visible, along
with the drift suite's chip-state classification per window
(``classify_chip_state``) so a slow-state record explains itself.  When
none of the base windows catches the chip's fast state, sampling extends
adaptively (``should_extend``) up to EXTEND_BUDGET_S, capped by the wall
remaining before the supervisor's DEADLINE_S (``extension_budget``) —
the fast state can stay away for many minutes, and the record is only
comparable across rounds if each run had a real chance of seeing it.
The bf16 secondary metric is measured right after the base windows,
BEFORE any extension, and rides the SIGTERM partial-emission state: no
termination mode can drop it from the record.
"""

import json
import os
import signal
import sys
import threading
import time

# Worker exec epoch: the extension budget is measured against DEADLINE_S
# from HERE (process start), not from the first measurement window — jax
# init + Hilbert generation + compile + warmup over the tunnel cost
# 2-6 min and used to silently eat the "headroom" the old first-window
# clock claimed to leave, so the round-3 driver record was SIGTERM'd
# mid-extension and lost its bf16 secondary (BENCH_r03.json forensics,
# docs/BENCH_RESULTS.md round 4).  Captured BEFORE the jax/numpy imports
# (seconds of the supervisor's Popen clock; review r5c) so the budget's
# startup term matches the deadline clock as closely as the worker can.
T_EXEC = time.monotonic()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BASELINE_MS = 126.0  # reference best-CPU 8192² e2e (BASELINE.md)
# BENCH_DIM / BENCH_DEVICE are test knobs (drive the full path off-TPU at a
# small dim); the headline record is always the default 8192² on the TPU.
DIM = int(os.environ.get("BENCH_DIM", "8192"))
ROUNDS_EXPECTED = 17
CHAIN = 9  # solves in the long chain (noise on the diff divides by CHAIN-1)
REPEATS = 9
# The tunneled v5e drifts between a ~930 GB/s and a ~745 GB/s sustained-HBM
# state on a minutes timescale (docs/BENCH_RESULTS.md round 2; not load-
# induced — scratch/exp_preheat.py).  One measurement window (~1.5 s) sees
# exactly one state, so a single-window reading carries a ±10% chip-state
# lottery.  We therefore measure WINDOWS windows spaced WINDOW_GAP_S apart
# (spanning the drift timescale) and report the min — the standard
# best-observed convention — with every window's value in the JSON.
WINDOWS = int(os.environ.get("BENCH_WINDOWS", "8"))
WINDOW_GAP_S = float(os.environ.get("BENCH_WINDOW_GAP_S", "22"))
# Adaptive extension: the fast chip state can stay away for 10s of
# minutes (a whole observed day sat in the mid state), so a fixed 8
# windows (~3.5 min) often never sees it.  When the base windows all
# read above FAST_TARGET_MS — i.e. the chip never entered the state
# where the structural 18-pass floor (~5.9 ms) is reachable — keep
# sampling spaced windows until EXTEND_BUDGET_S from the first window.
# A fast reading stops the extension immediately (more sampling can't
# improve a min that already hit the target).  BENCH_WINDOWS=1 (quick
# mode) never extends.  The effective budget is capped so the worker
# finishes emitting BEFORE the supervisor's DEADLINE_S: see
# :func:`extension_budget` (the cap is measured from worker EXEC, so
# startup/compile time can no longer eat the emission headroom — the
# round-3 failure mode).
# FAST_TARGET_MS is DENSE-EQUIVALENT (the ms an 18-pass full-traffic
# solve reads in a mid/fast window); for HBM-bound backends the
# effective target scales by the traffic fraction (× 0.531 for the
# pure-streaming symmetric kernel → ~3.24 ms), so the env knob keeps
# one meaning across backends.  For the COMPUTE-bound cached backend
# (the round-5 headline) a traffic-scaled target sits below the VPU
# compute floor and can never be reached, so the fast-target exit is
# disabled there (NO_FAST_TARGET) and the extension ends on the
# bar-cleared exit or the budget.
FAST_TARGET_MS = float(os.environ.get("BENCH_FAST_TARGET_MS", "6.1"))
NO_FAST_TARGET = object()  # sentinel: disable should_extend's condition (a)
EXTEND_BUDGET_S = float(os.environ.get("BENCH_EXTEND_S", "900"))
# Bar-cleared early exit (VERDICT r4): when the best clean window already
# beats the 126 ms reference baseline by this factor, skip the extension
# entirely — the fast-state hunt can no longer change the verdict and
# only risks the driver's outer timeout.  The 20× bar × 1.5 margin.
# 0 disables the exit (always hunt, the round-4 behavior).
BAR_CLEARED_X = float(os.environ.get("BENCH_BAR_CLEARED_X", "30"))
# Wall reserved (from DEADLINE_S) for summarizing + printing the record
# and the supervisor's pipe read after the last extension window.
RESERVE_S = float(os.environ.get("BENCH_RESERVE_S", "75"))
# The bf16 secondary runs on a watchdog: a wedged-tunnel RPC never
# returns and must not delay the already-complete headline record
# (advisor r3 finding).
BF16_DEADLINE_S = float(os.environ.get("BENCH_BF16_DEADLINE_S", "180"))
# The remote-TPU tunnel can wedge entirely (a blocked RPC never returns, so
# no Python-level signal handler ever runs).  bench.py therefore supervises
# itself: the entry process re-execs a worker and enforces a wall deadline —
# SIGTERM first (the worker's handler emits the best-so-far JSON if any
# window completed), SIGKILL if it stays stuck in the hung C call.
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1200"))
# Wedge recovery: observed wedges last minutes to hours, and a round's
# headline record is too valuable to forfeit to one badly-timed wedge.
# When the FIRST worker attempt completes zero windows, the supervisor
# probes tunnel health every PROBE_GAP_S (subprocess-isolated, so a
# still-wedged tunnel can't hang it) for up to RETRY_BUDGET_S, and
# relaunches the worker once if the tunnel comes back.  RETRY_BUDGET_S=0
# disables the retry (the old emit-failure-immediately behavior).
PROBE_GAP_S = float(os.environ.get("BENCH_PROBE_GAP_S", "60"))
RETRY_BUDGET_S = float(os.environ.get("BENCH_RETRY_BUDGET_S", "900"))


def _sync(x) -> float:
    return float(np.asarray(x))


def physical_floor_ms(rounds, peak_gbps, dim=None, headroom=1.2, frac=1.0) -> float:
    """Fastest PHYSICALLY possible e2e solve time: (rounds+1) O(n²) passes
    at ``headroom``× the device's nameplate HBM bandwidth (the observed
    fast state sustains ~114% of the v5e nameplate; 120% is impossible).
    A reading below this is a transport artifact of the chained
    differencing — an inflated short-chain wall shrinking the diff — not
    a measurement (the drift suite flags the same artifact at the
    per-pass level, bench/suite.py).  NaN/unknown peak (e.g. CPU test
    mode) disables the guard (returns 0).

    ``frac`` is the backend's HBM traffic per pass as a fraction of the
    dense n²·4 bytes — 1.0 for the dense kernels, ~0.531 for the
    symmetric upper-triangle kernel (half the tiles + whole diagonal
    tiles).  Every physical bound in this file scales by it; forgetting
    it would mark every symmetric reading "suspect" (floor 2× too high)
    and classify slow-state windows as impossible >160% states."""
    n = DIM if dim is None else dim
    if not peak_gbps or peak_gbps != peak_gbps:  # falsy or NaN
        return 0.0
    passes = rounds + 1  # initial row-sum + one matvec per round
    return passes * n * n * 4 * frac / (peak_gbps * headroom * 1e6)


def _split_suspect(windows, floor_ms):
    clean = [w for w in windows if w[0] >= floor_ms]
    return clean, [w for w in windows if w[0] < floor_ms]


def extension_budget(
    extend_s, deadline_s, reserve_s, startup_s
) -> float:
    """Effective extension budget (seconds, measured from the FIRST
    window like ``should_extend``'s elapsed): the configured extension
    cap, further capped by the wall actually remaining before the
    supervisor's deadline — worker startup (jax init + matrix gen +
    compile + warmup, ``startup_s``) plus ``reserve_s`` of emission
    headroom are subtracted so a full extension can never run into the
    SIGTERM.  Pure so the policy is unit-testable."""
    return max(0.0, min(extend_s, deadline_s - reserve_s - startup_s))


def classify_chip_state(device_ms, rounds, peak_gbps, dim=None, frac=1.0):
    """HBM state implied by one headline window, via the SHARED
    chip-state thresholds (utils/timing.classify_state_pct — the same
    definition the drift suite's rows use, so the two records cross-read
    exactly): the chip drifts between a ~745 GB/s and a ~930+ GB/s
    sustained state on a minutes timescale, and a slow-state reading is
    a chip-state fact, not a kernel regression — the record carries the
    classification so a below-target value is self-explaining.  None
    when the peak is unknown (CPU test mode).  ``frac`` scales the bytes
    actually moved per pass (see :func:`physical_floor_ms`)."""
    from eigen_value_tpu.utils.timing import classify_state_pct

    n = DIM if dim is None else dim
    if not peak_gbps or peak_gbps != peak_gbps or device_ms <= 0:
        return None
    passes = rounds + 1  # initial row-sum + one matvec per round
    gbps = passes * n * n * 4 * frac / (device_ms * 1e-3) / 1e9
    return classify_state_pct(100.0 * gbps / peak_gbps)


def _call_with_deadline(fn, seconds):
    """Run ``fn()`` on a daemon thread and give up after ``seconds``.
    SIGALRM cannot reliably interrupt a C call blocked on a wedged
    tunnel RPC, but a join can always stop waiting; the abandoned
    thread stays blocked and is reaped at process exit (daemon).
    CALLER CONTRACT: after a timeout the rogue thread may still be
    issuing device RPCs, so no further timing windows may be sampled in
    this process — main() skips the extension on a bf16 timeout (its
    windows would read self-inflicted contention as chip state)."""
    result = {}

    def run():
        try:
            result["value"] = fn()
        except BaseException as e:  # noqa: BLE001 - re-raised on the caller
            result["error"] = e

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(seconds)
    if th.is_alive():
        raise TimeoutError(f"exceeded {seconds:.0f}s deadline")
    if "error" in result:
        raise result["error"]
    return result["value"]


def summarize(
    windows, rounds, backend, floor_ms=0.0, extra=None, peak_gbps=None,
    frac=1.0, fast_target_ms=None,
):
    """Fold per-window readings into the one-line JSON record.

    ``windows``: list of (device_ms, wall_chain_ms, wall_single_ms), one
    per measurement window.  The reported value is the best window
    (min-of-reps convention) among windows at/above ``floor_ms`` (the
    physically-possible floor — see :func:`physical_floor_ms`); every
    clean window's value and the median are included so the chip-state
    spread stays visible, and sub-floor readings are listed separately as
    ``suspect_windows_ms``.  If EVERY window is sub-floor the record
    still reports the min but carries ``"suspect": true`` — such a run
    is a transport diagnosis, not a perf record.

    ``peak_gbps`` (when known) adds the drift suite's chip-state
    classification (:func:`classify_chip_state`): the state of the best
    window, a histogram over the clean windows, and — when no window
    ever left the slow state — a note computing the slow-state physical
    floor, so a below-target record explains itself.  ``frac`` is the
    backend's per-pass traffic fraction (:func:`physical_floor_ms`);
    ``fast_target_ms`` the effective extension target for the note.
    """
    clean, suspect = _split_suspect(windows, floor_ms)
    pool = clean or windows
    device_ms, t_long, t_short = min(pool)
    window_vals = sorted(round(wv[0], 3) for wv in pool)
    n = len(window_vals)
    median_ms = round(
        (window_vals[(n - 1) // 2] + window_vals[n // 2]) / 2, 3
    )
    rec = {
        "metric": f"hilbert_{DIM}_e2e_device",
        "value": round(device_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / device_ms, 2),
        "wall_chain_ms": round(t_long, 3),
        "wall_single_ms": round(t_short, 3),
        "chain": CHAIN,
        "rounds": rounds,
        "backend": backend,
        "windows_ms": window_vals,
        "median_ms": median_ms,
    }
    if suspect:
        rec["suspect_windows_ms"] = sorted(round(wv[0], 3) for wv in suspect)
        rec["floor_ms"] = round(floor_ms, 3)
    if not clean:
        rec["suspect"] = True
    if frac != 1.0:
        rec["traffic_frac"] = round(frac, 4)
    # classification is a histogram over the CLEAN windows only: when
    # every window is sub-floor (pool = windows as a last resort for the
    # value fields), classifying the suspect readings would label a
    # transport-artifact record as the "fast" chip state (review r5c)
    states = [
        classify_chip_state(wv[0], rounds, peak_gbps, frac=frac)
        for wv in clean
    ]
    if any(states):
        rec["chip_state"] = classify_chip_state(
            device_ms, rounds, peak_gbps, frac=frac
        )
        rec["chip_states"] = {
            s: states.count(s) for s in ("slow", "mid", "fast") if s in states
        }
        if set(rec["chip_states"]) == {"slow"}:
            from eigen_value_tpu.utils.timing import MID_STATE_PCT

            passes = rounds + 1
            slow_floor = passes * DIM * DIM * 4 * frac / (
                MID_STATE_PCT / 100.0 * peak_gbps * 1e6
            )
            target = FAST_TARGET_MS if fast_target_ms is None else fast_target_ms
            rec["chip_state_note"] = (
                f"all {len(states)} clean windows sat in the slow HBM "
                f"state (<{MID_STATE_PCT:.0f}% of the {peak_gbps:.0f} "
                f"GB/s nameplate sustained); the {passes}-pass physical "
                f"floor there is ~{slow_floor:.2f} ms — readings at the "
                f"fast-state target ({target} ms) need a "
                "mid/fast window (chip-state drift, docs/BENCH_RESULTS.md)"
            )
    if extra:
        rec.update(extra)
    return rec


def should_extend(
    windows, elapsed_s, target_ms=None, budget_s=None, floor_ms=0.0,
    bar_cleared_x=None,
) -> bool:
    """Decide whether to sample one more beyond-base window.

    Extend only while (a) no PLAUSIBLE window (≥ ``floor_ms``) has
    reached the fast-state target yet, (b) the best plausible window
    has NOT already cleared the 20× bar by the ``bar_cleared_x`` margin,
    and (c) the next window (gap + ~10 s of measurement) still fits the
    extension budget.  Sub-floor transport artifacts (see
    :func:`physical_floor_ms`) neither stop the extension nor count as
    the fast state.  Pure so the policy is unit-testable.

    The bar-cleared exit (b) is the round-5 fix for the rc=124 runs
    (VERDICT r4 weak item 1): the extension exists so a record has a
    real chance of catching the fast chip state, but when the best
    window ALREADY beats the reference baseline by ≥ BAR_CLEARED_X
    (default 30× — 1.5× the 20-times bar), hunting a marginally faster
    state buys nothing and guarantees running into the driver's outer
    timeout.  The record still carries every window + the chip-state
    note, so a slow-state run explains itself without the hunt.
    """
    # Callers pass a float, None (= the env default), or NO_FAST_TARGET
    # to disable condition (a) entirely — the compute-bound cached
    # backend's time is VPU work, not bytes, so a traffic-scaled fast
    # target sits BELOW its compute floor and could never fire; hunting
    # it would burn the whole budget on every run (review r5c).
    target = FAST_TARGET_MS if target_ms is None else target_ms
    budget = EXTEND_BUDGET_S if budget_s is None else budget_s
    bar_x = BAR_CLEARED_X if bar_cleared_x is None else bar_cleared_x
    if not windows:
        return False
    clean, _ = _split_suspect(windows, floor_ms)
    if clean and target is not NO_FAST_TARGET and min(clean)[0] <= target:
        return False
    if clean and bar_x > 0 and BASELINE_MS / min(clean)[0] >= bar_x:
        return False
    return elapsed_s + WINDOW_GAP_S + 10.0 <= budget


def _min_ms(fn, reps=REPEATS) -> float:
    fn()  # warm (compile)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts)


def main() -> None:
    if os.environ.get("BENCH_DEVICE") == "cpu":
        # Hermetic: CPU mode must neither dial nor hang on the remote-TPU
        # tunnel (jax initializes every registered plugin on first backend
        # use regardless of platform pins — device.py).
        from eigen_value_tpu.device import unregister_remote_tpu_plugin

        unregister_remote_tpu_plugin()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from eigen_value_tpu import SolverConfig, fixtures
    from eigen_value_tpu.api import resolve_backend
    from eigen_value_tpu.config import EPS, MAX_ITR
    from eigen_value_tpu.device import auto_interpret
    from eigen_value_tpu.ops.solver_matvec import solve_matvec_loop

    cfg = SolverConfig(backend="auto")
    backend = resolve_backend(cfg, DIM)
    H = jax.block_until_ready(fixtures.hilbert_matrix(DIM))

    expected = fixtures.HILBERT_ROUNDS.get(DIM, ROUNDS_EXPECTED)
    use_pallas = backend in ("matvec_pallas", "multiround")
    interpret = auto_interpret()
    # The TPU headline path is the round-4 SYMMETRIC multi-round kernel:
    # up to `chunk` rounds per Pallas invocation, each round streaming
    # only the upper-triangle tiles (ops/pallas/kernels.multiround_sym) —
    # the Hilbert workload matrix is symmetric by construction
    # (H[i,j] = 1/(i+j+1)), VERIFIED on device below rather than assumed,
    # so the declared-symmetry fast path (SolverConfig(symmetric=True))
    # solves the same problem to the same answer in the same 17 rounds
    # with ~0.531× the HBM traffic.  Semantics unchanged (the stop is
    # still checked every round); the chunk is TUNED to the workload's
    # known round count + 1 initial pass so the flagship solve is ONE
    # invocation with zero overshoot.  Round counts for the Hilbert
    # family are hardware-independent (reference README tables;
    # fixtures.HILBERT_ROUNDS), so this is a shape-style tuning
    # constant, not a stopping rule.
    from eigen_value_tpu.ops.pallas.kernels import (
        sym_auto_cache_tiles,
        sym_cache_split,
        sym_tile,
    )
    from eigen_value_tpu.ops.solver_matvec import solve_multiround

    SYM_TILE = int(os.environ.get("BENCH_SYM_TILE", "512"))
    # bf16 composes with the same 512 tile once the VMEM cache carries
    # most of the triangle (round 5): the old 1024-tile preference came
    # from DMA-size effects that the cached variant mostly sidesteps
    # (bf16 tile=512 cache=96 measured 1.15 ms vs tile=1024 C0's 1.78 —
    # scratch/exp_sym_cached.py).
    SYM_TILE_BF16 = int(os.environ.get("BENCH_SYM_TILE_BF16", "512"))
    use_sym = (
        use_pallas
        and sym_tile(DIM, SYM_TILE) is not None
        # the guard, on device: one O(n²) pass, once — a benchmark that
        # DECLARES structure must check it holds before exploiting it
        and bool(jax.jit(lambda A: jnp.all(A == A.T))(H))
    )
    # the bf16 SECONDARY degrades independently: a bad bf16-only tile
    # knob must not veto the f32 HEADLINE's symmetric path (review r5c —
    # it used to silently downgrade the record ~5× to the dense kernel)
    use_sym_bf16 = use_sym and sym_tile(DIM, SYM_TILE_BF16) is not None
    # VMEM-resident tile cache (round 5): the measured-good flagship
    # budget is 104 MiB f32 / 48 MiB bf16 (scratch/exp_sym_cached.py —
    # 1.30 ms vs 3.51 pure streaming); interpret mode (the CPU test
    # path) keeps whatever degenerate count the tiny dim yields.
    SYM_CACHE_MB = int(os.environ.get("BENCH_SYM_CACHE_MB", "104"))
    SYM_CACHE_MB_BF16 = int(os.environ.get("BENCH_SYM_CACHE_MB_BF16", "48"))
    sym_bt = sym_tile(DIM, SYM_TILE) if use_sym else None
    cache_tiles = (
        sym_auto_cache_tiles(DIM, sym_bt, 4, SYM_CACHE_MB) if use_sym else 0
    )
    # frac from the tiles the kernel ACTUALLY streams/caches: sym_tile
    # may pick a smaller divisor than the requested env value, and the
    # cached tiles cross HBM once per SOLVE instead of once per round —
    # a frac computed from the request would skew floor_ms and the
    # extension target (advisor r4).
    if use_sym:
        streamed_t, cached_t = sym_cache_split(DIM, sym_bt, cache_tiles)
        passes = expected + 1
        frac = (
            (passes * len(streamed_t) + len(cached_t))
            * sym_bt * sym_bt / (passes * DIM * DIM)
        )
    else:
        frac = 1.0
    # With a resident cache the solve is ~VPU-COMPUTE-bound, not HBM-
    # bound (measured 1.30 ms vs the 0.70 ms frac-scaled HBM floor), so
    # a GB/s-implied chip-state classification would misread compute
    # time as a permanently "slow" HBM state — it is skipped below.
    compute_bound = use_sym and cache_tiles > 0
    if use_pallas:
        if use_sym:
            backend = (
                "multiround_sym_cached_pallas"
                if cache_tiles
                else "multiround_sym_pallas"
            )
        else:
            backend = "multiround_pallas"
        chunk = expected + 1

    def solve(H, ev0):
        if use_pallas:
            kw = (
                dict(symmetric=True, tile=SYM_TILE, cache_tiles=cache_tiles)
                if use_sym
                else {}
            )
            return solve_multiround(
                H, EPS, MAX_ITR, chunk=chunk, interpret=interpret, ev0=ev0,
                **kw,
            )
        return solve_matvec_loop(H, lambda ev: (H @ ev) / ev, EPS, MAX_ITR, ev0=ev0)

    # Parity + correctness on the production entry point.
    res = jax.jit(lambda A: solve(A, None))(H)
    rounds = int(res.rounds)
    if rounds != expected:
        print(
            f"WARNING: round-count parity broken: {rounds} != {expected}",
            file=sys.stderr,
        )
    lam = float(res.eigenvalue)


    def make_chain(solve_fn, k: int):
        """ONE definition of the chained-differencing executable (shared
        by the headline and every matrix secondary, so a measurement-rule
        fix can never be applied to one copy and missed in another): k
        data-dependent solves of the operand matrix, dependence threaded
        through the O(n) ev0 start vector (1 + λ·1e-38 is exactly 1.0f at
        runtime — the iteration is scale-invariant in ev — but it defeats
        hoisting/CSE of the k solves)."""

        @jax.jit
        def run(M: jax.Array) -> jax.Array:
            def body(i, acc):
                sc = jnp.float32(1.0) + acc * jnp.float32(1e-38)
                ev0 = jnp.ones((DIM,), jnp.float32) * sc
                return solve_fn(M, ev0).eigenvalue

            return lax.fori_loop(0, k, body, jnp.float32(0.0))

        return run

    run_long, run_short = make_chain(solve, CHAIN), make_chain(solve, 1)
    lam_chain = _sync(run_long(H))
    if abs(lam_chain - lam) > 1e-6:
        print(f"WARNING: chained λ {lam_chain} != solve λ {lam}", file=sys.stderr)

    def _chain_diff(run_l, run_s, arg, k):
        """ONE definition of the differencing fold (review r5c: it was
        copy-pasted across the headline and every secondary): min-of-reps
        long and short chains, per-solve marginal.  Returns
        ``(ms, t_long, t_short, clamped)`` — ``clamped`` flags a
        non-positive diff (the transport artifact the module header
        documents: an inflated short-chain wall), which callers must not
        report as a real reading."""
        t_l = _min_ms(lambda: _sync(run_l(arg)))
        t_s = _min_ms(lambda: _sync(run_s(arg)))
        diff = (t_l - t_s) / (k - 1)
        return max(diff, 1e-3), t_l, t_s, diff <= 0.0

    def window():
        ms, t_long, t_short, _ = _chain_diff(run_long, run_short, H, CHAIN)
        return ms, t_long, t_short

    def measure_bf16():
        """One chained window of the OPT-IN bf16 storage fast mode (same
        iteration, half the HBM bytes, ~1e-3 relative λ accuracy) — the
        labeled secondary metric showing what the chip does when the
        reference-parity f32 dtype is relaxed.  Never the headline value.

        Uses the multiround kernel with chunk = measured bf16 rounds + 1
        (bf16 round counts carry a ±1 accumulation-order tolerance, so
        the chunk is probed per run rather than assumed: an exact fit
        measures ~0.1 ms faster than the jnp.dot loop, an overshot chunk
        would waste frozen DMA rounds — scratch/exp_bf16_multiround.py).
        Composes with the symmetric CACHED kernel when the headline does
        (round 5): bf16 halves both the streamed bytes and the resident
        cache's footprint, so a 48 MiB budget caches 96 of the 136
        tiles — measured 1.15 ms (scratch/exp_sym_cached.py)."""
        from eigen_value_tpu.ops.solver_matvec import solve_matvec_storage

        bf16_cache = (
            sym_auto_cache_tiles(
                DIM, sym_tile(DIM, SYM_TILE_BF16), 2, SYM_CACHE_MB_BF16
            )
            if use_sym_bf16
            else 0
        )
        Hb = jax.block_until_ready(H.astype(jnp.bfloat16))
        # probe the round count with the REAL backend: reduction order
        # differs per kernel and a mis-fit chunk either restarts the
        # pipeline (undershoot) or re-streams a whole chunk (overshoot)
        bkw = (
            dict(symmetric=True, tile=SYM_TILE_BF16, cache_tiles=bf16_cache)
            if use_sym_bf16
            else {}
        )
        if use_pallas:
            probe = solve_multiround(
                Hb, EPS, MAX_ITR, chunk=expected + 2, interpret=interpret,
                storage_dtype=jnp.bfloat16, **bkw,
            )
        else:
            probe = solve_matvec_storage(
                Hb, EPS, MAX_ITR, storage_dtype=jnp.bfloat16
            )
        chunk_b = int(probe.rounds) + 1

        def solve_b(Hb, ev0):
            if use_pallas:
                return solve_multiround(
                    Hb,
                    EPS,
                    MAX_ITR,
                    chunk=chunk_b,
                    interpret=interpret,
                    ev0=ev0,
                    storage_dtype=jnp.bfloat16,
                    **bkw,
                )
            return solve_matvec_storage(
                Hb, EPS, MAX_ITR, storage_dtype=jnp.bfloat16, ev0=ev0
            )

        lb, sb = make_chain(solve_b, CHAIN), make_chain(solve_b, 1)
        _sync(lb(Hb))
        ms, _, _, clamped = _chain_diff(lb, sb, Hb, CHAIN)
        if clamped:
            raise RuntimeError(
                "bf16 chained diff non-positive (transport artifact) — "
                "not a real reading"
            )
        return ms

    from eigen_value_tpu.utils.timing import detect_peak_hbm_gbps

    peak_gbps = detect_peak_hbm_gbps()
    floor_ms = physical_floor_ms(rounds, peak_gbps, frac=frac)
    # The chip-state classification infers the HBM state from GB/s
    # implied by the reading — meaningless for the compute-bound cached
    # backend (its time is VPU work, not bytes), so classification is
    # disabled there; the frac-scaled HBM floor stays as the (loose but
    # valid) suspect-reading guard.
    state_peak = None if compute_bound else peak_gbps
    # effective extension target: the dense-equivalent knob scaled by the
    # headline backend's traffic fraction (module constant docs).  The
    # compute-bound cached backend gets NO fast target — its time is VPU
    # work, so the traffic-scaled value sits below its compute floor and
    # the hunt could only ever end on budget exhaustion (review r5c).
    fast_target = (
        NO_FAST_TARGET if compute_bound else round(FAST_TARGET_MS * frac, 2)
    )
    # The bar-cleared exit compares against the 126 ms FLAGSHIP baseline,
    # which is meaningless at a test BENCH_DIM (a 2048² window reads
    # ~0.2 ms → vacuously ≥30× → the extension machinery could never be
    # exercised off the default dim) — apply it only at the record's dim.
    bar_x = BAR_CLEARED_X if DIM == 8192 else 0.0
    windows = []
    extra = {}
    if compute_bound:
        extra["cache_tiles"] = cache_tiles
        extra["compute_bound"] = True
        extra["cache_note"] = (
            f"{cache_tiles} off-diagonal tiles ({cache_tiles * sym_bt * sym_bt * 4 >> 20} MiB) "
            "VMEM-resident across the solve; the solve is ~VPU-bound, so "
            "no GB/s-implied chip-state classification applies"
        )
    emitted = False

    def emit_partial(signum, frame):
        # A driver timeout mid-sampling must still record a result: emit
        # the summary of the windows completed so far and exit cleanly.
        # ``extra`` already holds the bf16 secondary when the base windows
        # finished (it runs before any extension), so a mid-extension kill
        # keeps it.
        if windows and not emitted:
            print(
                json.dumps(
                    summarize(
                        windows, rounds, backend, floor_ms, extra,
                        state_peak, frac=frac, fast_target_ms=fast_target,
                    )
                ),
                flush=True,
            )
        os._exit(0 if windows else 1)

    signal.signal(signal.SIGTERM, emit_partial)
    signal.signal(signal.SIGINT, emit_partial)

    def take_window(w: int) -> None:
        dev_ms, t_long, t_short = window()
        windows.append((dev_ms, t_long, t_short))
        state = classify_chip_state(dev_ms, rounds, state_peak, frac=frac)
        note = f" ({state} state)" if state else ""
        print(f"window {w}: {dev_ms:.3f} ms/solve{note}", file=sys.stderr)

    t_start = time.monotonic()
    for w in range(WINDOWS):
        if w:
            time.sleep(WINDOW_GAP_S)
        take_window(w)

    # The bf16 secondary metric — BEFORE any extension sampling, so a
    # deadline kill mid-extension can never erase it again (the round-3
    # driver record lost it exactly that way; the SIGTERM handler emits
    # ``extra`` as-is).  One window; the headline windows are already
    # complete, so it displaces nothing.  Watchdogged: a wedged tunnel
    # must not block the record (advisor r3).
    bf16_timed_out = False
    try:
        bf16_ms = _call_with_deadline(measure_bf16, BF16_DEADLINE_S)
        extra.update(
            {
                "bf16_ms": round(bf16_ms, 3),
                "bf16_vs_baseline": round(BASELINE_MS / bf16_ms, 2),
                "bf16_note": (
                    "opt-in storage_dtype=bfloat16 fast mode; ~1e-3 rel "
                    "lambda accuracy — NOT the f32 parity headline"
                ),
            }
        )
        print(f"bf16 secondary: {bf16_ms:.3f} ms/solve", file=sys.stderr)
    except TimeoutError as e:
        # The abandoned daemon thread is still blocked on (or issuing)
        # device RPCs; extension windows sampled next to it would read
        # self-inflicted contention and mislabel it as chip state — and
        # a tunnel that can't finish one bf16 window in BF16_DEADLINE_S
        # is too unhealthy for more sampling to help.  Keep the base
        # record and say why (review finding, round 4).
        bf16_timed_out = True
        extra["bf16_note"] = (
            f"bf16 secondary timed out ({e}); extension skipped — its "
            "windows would race the abandoned bf16 RPCs"
        )
        print(f"WARNING: bf16 secondary timed out: {e}", file=sys.stderr)
    except Exception as e:  # pragma: no cover - diagnostic only
        print(f"WARNING: bf16 secondary metric failed: {e}", file=sys.stderr)

    def measure_dense():
        """One chained window of the DENSE multiround path — the
        round-1..3 headline backend, kept in the record as the labeled
        continuity secondary so the symmetric headline's win over the
        full-traffic solve is visible in the same run/chip-state, and a
        regression in either kernel is attributable from the JSON alone."""

        def solve_d(H, ev0):
            return solve_multiround(
                H, EPS, MAX_ITR, chunk=chunk, interpret=interpret, ev0=ev0
            )

        ld, sd = make_chain(solve_d, CHAIN), make_chain(solve_d, 1)
        _sync(ld(H))
        ms, _, _, clamped = _chain_diff(ld, sd, H, CHAIN)
        if clamped:
            raise RuntimeError(
                "dense chained diff non-positive (transport artifact) — "
                "not a real reading"
            )
        return ms

    def measure_hankel_fft():
        """One chained window of the MATRIX-FREE path: the Hilbert matrix
        is Hankel (H[i,j] = h[i+j], h[k] = 1/(k+1)), so the per-round
        matvec is an O(n log n) FFT convolution instead of an O(n²)
        stream (ops/structured.hilbert_matvec) — the matrix is never
        materialized at all.  Converges in the SAME 17 rounds to the same
        λ (asserted below; operator_tpu_r4.jsonl rounds_ok).  Labeled
        secondary: it shows the algorithmic headroom a structure-aware
        caller gets from the framework, NOT the dense-matrix headline the
        reference benchmarks (which must stream real matrix memory).

        The per-solve time (~0.3 ms) is beneath the 9-chain resolution
        (diff ~2.5 ms vs ±1.5 ms launch jitter), so this chain is 65
        solves — same marginal-differencing rule, longer lever arm.

        EVERYTHING here must run under jit: the operator closes over a
        numpy complex64 spectrum (structured._spectrum_rfft), which jit
        embeds as an mlir constant but an eager call must device_put —
        and complex64 host→device transfers are UNIMPLEMENTED on the
        remote-TPU tunnel (the eager-probe form failed exactly that way
        on silicon, 2026-08-20, and the failed transfer then poisoned
        the process's subsequent dispatches — which is also why this
        secondary runs LAST)."""
        from eigen_value_tpu.ops.solver_matvec import solve_operator
        from eigen_value_tpu.ops.structured import hilbert_matvec

        mv = hilbert_matvec(DIM)

        def chain_h(k: int):
            @jax.jit
            def run(_: jax.Array) -> jax.Array:
                def body(i, acc):
                    s = jnp.float32(1.0) + acc * jnp.float32(1e-38)
                    ev0 = jnp.ones((DIM,), jnp.float32) * s
                    return solve_operator(
                        mv, DIM, EPS, MAX_ITR, ev0=ev0
                    ).eigenvalue

                return lax.fori_loop(0, k, body, jnp.float32(0.0))

            return run

        probe = jax.block_until_ready(
            jax.jit(lambda: solve_operator(mv, DIM, EPS, MAX_ITR))()
        )
        k_long = 65
        lh, sh = chain_h(k_long), chain_h(1)
        zero = jnp.zeros((), jnp.float32)
        _sync(lh(zero))
        ms, _, _, clamped = _chain_diff(lh, sh, zero, k_long)
        if clamped:
            raise RuntimeError(
                "hankel chained diff non-positive (transport artifact) — "
                "not a real reading"
            )
        return ms, int(probe.rounds), float(probe.eigenvalue)

    secondary_timed_out = bf16_timed_out
    if use_sym and not secondary_timed_out:
        try:
            dense_ms = _call_with_deadline(measure_dense, BF16_DEADLINE_S)
            extra.update(
                {
                    "dense_f32_ms": round(dense_ms, 3),
                    "dense_f32_vs_baseline": round(BASELINE_MS / dense_ms, 2),
                    "dense_f32_note": (
                        "same-run full-traffic multiround reference (the "
                        "rounds-1..3 headline backend) — the symmetric "
                        "headline's traffic win, same chip state"
                    ),
                }
            )
            print(f"dense f32 secondary: {dense_ms:.3f} ms/solve",
                  file=sys.stderr)
        except TimeoutError as e:
            secondary_timed_out = True
            extra["dense_f32_note"] = (
                f"dense secondary timed out ({e}); extension skipped — its "
                "windows would race the abandoned RPCs"
            )
            print(f"WARNING: dense secondary timed out: {e}", file=sys.stderr)
        except Exception as e:  # pragma: no cover - diagnostic only
            print(f"WARNING: dense secondary failed: {e}", file=sys.stderr)

    def measure_sym_stream():
        """One chained window of the PURE-STREAMING symmetric kernel (the
        round-4 headline backend, cache_tiles=0) — the middle rung of the
        in-record optimization ladder (dense 6.4 → sym-stream 3.5 →
        sym-cached 1.3 ms), so a regression in the cache OR the triangle
        enumeration is attributable from the JSON alone."""

        def solve_s(H, ev0):
            return solve_multiround(
                H, EPS, MAX_ITR, chunk=chunk, interpret=interpret, ev0=ev0,
                symmetric=True, tile=SYM_TILE,
            )

        ls, ss = make_chain(solve_s, CHAIN), make_chain(solve_s, 1)
        _sync(ls(H))
        ms, _, _, clamped = _chain_diff(ls, ss, H, CHAIN)
        if clamped:
            raise RuntimeError(
                "sym-stream chained diff non-positive (transport "
                "artifact) — not a real reading"
            )
        return ms

    if compute_bound and not secondary_timed_out:
        try:
            stream_ms = _call_with_deadline(measure_sym_stream, BF16_DEADLINE_S)
            extra.update(
                {
                    "sym_stream_ms": round(stream_ms, 3),
                    "sym_stream_vs_baseline": round(BASELINE_MS / stream_ms, 2),
                    "sym_stream_note": (
                        "same-run cache_tiles=0 triangle streaming (the "
                        "round-4 headline backend) — the VMEM cache's win, "
                        "same session"
                    ),
                }
            )
            print(f"sym stream secondary: {stream_ms:.3f} ms/solve",
                  file=sys.stderr)
        except TimeoutError as e:
            secondary_timed_out = True
            extra["sym_stream_note"] = (
                f"sym stream secondary timed out ({e}); extension skipped"
            )
            print(f"WARNING: sym stream secondary timed out: {e}",
                  file=sys.stderr)
        except Exception as e:  # pragma: no cover - diagnostic only
            print(f"WARNING: sym stream secondary failed: {e}",
                  file=sys.stderr)

    if not secondary_timed_out:
        try:
            h_ms, h_rounds, h_lam = _call_with_deadline(
                measure_hankel_fft, BF16_DEADLINE_S
            )
            extra.update(
                {
                    "hankel_fft_ms": round(h_ms, 4),
                    "hankel_fft_vs_baseline": round(BASELINE_MS / h_ms, 1),
                    "hankel_fft_rounds": h_rounds,
                    "hankel_fft_note": (
                        "matrix-free O(n log n) FFT path (Hilbert is "
                        "Hankel): same rounds/lambda, matrix never "
                        "materialized - algorithmic-headroom secondary, "
                        "NOT the dense-matrix headline"
                    ),
                }
            )
            if h_rounds != rounds or abs(h_lam - lam) > 1e-3:
                extra["hankel_fft_note"] += (
                    f"; PARITY DRIFT: rounds {h_rounds} vs {rounds}, "
                    f"lambda {h_lam:.6f} vs {lam:.6f}"
                )
            print(
                f"hankel fft secondary: {h_ms:.4f} ms/solve "
                f"({h_rounds} rounds)",
                file=sys.stderr,
            )
        except TimeoutError as e:
            secondary_timed_out = True
            extra["hankel_fft_note"] = (
                f"hankel fft secondary timed out ({e}); extension skipped"
            )
            print(f"WARNING: hankel fft secondary timed out: {e}",
                  file=sys.stderr)
        except Exception as e:  # pragma: no cover - diagnostic only
            # A GENERIC failure here also skips the extension (advisor
            # r4): the documented failure mode of this secondary is a
            # failed complex64 transfer that poisons the process's
            # subsequent dispatches (bench_hankel_err.log forensics in
            # scratch/), so a later extension window could crash AFTER
            # the final-emit point and lose the whole record.
            secondary_timed_out = True
            extra["hankel_fft_note"] = (
                f"hankel fft secondary failed ({type(e).__name__}); "
                "extension skipped — the failure mode can poison later "
                "dispatches"
            )
            print(f"WARNING: hankel fft secondary failed: {e}",
                  file=sys.stderr)

    # Adaptive extension, budgeted against the REMAINING wall before the
    # supervisor's deadline (startup measured from worker exec, T_EXEC).
    budget_s = extension_budget(
        EXTEND_BUDGET_S, DEADLINE_S, RESERVE_S, t_start - T_EXEC
    )
    w = WINDOWS
    while WINDOWS > 1 and not secondary_timed_out and should_extend(
        windows, time.monotonic() - t_start, target_ms=fast_target,
        budget_s=budget_s, floor_ms=floor_ms, bar_cleared_x=bar_x,
    ):
        time.sleep(WINDOW_GAP_S)
        take_window(w)
        w += 1

    # flush=True: os._exit in the TERM handler skips interpreter-exit
    # buffer flushing, so an unflushed final line could be silently lost.
    # Print BEFORE setting emitted: a SIGTERM landing between the two can
    # at worst duplicate the line (consumers read the last line), whereas
    # the reverse order could exit with no record at all.
    print(
        json.dumps(
            summarize(
                windows, rounds, backend, floor_ms, extra, state_peak,
                frac=frac, fast_target_ms=fast_target,
            )
        ),
        flush=True,
    )
    emitted = True


def _run_worker(deadline_s: float):
    """One worker attempt under ``deadline_s``; returns ``(stdout, rc)``
    (stdout is the JSON line, empty if no window completed).  On
    deadline: SIGTERM (the worker emits a partial record if it completed
    any window), then SIGKILL."""
    import subprocess

    env = dict(os.environ, BENCH_SUPERVISED="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        stdout=subprocess.PIPE,
        text=True,
        env=env,
    )

    # If the SUPERVISOR is timed out (e.g. the driver wraps bench.py in
    # `timeout`), forward the TERM so the worker can emit its best-so-far
    # record before we read the pipe.
    def _forward_term(signum, frame):
        proc.terminate()

    signal.signal(signal.SIGTERM, _forward_term)
    signal.signal(signal.SIGINT, _forward_term)
    try:
        out, _ = proc.communicate(timeout=deadline_s)
    except subprocess.TimeoutExpired:
        print(
            f"WARNING: bench deadline {deadline_s:.0f}s exceeded — "
            f"terminating worker",
            file=sys.stderr,
        )
        proc.terminate()
        try:
            out, _ = proc.communicate(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()  # hung in a blocked RPC; nothing salvageable
            out, _ = proc.communicate()
    return out, proc.returncode


def wait_for_tunnel(
    budget_s: float,
    gap_s: float,
    probe=None,
    _sleep=time.sleep,
    _mono=time.monotonic,
) -> bool:
    """Poll tunnel health until a probe reports alive or the budget is
    spent; returns True on recovery.  The probe is subprocess-isolated
    (utils/health.probe) so a still-wedged tunnel can't hang the wait.
    Budget accounting leaves room for one probe (≤60 s) after the final
    sleep.  probe/_sleep/_mono are injectable so the policy is
    unit-testable without a tunnel."""
    if probe is None:
        from eigen_value_tpu.utils.health import probe as _health_probe

        def probe():
            return bool(_health_probe(deadline_s=60.0).get("alive"))

    t0 = _mono()
    while _mono() - t0 + gap_s + 60.0 <= budget_s:
        _sleep(gap_s)
        if probe():
            return True
    return False


def supervise() -> int:
    """Run main() in a worker subprocess under DEADLINE_S; forward its
    stdout (the one JSON line).  If the first attempt completes zero
    windows (tunnel wedged from the start), wait up to RETRY_BUDGET_S
    for the tunnel to recover and retry once."""
    t0 = time.monotonic()
    out, rc = _run_worker(DEADLINE_S)
    attempts = 1
    retry_ok = RETRY_BUDGET_S > 0 and os.environ.get("BENCH_DEVICE") != "cpu"
    if not out and retry_ok:
        # During the recovery wait there is no worker to forward TERM to:
        # a driver timeout here must still leave an explicit record.
        def _term_during_wait(signum, frame):
            print(
                json.dumps(
                    failure_record(rc, attempts, time.monotonic() - t0)
                ),
                flush=True,
            )
            os._exit(1)

        signal.signal(signal.SIGTERM, _term_during_wait)
        signal.signal(signal.SIGINT, _term_during_wait)
        print(
            f"WARNING: no window completed (worker rc={rc}) — probing for "
            f"tunnel recovery up to {RETRY_BUDGET_S:.0f}s",
            file=sys.stderr,
        )
        if wait_for_tunnel(RETRY_BUDGET_S, PROBE_GAP_S):
            print("tunnel recovered — retrying measurement", file=sys.stderr)
            out, rc = _run_worker(DEADLINE_S)
            attempts = 2
    if out:
        sys.stdout.write(out)
        return 0
    # No window ever completed (tunnel wedged throughout, or the worker
    # died before measuring).  Emit an explicit diagnostic record rather
    # than nothing, so the round's bench artifact explains itself.
    print(
        json.dumps(failure_record(rc, attempts, time.monotonic() - t0)),
        flush=True,
    )
    return rc or 1


def failure_record(worker_rc, attempts: int = 1, elapsed_s: float = None) -> dict:
    """The JSON record emitted when no measurement window completed.
    ``attempts``/``elapsed_s`` keep the record honest when the recovery
    retry ran (the rc is the LAST worker's; elapsed spans all attempts
    plus any recovery wait)."""
    elapsed = DEADLINE_S if elapsed_s is None else elapsed_s
    return {
        "metric": f"hilbert_{DIM}_e2e_device",
        "value": None,
        "unit": "ms",
        "vs_baseline": None,
        "attempts": attempts,
        "retry_budget_s": RETRY_BUDGET_S,
        "error": (
            f"no measurement window completed in {attempts} worker "
            f"attempt(s) over {elapsed:.0f}s (last worker rc={worker_rc}, "
            f"per-attempt deadline {DEADLINE_S:.0f}s); the remote-TPU "
            "tunnel was unresponsive — see docs/BENCH_RESULTS.md "
            "(chip-state drift / tunnel wedge notes) and "
            "`python -m eigen_value_tpu.utils.health`"
        ),
    }


if __name__ == "__main__":
    if os.environ.get("BENCH_SUPERVISED") == "1":
        main()
    else:
        sys.exit(supervise())
