"""Rig-health canary for benchmark runs.

This rig reaches the TPU through a shared tunnel whose effective device
throughput has measured windows of >10x degradation (far beyond the
documented ~15% hour-scale band — see BASELINE.md "Environment caveats").
A benchmark number recorded in such a window is meaningless without a
same-run reference, so every bench emits a canary: a chained
[N, N] @ [N, N] bf16 matmul loop whose speed-of-light is known
(2*N^3 FLOP/iter against the v5e bf16 peak).  The canary's achieved
TFLOP/s — and its fraction of peak — time-stamps the rig's health inside
the same process/minute as the headline metric.

Chained-dispatch protocol per CLAUDE.md: the loop carries a data
dependence (each iteration's operand derives from the previous product),
runs K iterations inside one jit, and the caller's wall-clock covers one
host round-trip for all K.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

V5E_BF16_PEAK_FLOPS = 197e12


def matmul_canary(n: int = None, iters: int = None,
                  rounds: int = 3) -> Dict[str, float]:
    """Time a chained bf16 [n,n]@[n,n] matmul loop; return achieved TFLOP/s.

    Returns {"tflops", "frac_of_peak", "ms_per_matmul"} using the BEST of
    ``rounds`` (the canary estimates rig capability, so max throughput is
    the right statistic; contention only ever slows it down).

    ``iters`` must keep device time per dispatch >> the ~30 ms tunnel RTT
    or the canary conflates RTT with capability: at v5e peak a 4096^3
    bf16 matmul is ~0.7 ms, so 400 iters ≈ 280+ ms of device time
    (RTT < 10%).  The original iters=50 default measured 100-109 TFLOP/s
    where ~0.6 ms/iter of that was RTT — i.e. the device was actually
    near ~0.77 ms/matmul (~90% of peak).

    ``n``/``iters`` default to 4096/400 on an accelerator.  On a CPU
    backend (a deliberate smoke of a bench, pinned in-process) the
    defaults shrink to 512/4 — the full-size canary is ~55 TFLOP of work,
    minutes-to-hours on host, and the v5e-relative reading is meaningless
    there anyway.  Explicit arguments always win."""
    import jax
    import jax.numpy as jnp

    on_cpu = jax.default_backend() == "cpu"
    if n is None:
        n = 512 if on_cpu else 4096
    if iters is None:
        iters = 4 if on_cpu else 400

    a0 = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    b0 = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)
    inv = jnp.bfloat16(1.0 / jnp.sqrt(jnp.float32(n)))

    @jax.jit
    def chain(a, b, salt):
        def body(_, ab):
            a, b = ab
            with jax.default_matmul_precision("default"):
                c = a @ b
            # keep magnitudes ~N(0,1) while preserving the data dependence
            return b, (c * inv).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body,
                                 (a + salt.astype(jnp.bfloat16), b))

    jax.block_until_ready(chain(a0, b0, jnp.float32(0)))   # compile
    best = float("inf")
    for r in range(rounds):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(a0, b0, jnp.float32(1e-3 * (r + 1))))
        best = min(best, time.perf_counter() - t0)
    sec_per_mm = best / iters
    tflops = 2.0 * n ** 3 / sec_per_mm / 1e12
    # 3 decimals: a CPU-backend smoke (tiny n) is ~0.01 TFLOP/s and must
    # not round to a hard zero
    return {
        "tflops": round(tflops, 3),
        "frac_of_peak": round(tflops * 1e12 / V5E_BF16_PEAK_FLOPS, 6),
        "ms_per_matmul": round(sec_per_mm * 1e3, 4),
    }


def _last_recorded(metric: str):
    """Most recent measurement recorded for ``metric`` under benchmarks/
    (highest round wins).  Returns a small dict or None; never raises —
    this only decorates a failure artifact."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    best = None
    try:
        for path in sorted(glob.glob(os.path.join(here, "benchmarks",
                                                  "*.json"))):
            with open(path) as f:
                doc = json.load(f)
            for m in doc.get("measurements", []):
                if m.get("metric") != metric or "error" in m:
                    continue
                rnd = doc.get("round", 0)
                if best is None or rnd >= best["round"]:
                    best = {"value": m.get("value"),
                            "round": rnd,
                            "note": m.get("note", "")}
    except Exception:
        return None
    return best


def _emit_error_line(metric: str, unit: str, error: str,
                     note: str) -> None:
    """THE driver-parseable failure artifact — one schema, shared by the
    watchdog and the preflight so the contract cannot fork.  ``value``
    stays 0.0 (nothing was measured THIS run); ``last_measured`` points
    at the most recent healthy-rig number recorded for the same metric so
    the artifact is interpretable during a tunnel outage."""
    import json
    import sys

    line = {
        "metric": metric,
        "value": 0.0,
        "unit": unit,
        "vs_baseline": 0.0,
        "error": error,
    }
    last = _last_recorded(metric)
    if last is not None:
        line["last_measured"] = last
    print(json.dumps(line), flush=True)
    sys.stderr.write(note + "\n")
    sys.stderr.flush()


def bench_watchdog(metric: str, unit: str, timeout_s: float = 2400.0):
    """Arm a deadline for a benchmark process: if the bench has not
    completed within ``timeout_s``, print ONE driver-parseable JSON line
    with an ``error`` field and hard-exit.

    Rationale: a hung TPU tunnel (observed 2026-08-17: jax.devices()
    blocks forever in a dial-retry sleep loop) would otherwise hang the
    bench process itself — an uninterpretable artifact.  The deadline
    budgets for a slow-but-healthy rig — each bench compiles 2+ programs
    at the measured 3-460 s/compile tail plus ~100s of weight upload at
    tunnel bandwidth — so firing means the rig is either unreachable or
    degraded far beyond any recorded window.  Uses a daemon timer +
    os._exit because the main thread may be blocked inside a C extension
    where exceptions cannot be delivered.

    Returns the timer; call ``.cancel()`` once the real JSON line is out.
    """
    import os
    import threading

    def _fire():
        _emit_error_line(
            metric, unit,
            f"watchdog: no result within {timeout_s:.0f}s — TPU tunnel "
            f"unreachable/hung (see BASELINE.md 'Environment caveats')",
            "bench: watchdog fired, aborting")
        os._exit(3)

    t = threading.Timer(timeout_s, _fire)
    t.daemon = True
    t.start()
    return t


def enable_compile_cache_for_probe(probe: Dict, repo_root: str) -> bool:
    """Benches call this right after ``bench_preflight``: enables the
    persistent executable cache under <repo_root>/benchmarks/compile_cache
    UNLESS the probe resolved to CPU — XLA:CPU AOT cache entries can carry
    machine-feature mismatches (SIGILL risk per cpu_aot_loader), and the
    cache exists for the remote-TPU compile lottery only.

    The live cache dir is gitignored (it accumulates per-run junk), which
    is exactly why the round-4 driver benches kept re-paying 700-930 s
    compiles: the driver measures a CLEAN CHECKOUT, where the ignored dir
    is empty — while the cache key itself is provably stable across
    processes and sessions (round-5 diagnosis, docs/mosaic_notes.md).
    The curated entries for the bench programs are therefore COMMITTED
    under benchmarks/compile_cache_seed/ and copied into the live dir
    here (scripts/refresh_cache_seed.py keeps the seed current)."""
    import os

    if probe.get("platform") == "cpu":
        return False
    return enable_compile_cache(
        os.path.join(repo_root, "benchmarks", "compile_cache"),
        seed_dir=os.path.join(repo_root, "benchmarks",
                              "compile_cache_seed"))


def enable_compile_cache(cache_dir: str,
                         seed_dir: Optional[str] = None) -> bool:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    On this rig the remote-compile latency is 3-930 s for the SAME program
    (BASELINE.md 'Environment caveats'), so every measurement window
    re-pays an unpredictable compile tax.  The persistent cache stores the
    compiled executable keyed by (HLO, compile options, backend); a
    re-run of an unchanged bench loads the binary instead of re-compiling.
    Backends whose PJRT plugin cannot serialize executables degrade to a
    warning from JAX, not an error, so this is safe to enable broadly.

    ``seed_dir``: a TRACKED directory of curated cache entries; any entry
    missing from ``cache_dir`` is copied in first, so a fresh checkout
    (the driver's bench environment) starts warm instead of re-paying the
    compile lottery.  Copy, not symlink — JAX rewrites/evicts entries.

    Disabled by RAU_NO_COMPILE_CACHE=1 (returns False).  Threshold is 1 s
    so tiny programs don't churn the cache dir.
    """
    import os

    if os.environ.get("RAU_NO_COMPILE_CACHE"):
        return False
    import jax
    os.makedirs(cache_dir, exist_ok=True)
    if seed_dir and os.path.isdir(seed_dir):
        import shutil
        for name in os.listdir(seed_dir):
            if not name.endswith("-cache"):
                continue
            dst = os.path.join(cache_dir, name)
            if not os.path.exists(dst):
                shutil.copy2(os.path.join(seed_dir, name), dst)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:   # renamed across jax versions; default is fine
        pass
    return True


def bench_preflight(metric: str, unit: str, timeout_s: float = 240.0,
                    honor_cpu_pin: bool = True) -> Dict[str, object]:
    """Fast, hang-proof device probe BEFORE the expensive bench body.

    The watchdog alone budgets 2400 s for slow-but-healthy compiles, so a
    hard-hung tunnel burns 40 minutes before the error line appears.
    This probes the device in a killable subprocess (the doctor's
    mechanism) first: unreachable/hung — or silently resolved to the CPU
    FALLBACK backend (the platform list is 'axon,cpu', so a fast-failing
    plugin lands on cpu and the bench would emit a TPU-labeled number
    measured on host) -> print the same driver-parseable error JSON line
    and exit 3 within ~4 minutes (the probe dispatches one op, so its
    timeout leaves headroom for a remote-compile tail on the tiny
    program).  Returns the probe result when
    healthy."""
    try:
        import jax
        if honor_cpu_pin and str(
                getattr(jax.config, "jax_platforms", None) or "") \
                .lower() == "cpu":
            # this process is pinned to CPU (smoke runs, tests): nothing
            # to dial, and the subprocess probe would use the DEFAULT env
            # (the tunnel) and wrongly abort a deliberate CPU run
            return {"status": "ok", "platform": "cpu"}
    except Exception:
        pass

    from rau_vqa_tpu.utils.doctor import _DEVICE_PROBE, _probe

    r = _probe(_DEVICE_PROBE.format(force_cpu=""), timeout_s)
    if r["status"] == "ok" and r.get("platform") == "cpu":
        r = {"status": "cpu-fallback",
             "detail": "the accelerator plugin failed fast and "
                       "jax.devices() resolved to the CPU fallback — a "
                       "TPU-labeled number measured on host would be "
                       "garbage"}
    if r["status"] != "ok":
        _emit_error_line(
            metric, unit,
            f"preflight: device probe {r['status']} "
            f"({r.get('detail', '')}) — TPU unreachable/hung/fallback "
            f"(see BASELINE.md 'Environment caveats'; diagnose with "
            f"`rau-vqa doctor`)",
            "bench: device preflight failed, aborting")
        raise SystemExit(3)
    return r


class StallWatchdog:
    """Progress deadline for long-running device jobs (precompute sweeps):
    if ``poke()`` is not called within ``timeout_s``, print a diagnosis and
    hard-exit — the tunnel's hard-hang mode (BASELINE.md 'Environment
    caveats') blocks inside C extensions where exceptions cannot be
    delivered, so a daemon timer + os._exit is the only reliable abort.

    Unlike ``bench_watchdog`` (one deadline for the whole bench), this is
    re-armed on every unit of progress, so the total job duration is
    unbounded while any single stall is caught.  ``timeout_s <= 0``
    disables it.
    """

    def __init__(self, what: str, timeout_s: float = 900.0):
        import threading
        self._threading = threading
        self.what = what
        self.timeout_s = float(timeout_s)
        self._timer = None
        self.poke()

    def _fire(self):
        import os
        import sys
        sys.stderr.write(
            f"{self.what}: no progress within {self.timeout_s:.0f}s — "
            f"TPU tunnel likely unreachable/hung; diagnose with "
            f"`rau-vqa doctor`\n")
        sys.stderr.flush()
        os._exit(3)

    def poke(self) -> None:
        if self.timeout_s <= 0:
            return
        if self._timer is not None:
            self._timer.cancel()
        self._timer = self._threading.Timer(self.timeout_s, self._fire)
        self._timer.daemon = True
        self._timer.start()

    def cancel(self) -> None:
        if self._timer is not None:
            self._timer.cancel()
            self._timer = None
