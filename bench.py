"""End-to-end serving benchmark: VQA questions/sec/chip.

Measures the flagship Ours_MS model (8 recurrent answering units over
14x14x512 VGG-pool5-448 features): question encoding, image embedding, the
full hop loop, all nHop+2 prediction sets and the OE argmax — K iterations
chained inside ONE jitted program with a data dependence between iterations
(each round's tokens derive from the previous round's answers), so nothing
can be cached or elided and a single host round-trip covers K full serving
steps.  This isolates true device throughput from this environment's network
tunnel (~30 ms per dispatch, ~15 MB/s under load — a real v5e host feeds
batches over PCIe orders of magnitude faster than the model consumes them).

Measured here: the pure-XLA hop loop wins device-side over the hand-written
Pallas hop kernel at these shapes (5.4 vs 8.1 ms / batch of 512), so the
bench uses the XLA path; the Pallas kernels remain available via
``predict_fused`` (see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver north star of 5,000 questions/sec/chip on TPU v5e
(BASELINE.json; the Torch reference publishes no throughput — SURVEY.md §6).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

NORTH_STAR_QPS = 5000.0

# Size knobs for CPU smokes ONLY (tests/test_cli.py::test_bench_cpu_smoke
# runs this exact entry point on a pinned-CPU interpreter so a trace-time
# break can never wait for the real rig to surface).  The driver runs
# `python bench.py` bare — defaults are the measured protocol.
_B = int(os.environ.get("RAU_BENCH_B", 6144))   # best of two measured
# knee sweeps: B=1024..8192 (benchmarks/pending_r4: 151.4k q/s @4096,
# 147.9k @8192) and the same-run 3072/4096/6144 probe (2026-08-19:
# 149.3k / 150.6k / 152.6k — 6144 wins the paired comparison by +1.3%)
# — the per-chip serving config a throughput deployment would pick
_K = int(os.environ.get("RAU_BENCH_K", 30))
_ROUNDS = int(os.environ.get("RAU_BENCH_ROUNDS", 5))

_REPO = os.path.dirname(os.path.abspath(__file__))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--artifact", metavar="DIR", nargs="?",
        const=os.path.join(_REPO, "benchmarks", "artifacts", "serve_chain"),
        default=None,
        help="run the timed protocol from an AOT StableHLO artifact of the "
             "chained program (built here if missing/stale — tracing only, "
             "works offline) instead of jit-compiling it; combined with "
             "the persistent compile cache this makes re-measurement "
             "windows immune to the 3-460s remote-compile lottery")
    args = ap.parse_args()
    # armed BEFORE the first device touch: a hung tunnel blocks
    # jax.devices() forever, and a hung bench is an uninterpretable
    # artifact — the watchdog prints an error JSON line and exits instead
    from rau_vqa_tpu.utils.rigcheck import bench_watchdog
    watchdog = bench_watchdog("vqa_questions_per_sec_per_chip",
                              "questions/sec")
    # fast hang-proof probe: a hard-hung tunnel fails in ~4 min with the
    # same parseable error line instead of burning the 2400 s deadline
    from rau_vqa_tpu.utils.rigcheck import bench_preflight
    probe = bench_preflight("vqa_questions_per_sec_per_chip",
                            "questions/sec")
    if probe.get("platform") == "cpu":
        # deliberate CPU smoke (jax pinned in-process): the hang mode the
        # watchdog exists for cannot occur, and its 'tunnel hung' error
        # line would be a lie if a big CPU run just ran long
        watchdog.cancel()

    # persistent executable cache: a re-run of this unchanged program
    # loads the compiled binary instead of re-paying the remote compile
    from rau_vqa_tpu.utils.rigcheck import enable_compile_cache_for_probe
    enable_compile_cache_for_probe(probe, _REPO)

    import jax
    import jax.numpy as jnp

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.eval.chain import make_serve_chain
    from rau_vqa_tpu.eval.predict import predict
    from rau_vqa_tpu.models.rau import init_params

    # bf16 MXU passes for serving; parity mode is exercised by the test suite
    cfg = dataclasses.replace(get_preset("ours_ms").model,
                              matmul_precision="default",
                              compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)

    B = _B
    K = _K           # serving steps chained per dispatch
    rs = np.random.RandomState(0)
    # host-side generation OUTSIDE the upload timer: randn alone makes
    # ~616M doubles at B=6144 on this 1-CPU box — seconds that would
    # otherwise be billed to the tunnel
    h_tokens = rs.randint(1, cfg.vocab_size,
                          (B, cfg.seq_len)).astype(np.int32)
    h_lengths = rs.randint(1, cfg.seq_len + 1, B).astype(np.int32)
    h_feats = rs.randn(B, cfg.cnn_spat, cfg.cnn_dim).astype(np.float32)
    t0 = time.perf_counter()
    tokens = jnp.asarray(h_tokens)
    lengths = jnp.asarray(h_lengths)
    feats = jnp.asarray(h_feats)
    # BLOCK on the operand uploads (feats alone is ~2.4 GB f32 at B=6144)
    # so compile_first_s below is program build+load+first-exec, not a
    # mix of compile and tunnel upload — the round-5 cache work showed a
    # fully-cache-hit run (XLA "compile" 0.33 s) still paying hundreds of
    # seconds in the first timed call; this separates the two costs.
    jax.block_until_ready((tokens, lengths, feats))
    t_up = time.perf_counter() - t0
    log(f"bench: operand upload {t_up:.1f}s "
        f"({(tokens.nbytes + lengths.nbytes + feats.nbytes) / 1e6:.0f} MB)")

    if args.artifact:
        from rau_vqa_tpu.eval.export import (
            export_serve_chain,
            load_or_build_chain_artifact,
        )
        serve_chain = load_or_build_chain_artifact(
            args.artifact,
            lambda: export_serve_chain(params, cfg, args.artifact,
                                       batch=B, chain=K),
            {"kind": "serve_chain", "batch": B, "chain": K,
             "model_config": dataclasses.asdict(cfg)}, log=log)
        log("bench: timing from AOT artifact (no Python trace)")
    else:
        serve_chain = jax.jit(make_serve_chain(cfg, K))

    log("bench: compiling")
    t0 = time.perf_counter()
    t_compile = None
    if not args.artifact:
        # split build from first-exec: with the committed cache seed the
        # XLA compile is ~1 s (cache hit), and what remains of the old
        # 700-930 s "compile lottery" is the axon plugin's remote program
        # LOAD inside the first call (measured 85-167 s, phase probe
        # 2026-08-20) — reporting both makes a BENCH json line
        # self-diagnosing: compile_s >> 1 means the cache missed (HLO
        # changed without refreshing the seed), first-call >> means the
        # tunnel's load path was slow that hour
        serve_chain = serve_chain.lower(
            params, tokens, lengths, feats, jnp.int32(0)).compile()
        t_compile = time.perf_counter() - t0
        log(f"bench: trace+compile {t_compile:.1f}s "
            f"(~1s = persistent-cache hit)")
    np.asarray(serve_chain(params, tokens, lengths, feats, jnp.int32(0))[1])
    t_first = time.perf_counter() - t0
    log(f"bench: compile+first {t_first:.1f}s")

    np.asarray(serve_chain(params, tokens, lengths, feats, jnp.int32(5))[1])

    # median-of-N with spread: single-point numbers were not comparable
    # round-over-round on this rig (hour-scale variance ~15%, BASELINE.md)
    n_rounds = _ROUNDS
    times = []
    for r in range(n_rounds):
        t0 = time.perf_counter()
        out = serve_chain(params, tokens, lengths, feats, jnp.int32(100 + r))
        acc = np.asarray(out[1])     # forces the whole chain each round
        times.append(time.perf_counter() - t0)

    # rig-health canary ADJACENT to the timed rounds (not before the
    # 3-460 s variable remote compile): a number from a degraded tunnel
    # window is meaningless without a same-minute capability reference
    from rau_vqa_tpu.utils.rigcheck import matmul_canary
    canary = matmul_canary()
    log(f"bench: rig canary {canary['tflops']} TFLOP/s "
        f"({canary['frac_of_peak'] * 100:.1f}% of v5e bf16 peak)")

    assert acc.shape == (cfg.n_hops + 2, min(8, B))
    dt = float(np.median(times))
    spread = (max(times) - min(times)) / dt
    qps = K * B / dt
    log(f"bench: {dt / K * 1e3:.2f} ms/batch of {B} (median of "
        f"{n_rounds}, spread {spread * 100:.1f}%: "
        + ", ".join(f"{t / K * 1e3:.2f}" for t in times) + " ms)")

    # MFU: XLA's own FLOP count for one serving step / v5e bf16 peak
    # (197 TFLOP/s) at the measured step time.  MFU is low NOT because of
    # HBM bandwidth (the ~23 MB of bf16 params re-read per step is ~28 us
    # at 819 GB/s — 0.2% of the step): the measured ceiling is SERIAL
    # LATENCY — 26 scan steps + 8 hop iterations = 34 dependent program
    # segments whose non-feats matmuls are small ([B,512]-scale), each too
    # short to fill the MXU pipeline.  Decomposition measured by
    # scripts/profile_serving.py; summary in BASELINE.md "serving
    # roofline".
    PEAK_FLOPS = 197e12
    mfu = None
    try:
        if args.artifact:
            # the MFU probe lowers+compiles a second program — exactly the
            # compile tax artifact mode exists to avoid
            raise RuntimeError("skipped in --artifact mode")
        # named fn, not a lambda: the persistent-cache entry is keyed by
        # jit name ('jit_mfu_probe-...'), and 'jit__lambda-' collides
        # with every other script's lambdas in the shared live cache
        # (refresh_cache_seed curates by name prefix)
        def mfu_probe(p, t, l, f):
            return predict(p, cfg, t, l, f)
        compiled = jax.jit(mfu_probe).lower(
            params, tokens, lengths, feats).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops_per_batch = float(cost["flops"])
        sec_per_batch = dt / K
        mfu = flops_per_batch / sec_per_batch / PEAK_FLOPS
        log(f"bench: {flops_per_batch / B / 1e6:.2f} MFLOP/question, "
            f"MFU {mfu * 100:.2f}%")
    except Exception as e:          # cost_analysis is not a stable API
        log(f"bench: cost_analysis unavailable ({e}); mfu omitted")

    watchdog.cancel()
    print(json.dumps({
        "metric": "vqa_questions_per_sec_per_chip",
        "value": round(qps, 1),
        "unit": "questions/sec",
        "vs_baseline": round(qps / NORTH_STAR_QPS, 3),
        "spread": round(spread, 4),
        "compile_first_s": round(t_first, 1),
        "operand_upload_s": round(t_up, 1),
        **({"compile_s": round(t_compile, 1)}
           if t_compile is not None else {}),
        "rig_canary_tflops": canary["tflops"],
        "rig_canary_frac_peak": canary["frac_of_peak"],
        **({"artifact": True} if args.artifact else {}),
        **({"mfu": round(mfu, 4)} if mfu is not None else {}),
    }))


if __name__ == "__main__":
    main()
