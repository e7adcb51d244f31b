"""Question-path batch-size sweep for the serving bench (bench.py).

Motivation: the serving roofline (BASELINE.md) decomposes the step into a
serial-latency-bound encoder (~47% at B=2048: 26 dependent scan steps of
[B, 512]-scale matmuls, each too short to fill the MXU pipeline) and an
HBM-bound hop loop (linear in B).  The measured B=512 -> B=2048 scaling
(95.5k -> 162.5k q/s) shows the latency floor amortizing across more
questions; B=4096/8192 were never measured.  If the encoder's cost is
mostly step-count latency, per-question cost keeps falling until the hop
loop's linear HBM traffic dominates — this sweep finds that knee.

Protocol: identical to bench.py (K serving steps chained inside ONE jit
with a data dependence between rounds, results forced to host), with the
B variants INTERLEAVED round-robin across timed rounds so hour-scale rig
variance (BASELINE.md "Environment caveats") hits every variant equally.
HBM sanity: at B=8192 the resident set is ~3.3 GB f32 feats + ~2.5 GB
bf16 ifeat/iatt + temporaries — comfortably inside v5e's 16 GB; B=16384
would flirt with OOM through the f32 feature input, so the sweep stops
at 8192.

Usage: python scripts/probe_serving_batch.py [--batches 1024,2048,4096,8192]
       [--rounds 5] [--chain 30]
Prints ONE JSON summary line to stdout; progress to stderr.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="1024,2048,4096,8192")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--chain", type=int, default=30)
    ap.add_argument("--canary", type=str, default="auto",
                    help="matmul_canary n,iters,rounds; 'auto' = the "
                         "backend-aware defaults (full-size on TPU, tiny "
                         "on a CPU smoke)")
    args = ap.parse_args()
    if args.canary == "auto":
        canary_n = canary_iters = None
        canary_rounds = 3
    else:
        canary_n, canary_iters, canary_rounds = (
            int(v) for v in args.canary.split(","))
    batches = [int(b) for b in args.batches.split(",")]

    from rau_vqa_tpu.utils.rigcheck import bench_preflight, bench_watchdog

    watchdog = bench_watchdog("serving_batch_sweep", "questions/sec",
                              timeout_s=3600.0)
    probe = bench_preflight("serving_batch_sweep", "questions/sec")
    if probe.get("platform") == "cpu":
        # deliberate CPU smoke (jax pinned in-process): the hang mode the
        # watchdog exists for cannot occur, and its 'tunnel hung' error
        # line would be a lie if a big CPU sweep just ran long
        watchdog.cancel()

    import jax
    import jax.numpy as jnp

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.eval.predict import predict
    from rau_vqa_tpu.models.rau import init_params

    cfg = dataclasses.replace(get_preset("ours_ms").model,
                              matmul_precision="default",
                              compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    K = args.chain

    def make_variant(B):
        acc_w = min(8, B)  # force a handful of answers to host per round
        rs = np.random.RandomState(B)  # unique data per variant
        tokens = jnp.asarray(rs.randint(1, cfg.vocab_size, (B, cfg.seq_len))
                             .astype(np.int32))
        lengths = jnp.asarray(rs.randint(1, cfg.seq_len + 1, B)
                              .astype(np.int32))
        feats = jnp.asarray(rs.randn(B, cfg.cnn_spat, cfg.cnn_dim)
                            .astype(np.float32))

        @jax.jit
        def chain(params, tokens, lengths, feats, salt0):
            def body(k, carry):
                salt, acc = carry
                toks = jnp.where(tokens > 0,
                                 (tokens + salt) % cfg.vocab_size, 0)
                tab_pred, _ = predict(params, cfg, toks, lengths, feats)
                ans = jnp.argmax(tab_pred, axis=-1)
                salt = salt + 1 + ans[0, 0].astype(jnp.int32) % 3
                return salt, acc + ans[:, :acc_w].astype(jnp.int32)
            zero = jnp.zeros((cfg.n_hops + 2, acc_w), jnp.int32)
            return jax.lax.fori_loop(0, K, body, (jnp.int32(salt0), zero))

        def run(salt):
            return np.asarray(chain(params, tokens, lengths, feats, salt)[1])
        return run

    variants = {}
    for B in batches:
        log(f"compiling B={B}...")
        t0 = time.perf_counter()
        variants[B] = make_variant(B)
        variants[B](0)  # compile + first run
        log(f"  compile+first {time.perf_counter() - t0:.1f}s")
        variants[B](5)  # steady-state warm

    times = {B: [] for B in batches}
    for r in range(args.rounds):
        for B in batches:  # interleaved: rig variance hits all B equally
            t0 = time.perf_counter()
            variants[B](100 + r)
            dt = time.perf_counter() - t0
            times[B].append(dt)
            log(f"round {r} B={B}: {dt / K * 1e3:.2f} ms/batch")

    from rau_vqa_tpu.utils.rigcheck import matmul_canary
    canary = matmul_canary(n=canary_n, iters=canary_iters,
                           rounds=canary_rounds)
    log(f"rig canary {canary['tflops']} TFLOP/s "
        f"({canary['frac_of_peak'] * 100:.1f}% of v5e bf16 peak)")

    out = {"chain": K, "rounds": args.rounds,
           "rig_canary_tflops": canary["tflops"],
           "rig_canary_frac_peak": canary["frac_of_peak"],
           "sweep": []}
    for B in batches:
        dt = float(np.median(times[B]))
        spread = (max(times[B]) - min(times[B])) / dt
        out["sweep"].append({
            "batch": B,
            "ms_per_batch": round(dt / K * 1e3, 3),
            "qps": round(K * B / dt, 1),
            "spread": round(spread, 4),
        })
    watchdog.cancel()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
