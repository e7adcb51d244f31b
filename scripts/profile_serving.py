"""Measured decomposition of the serving step (VERDICT r2 weak #2).

bench.py's MFU (~18%) was once explained away as "bandwidth-bound" — false:
re-reading ~23 MB of bf16 params per step costs ~28 us at 819 GB/s, ~0.2%
of the step.  This script measures where the time actually goes by timing
each component with the same chained-dispatch protocol bench.py uses (K
iterations inside one jit with a data dependence between rounds, so the
~30 ms tunnel RTT and any caching cannot contaminate device-side numbers):

  - full       : the complete predict step (encoder + image embed + hops)
  - encoder    : question LSTM scan only (26 steps)
  - encoder T=8: the scan at the shortest bucket
  - hops       : the 8 answering units over precomputed image embeddings

Also attempts a jax.profiler on-device trace (may be unavailable through
the tunnel backend; the chained decomposition stands alone).

Usage: python scripts/profile_serving.py [--batch 2048] [--rounds 3]
Prints one JSON summary line to stdout; progress to stderr.
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


def time_chain(fn, args, K, rounds):
    """Median seconds per iteration of a chained fn (compiled once)."""
    import jax

    np.asarray(jax.block_until_ready(fn(*args, 0)))
    times = []
    for r in range(rounds):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn(*args, 100 + r)))
        times.append((time.perf_counter() - t0) / K)
    return float(np.median(times)), times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--chain", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.eval.predict import predict
    from rau_vqa_tpu.models.rau import (
        answering_unit,
        embed_image,
        encode_question,
        init_params,
    )

    cfg = dataclasses.replace(get_preset("ours_ms").model,
                              matmul_precision="default",
                              compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, K = args.batch, args.chain
    rs = np.random.RandomState(0)
    tokens = jnp.asarray(rs.randint(1, cfg.vocab_size, (B, cfg.seq_len))
                         .astype(np.int32))
    lengths = jnp.asarray(rs.randint(1, cfg.seq_len + 1, B)
                          .astype(np.int32))
    feats = jnp.asarray(rs.randn(B, cfg.cnn_spat, cfg.cnn_dim)
                        .astype(np.float32))
    results = {}

    # ---- full predict ----------------------------------------------------
    @jax.jit
    def full_chain(params, tokens, lengths, feats, salt0):
        def body(k, carry):
            salt, acc = carry
            toks = jnp.where(tokens > 0, (tokens + salt) % cfg.vocab_size, 0)
            tab_pred, _ = predict(params, cfg, toks, lengths, feats)
            ans = jnp.argmax(tab_pred, axis=-1)
            return salt + 1 + ans[0, 0].astype(jnp.int32) % 3, acc + ans[:, 0]
        zero = jnp.zeros((cfg.n_hops + 2,), jnp.int32)
        return jax.lax.fori_loop(0, K, body, (jnp.int32(salt0), zero))[1]

    log("compiling full...")
    sec, ts = time_chain(lambda *a: full_chain(params, tokens, lengths,
                                               feats, a[-1]), (), K,
                         args.rounds)
    results["full_ms"] = sec * 1e3
    log(f"full: {sec * 1e3:.3f} ms/batch ({[f'{t*1e3:.2f}' for t in ts]})")

    # ---- encoder only (T=26 and T=8) ------------------------------------
    def enc_chain_for(T):
        toks_T = tokens[:, :T]
        lens_T = jnp.minimum(lengths, T)

        @jax.jit
        def enc_chain(params, salt0):
            cdt = jnp.dtype(cfg.compute_dtype)
            p = jax.tree.map(lambda x: x.astype(cdt), params)

            def body(k, carry):
                salt, acc = carry
                toks = jnp.where(toks_T > 0,
                                 (toks_T + salt) % cfg.vocab_size, 0)
                with jax.default_matmul_precision(cfg.matmul_precision):
                    q = encode_question(p, cfg, toks, lens_T)
                s = q[0, 0].astype(jnp.float32)
                return salt + 1 + jnp.int32(s > 0), acc + s
            return jax.lax.fori_loop(0, K, body,
                                     (jnp.int32(salt0), jnp.float32(0)))[1]
        return enc_chain

    for T, key in ((cfg.seq_len, "encoder_ms"), (8, "encoder_T8_ms")):
        log(f"compiling encoder T={T}...")
        fn = enc_chain_for(T)
        sec, ts = time_chain(lambda s, _fn=fn: _fn(params, s), (), K,
                             args.rounds)
        results[key] = sec * 1e3
        log(f"encoder T={T}: {sec * 1e3:.3f} ms/batch")

    # ---- hop loop only (image embed hoisted OUT, like the eval path) -----
    @jax.jit
    def hops_chain(params, q0, feats, salt0):
        cdt = jnp.dtype(cfg.compute_dtype)
        p = jax.tree.map(lambda x: x.astype(cdt), params)
        mp = p["mult"]
        with jax.default_matmul_precision(cfg.matmul_precision):
            ifeat, iatt = embed_image(mp, cfg, feats.astype(cdt))

            def body(k, carry):
                salt, acc = carry
                q = q0 + salt.astype(cdt) * 1e-6
                q_pre = q @ mp["q_proj"]["w"] + mp["q_proj"]["b"]
                c = jnp.zeros((B, cfg.att_state_dim), cdt)
                h = jnp.zeros((B, cfg.att_state_dim), cdt)
                score = None
                for _hop in range(cfg.n_hops):
                    score, _do, _att, c, h = answering_unit(
                        mp, cfg, q, ifeat, iatt, c, h, train=False,
                        q_proj_pre=q_pre)
                ans = jnp.argmax(score, axis=-1)
                return (salt + 1 + ans[0].astype(jnp.int32) % 3,
                        acc + ans[:1])
            out = jax.lax.fori_loop(0, K, body,
                                    (jnp.int32(salt0),
                                     jnp.zeros((1,), jnp.int32)))
        return out[1]

    q0 = jnp.asarray(rs.randn(B, cfg.rnnout_dim)
                     .astype(np.float32)).astype(jnp.bfloat16)
    log("compiling hops...")
    sec, ts = time_chain(lambda s: hops_chain(params, q0, feats, s), (), K,
                         args.rounds)
    results["hops_ms"] = sec * 1e3
    log(f"hops: {sec * 1e3:.3f} ms/batch")

    # ---- optional on-device profiler trace -------------------------------
    try:
        import tempfile
        with tempfile.TemporaryDirectory() as d:
            with jax.profiler.trace(d):
                np.asarray(full_chain(params, tokens, lengths, feats, 7))
            import glob
            n = len(glob.glob(d + "/**/*", recursive=True))
        results["profiler_trace"] = "ok"
        log(f"jax.profiler trace captured ({n} files)")
    except Exception as e:  # noqa: BLE001
        results["profiler_trace"] = f"unavailable: {e}"
        log(f"jax.profiler trace unavailable: {e}")

    results["batch"] = B
    results["residual_ms"] = results["full_ms"] - results["encoder_ms"] \
        - results["hops_ms"]
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
