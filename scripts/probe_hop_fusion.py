"""Paired probe: attention-score dot vs fused multiply-reduce (hop loop).

Hypothesis (serving roofline follow-up, BASELINE.md "Serving roofline"):
XLA cannot fuse elementwise producers into a dot operand, so

    addfeat  = tanh(iatt + qatt[:, None, :])        # [B, S, F]
    attscore = (addfeat @ w_score)[..., 0] + b      # dot over F

materializes ``addfeat`` ([2048, 196, 256] bf16 = 205 MB) to HBM per hop
just to feed a rank-1 matvec — write + re-read ≈ 410 MB/hop of traffic the
math does not require.  Rewriting the contraction as a broadcast-multiply +
lane reduction keeps the whole chain in one fused elementwise kernel (read
iatt once, write [B, S]):

    attscore = (tanh(iatt + qatt[:, None, :]) * w_score[F]).sum(-1) + b

This probe times the FULL 8-hop answering loop both ways, same process,
interleaved rounds (A/B/A/B) so the rig's hour-scale variance cannot fake a
win.  Chained-dispatch protocol per CLAUDE.md: K iterations inside one jit
with a data dependence between rounds, salted inputs, forced outputs.

Usage: python scripts/probe_hop_fusion.py [--batch 2048] [--rounds 5]
Prints one JSON line: {"dot_ms": ..., "fused_ms": ..., "speedup": ...}
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
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--chain", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.models.rau import embed_image, init_params

    cfg = dataclasses.replace(get_preset("ours_ms").model,
                              matmul_precision="default",
                              compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, K = args.batch, args.chain
    rs = np.random.RandomState(0)
    feats = jnp.asarray(rs.randn(B, cfg.cnn_spat, cfg.cnn_dim)
                        .astype(np.float32))
    q0 = jnp.asarray(rs.randn(B, cfg.rnnout_dim)
                     .astype(np.float32)).astype(jnp.bfloat16)

    def make_chain(score_impl):
        """The 8-hop loop with the given attention-score contraction."""

        @jax.jit
        def chain(params, q0, feats, salt0):
            cdt = jnp.dtype(cfg.compute_dtype)
            p = jax.tree.map(lambda x: x.astype(cdt), params)
            mp = p["mult"]
            with jax.default_matmul_precision(cfg.matmul_precision):
                ifeat, iatt = embed_image(mp, cfg, feats.astype(cdt))

                def one_hop(q, c, h, q_pre):
                    qfeat = jnp.tanh(q_pre + h @ mp["h_proj"]["w"]
                                     + mp["h_proj"]["b"])
                    qatt = qfeat @ mp["att_q"]["w"] + mp["att_q"]["b"]
                    if score_impl == "dot":
                        addfeat = jnp.tanh(iatt + qatt[:, None, :])
                        attscore = ((addfeat @ mp["att_score"]["w"])[..., 0]
                                    + mp["att_score"]["b"])
                    else:  # fused multiply-reduce, f32 accumulation
                        w = mp["att_score"]["w"][:, 0]
                        attscore = (
                            (jnp.tanh(iatt + qatt[:, None, :])
                             * w[None, None, :]).astype(jnp.float32)
                            .sum(-1).astype(iatt.dtype)
                            + mp["att_score"]["b"])
                    attscore = (attscore + h @ mp["att_mem"]["w"]
                                + mp["att_mem"]["b"])
                    attprob = jax.nn.softmax(attscore, axis=-1)
                    attfeat = jnp.einsum("bsm,bs->bm", ifeat, attprob)
                    join = (qfeat + attfeat
                            + attprob @ mp["attprob_proj"]["w"]
                            + mp["attprob_proj"]["b"])
                    lp = mp["attlstm"]["layers"][0]
                    R = c.shape[-1]
                    gates = (join @ lp["wi"] + lp["bi"]
                             + h @ lp["wh"] + lp["bh"])
                    i_g = jax.nn.sigmoid(gates[:, :R])
                    g_t = jnp.tanh(gates[:, R:2 * R])
                    f_g = jax.nn.sigmoid(gates[:, 2 * R:3 * R])
                    o_g = jax.nn.sigmoid(gates[:, 3 * R:])
                    c2 = f_g * c + i_g * g_t
                    h2 = o_g * jnp.tanh(c2)
                    merge = join + h2 @ mp["merge"]["w"] + mp["merge"]["b"]
                    score = merge @ mp["cls"]["w"] + mp["cls"]["b"]
                    return score, c2, h2

                def body(k, carry):
                    salt, acc = carry
                    q = q0 + salt.astype(cdt) * 1e-6
                    q_pre = q @ mp["q_proj"]["w"] + mp["q_proj"]["b"]
                    c = jnp.zeros((B, cfg.att_state_dim), cdt)
                    h = jnp.zeros((B, cfg.att_state_dim), cdt)
                    score = None
                    for _hop in range(cfg.n_hops):
                        score, c, h = one_hop(q, c, h, q_pre)
                    ans = jnp.argmax(score, axis=-1)
                    return (salt + 1 + ans[0].astype(jnp.int32) % 3,
                            acc + ans[:1])

                out = jax.lax.fori_loop(
                    0, K, body, (jnp.int32(salt0),
                                 jnp.zeros((1,), jnp.int32)))
            return out[1]

        return chain

    chains = {"dot": make_chain("dot"), "fused": make_chain("fused")}
    # compile both before timing
    outs = {}
    for name, fn in chains.items():
        log(f"compiling {name}...")
        outs[name] = np.asarray(jax.block_until_ready(
            fn(params, q0, feats, 0)))
    # sanity: same argmax answers from both implementations
    agree = bool((outs["dot"] == outs["fused"]).all())

    times = {"dot": [], "fused": []}
    for r in range(args.rounds):
        for name, fn in chains.items():
            t0 = time.perf_counter()
            np.asarray(jax.block_until_ready(
                fn(params, q0, feats, 100 + r)))
            times[name].append((time.perf_counter() - t0) / K * 1e3)
        log(f"round {r}: dot {times['dot'][-1]:.3f} ms, "
            f"fused {times['fused'][-1]:.3f} ms")

    dot_ms = float(np.median(times["dot"]))
    fused_ms = float(np.median(times["fused"]))
    print(json.dumps({
        "batch": B, "chain": K, "rounds": args.rounds,
        "dot_ms": round(dot_ms, 3), "fused_ms": round(fused_ms, 3),
        "dot_all": [round(t, 3) for t in times["dot"]],
        "fused_all": [round(t, 3) for t in times["fused"]],
        "speedup": round(dot_ms / fused_ms, 4),
        "answers_agree": agree,
    }))


if __name__ == "__main__":
    main()
