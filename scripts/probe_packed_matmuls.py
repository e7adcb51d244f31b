"""Paired probe: packed (concatenated) matmuls vs the stock serial graph.

probe_hop_parts.py showed the hop loop's mandatory HBM streams already run
at ~88% of speed-of-light; the residual ~2.7 ms is base cost spread over
~10 serial matmuls + elementwise links per hop.  The candidate lever is op
COUNT: every matmul that consumes the same activation can be one wide
matmul (identical per-column dot products -> numerically identical under
the same precision):

  hop 'packed':
    [h_proj | att_mem | attlstm.wh](h)     3 matmuls -> 1  ([512, 2756])
    gates = [join | h] @ [wi ; wh]         handled by the h-pack above
    [cls | do_pred](merge)                 2 matmuls -> 1  ([512, 1001])

  encoder 'packed' (layer 2):
    l2 gates = [h1_t | h2_prev] @ [wi ; wh]  2 matmuls -> 1 ([1024, 2048])

Interleaved A/B rounds (rig drift immunity), chained-dispatch protocol.

Usage: python scripts/probe_packed_matmuls.py [--batch 2048] [--rounds 4]
Prints one JSON line with medians for hop_stock/hop_packed/enc_stock/
enc_packed.
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
    ap.add_argument("--rounds", type=int, default=4)
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
    S = cfg.cnn_spat
    rs = np.random.RandomState(0)
    feats = jnp.asarray(rs.randn(B, S, cfg.cnn_dim).astype(np.float32))
    q0 = jnp.asarray(rs.randn(B, cfg.rnnout_dim)
                     .astype(np.float32)).astype(jnp.bfloat16)
    tokens = jnp.asarray(rs.randint(1, cfg.vocab_size, (B, cfg.seq_len))
                         .astype(np.int32))
    lengths = jnp.asarray(rs.randint(1, cfg.seq_len + 1, B)
                          .astype(np.int32))

    # ---- hop loop, stock vs packed --------------------------------------
    def make_hop_chain(packed):
        @jax.jit
        def chain(params, q0, feats, salt0):
            cdt = jnp.dtype(cfg.compute_dtype)
            p = jax.tree.map(lambda x: x.astype(cdt), params)
            mp = p["mult"]
            R = cfg.att_state_dim
            with jax.default_matmul_precision(cfg.matmul_precision):
                ifeat, iatt = embed_image(mp, cfg, feats.astype(cdt))
                lp = mp["attlstm"]["layers"][0]
                if packed:
                    w_h = jnp.concatenate(
                        [mp["h_proj"]["w"], mp["att_mem"]["w"], lp["wh"]],
                        axis=1)                       # [R, M + S + 4R]
                    b_h = jnp.concatenate(
                        [mp["h_proj"]["b"], mp["att_mem"]["b"], lp["bh"]])
                    w_cd = jnp.concatenate(
                        [mp["cls"]["w"], mp["do_pred"]["w"]], axis=1)
                    b_cd = jnp.concatenate(
                        [mp["cls"]["b"], mp["do_pred"]["b"]])

                def one_hop(q, c, h, q_pre):
                    M = cfg.multfeat_dim
                    if packed:
                        hp = h @ w_h + b_h
                        h_proj = hp[:, :M]
                        h_mem = hp[:, M:M + S]
                        h_gates = hp[:, M + S:]
                    else:
                        h_proj = h @ mp["h_proj"]["w"] + mp["h_proj"]["b"]
                        h_mem = h @ mp["att_mem"]["w"] + mp["att_mem"]["b"]
                        h_gates = (h @ lp["wh"] + lp["bh"])
                    qfeat = jnp.tanh(q_pre + h_proj)
                    qatt = qfeat @ mp["att_q"]["w"] + mp["att_q"]["b"]
                    addfeat = jnp.tanh(iatt + qatt[:, None, :])
                    attscore = ((addfeat @ mp["att_score"]["w"])[..., 0]
                                + mp["att_score"]["b"]) + h_mem
                    attprob = jax.nn.softmax(attscore, axis=-1)
                    attfeat = jnp.einsum("bsm,bs->bm", ifeat, attprob)
                    join = (qfeat + attfeat
                            + attprob @ mp["attprob_proj"]["w"]
                            + mp["attprob_proj"]["b"])
                    gates = join @ lp["wi"] + lp["bi"] + h_gates
                    i_g = jax.nn.sigmoid(gates[:, :R])
                    g_t = jnp.tanh(gates[:, R:2 * R])
                    f_g = jax.nn.sigmoid(gates[:, 2 * R:3 * R])
                    o_g = jax.nn.sigmoid(gates[:, 3 * R:])
                    c2 = f_g * c + i_g * g_t
                    h2 = o_g * jnp.tanh(c2)
                    merge = join + h2 @ mp["merge"]["w"] + mp["merge"]["b"]
                    if packed:
                        sd = merge @ w_cd + b_cd
                        score = sd[:, :cfg.answer_size]
                        do_p = sd[:, cfg.answer_size]
                    else:
                        score = merge @ mp["cls"]["w"] + mp["cls"]["b"]
                        do_p = (merge @ mp["do_pred"]["w"]
                                + mp["do_pred"]["b"])[:, 0]
                    # fold do_pred into the carry so neither variant can
                    # dead-code-eliminate it
                    return score + do_p[:, None] * 1e-6, c2, h2

                def body(k, carry):
                    salt, acc = carry
                    q = q0 + salt.astype(cdt) * 1e-6
                    q_pre = q @ mp["q_proj"]["w"] + mp["q_proj"]["b"]
                    c = jnp.zeros((B, R), cdt)
                    h = jnp.zeros((B, R), cdt)
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

    # ---- encoder, stock vs packed l2 ------------------------------------
    def make_enc_chain(packed):
        @jax.jit
        def chain(params, salt0):
            cdt = jnp.dtype(cfg.compute_dtype)
            p = jax.tree.map(lambda x: x.astype(cdt), params)
            Rn = cfg.rnn_size
            l1, l2 = p["rnn"]["layers"]
            with jax.default_matmul_precision(cfg.matmul_precision):
                if packed:
                    w2 = jnp.concatenate([l2["wi"], l2["wh"]], axis=0)

                def lstm(gates, c):
                    i_g = jax.nn.sigmoid(gates[:, :Rn])
                    f_g = jax.nn.sigmoid(gates[:, Rn:2 * Rn])
                    o_g = jax.nn.sigmoid(gates[:, 2 * Rn:3 * Rn])
                    g_t = jnp.tanh(gates[:, 3 * Rn:])
                    c2 = f_g * c + i_g * g_t
                    return c2, o_g * jnp.tanh(c2)

                def body(k, carry):
                    salt, acc = carry
                    emb = jnp.tanh(
                        jnp.take(p["embed"]["lookup"],
                                 jnp.where(tokens > 0,
                                           (tokens + salt) % cfg.vocab_size,
                                           0), axis=0))
                    T = emb.shape[1]
                    g1_all = (emb.reshape(B * T, -1) @ l1["wi"]
                              + l1["bi"]).reshape(B, T, -1)

                    def step(state, xs):
                        g1_t = xs
                        c1, h1, c2, h2 = state
                        c1, h1 = lstm(g1_t + h1 @ l1["wh"] + l1["bh"], c1)
                        if packed:
                            g2 = (jnp.concatenate([h1, h2], axis=1) @ w2
                                  + l2["bi"] + l2["bh"])
                        else:
                            g2 = (h1 @ l2["wi"] + l2["bi"]
                                  + h2 @ l2["wh"] + l2["bh"])
                        c2, h2 = lstm(g2, c2)
                        return (c1, h1, c2, h2), jnp.concatenate(
                            [c1, h1, c2, h2], axis=1)

                    z = jnp.zeros((B, Rn), cdt)
                    _, states = jax.lax.scan(
                        step, (z, z, z, z), jnp.swapaxes(g1_all, 0, 1))
                    qv = states[lengths - 1, jnp.arange(B)]
                    s = qv[0, 0].astype(jnp.float32)
                    return salt + 1 + jnp.int32(s > 0), acc + s

                return jax.lax.fori_loop(
                    0, K, body, (jnp.int32(salt0), jnp.float32(0)))[1]

        return chain

    # build each jitted chain ONCE — constructing the wrapper inside the
    # timing lambda would retrace/recompile every call and time the
    # compile-cache round-trip instead of the device
    hop_stock = make_hop_chain(False)
    hop_packed = make_hop_chain(True)
    enc_stock = make_enc_chain(False)
    enc_packed = make_enc_chain(True)
    chains = {
        "hop_stock": lambda s: hop_stock(params, q0, feats, s),
        "hop_packed": lambda s: hop_packed(params, q0, feats, s),
        "enc_stock": lambda s: enc_stock(params, s),
        "enc_packed": lambda s: enc_packed(params, s),
    }
    built = {}
    for name, fn in chains.items():
        log(f"compiling {name}...")
        built[name] = fn
        np.asarray(jax.block_until_ready(fn(0)))

    times = {v: [] for v in built}
    for r in range(args.rounds):
        for v, fn in built.items():
            t0 = time.perf_counter()
            np.asarray(jax.block_until_ready(fn(100 + r)))
            times[v].append((time.perf_counter() - t0) / K * 1e3)
        log("round %d: %s" % (
            r, ", ".join(f"{v} {times[v][-1]:.2f}" for v in times)))

    out = {"batch": B, "chain": K, "rounds": args.rounds}
    for v in times:
        out[v + "_ms"] = round(float(np.median(times[v])), 3)
    out["hop_speedup"] = round(out["hop_stock_ms"] / out["hop_packed_ms"], 4)
    out["enc_speedup"] = round(out["enc_stock_ms"] / out["enc_packed_ms"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
