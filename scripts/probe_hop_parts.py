"""Knock-out decomposition of the 8-hop answering loop (serving shapes).

probe_hop_fusion.py falsified the addfeat-materialization hypothesis (the
fused multiply-reduce score ties the dot: XLA already fuses the producer).
This probe locates the hop loop's actual ~9.6 ms by removing one component
at a time from the full loop (same chained-dispatch protocol, interleaved
rounds so rig drift can't fake a delta):

  full     : the real loop (baseline)
  notanh   : score tanh -> identity            (isolates VPU transcendental)
  noscore  : content attention removed          (isolates iatt read + score)
  nopool   : attfeat einsum -> ifeat[:, 0, :]   (isolates ifeat read + pool)
  nosmall  : ATTLSTM/merge/classifier removed   (isolates the [B, .] matmuls)

Numerics differ per variant (that's the point); each keeps the hop-serial
data dependence intact so nothing can be hoisted across hops.

Usage: python scripts/probe_hop_parts.py [--batch 2048] [--rounds 4]
Prints one JSON line with median ms per variant.
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
    rs = np.random.RandomState(0)
    feats = jnp.asarray(rs.randn(B, cfg.cnn_spat, cfg.cnn_dim)
                        .astype(np.float32))
    q0 = jnp.asarray(rs.randn(B, cfg.rnnout_dim)
                     .astype(np.float32)).astype(jnp.bfloat16)

    def make_chain(variant):
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
                    if variant == "noscore":
                        attscore = jnp.zeros((B, cfg.cnn_spat), cdt)
                    else:
                        act = (iatt + qatt[:, None, :]) if variant == "notanh" \
                            else jnp.tanh(iatt + qatt[:, None, :])
                        attscore = ((act @ mp["att_score"]["w"])[..., 0]
                                    + mp["att_score"]["b"])
                    attscore = (attscore + h @ mp["att_mem"]["w"]
                                + mp["att_mem"]["b"])
                    attprob = jax.nn.softmax(attscore, axis=-1)
                    if variant == "nopool":
                        attfeat = ifeat[:, 0, :] * attprob[:, :1]
                    else:
                        attfeat = jnp.einsum("bsm,bs->bm", ifeat, attprob)
                    join = (qfeat + attfeat
                            + attprob @ mp["attprob_proj"]["w"]
                            + mp["attprob_proj"]["b"])
                    if variant == "nosmall":
                        # keep the serial dependence, drop the 5 [B, .]
                        # matmuls (ATTLSTM gates, merge, cls)
                        c2 = c + join[:, :c.shape[-1]]
                        h2 = jnp.tanh(c2)
                        score = join
                        return score, c2, h2
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

    variants = ["full", "notanh", "noscore", "nopool", "nosmall"]
    chains = {v: make_chain(v) for v in variants}
    for v in variants:
        log(f"compiling {v}...")
        np.asarray(jax.block_until_ready(chains[v](params, q0, feats, 0)))

    times = {v: [] for v in variants}
    for r in range(args.rounds):
        for v in variants:
            t0 = time.perf_counter()
            np.asarray(jax.block_until_ready(
                chains[v](params, q0, feats, 100 + r)))
            times[v].append((time.perf_counter() - t0) / K * 1e3)
        log("round %d: %s" % (
            r, ", ".join(f"{v} {times[v][-1]:.2f}" for v in variants)))

    out = {"batch": B, "chain": K, "rounds": args.rounds}
    for v in variants:
        out[v + "_ms"] = round(float(np.median(times[v])), 3)
    full = out["full_ms"]
    for v in variants[1:]:
        out[v + "_delta_ms"] = round(full - out[v + "_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
