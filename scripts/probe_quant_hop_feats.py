"""Paired probe: int8-quantized hop-loop image features vs bf16.

The hop loop is HBM-bound on its per-hop reads of ifeat [B, S, M] and
iatt [B, S, F] (BASELINE.md roofline follow-up: ~85-90% of the bound,
all rewrite candidates tied).  The only lever left that REMOVES traffic
without the retired cross-hop-VMEM kernel is narrower storage:

  - ifeat = tanh(...) is bounded in [-1, 1] -> int8 at the fixed scale
    127 is a ~0.4%-step quantization, no per-example bookkeeping;
  - iatt is an affine map of ifeat -> per-BATCH scalar scale (max-abs).

Dequantization is a cast+multiply the consumers can fuse into their
operand reads (probe_hop_fusion.py showed this toolchain fuses producers
into dot operands), so HBM sees 1 byte/element instead of 2:
616 MB/hop -> 308 MB/hop at B=2048.

This probe times the full 8-hop loop both ways (interleaved rounds) and
reports the final-hop OE argmax agreement between the two paths as the
accuracy signal (the real accuracy gate is the fixture eval, run
separately if this wins).

Usage: python scripts/probe_quant_hop_feats.py [--batch 2048] [--rounds 5]
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

    def make_chain(quant):
        @jax.jit
        def chain(params, q0, feats, salt0):
            cdt = jnp.dtype(cfg.compute_dtype)
            p = jax.tree.map(lambda x: x.astype(cdt), params)
            mp = p["mult"]
            R = cfg.att_state_dim
            with jax.default_matmul_precision(cfg.matmul_precision):
                ifeat, iatt = embed_image(mp, cfg, feats.astype(cdt))
                if quant:
                    # ifeat in [-1, 1]: fixed scale.  iatt: per-batch scale.
                    ifeat_q = jnp.round(ifeat.astype(jnp.float32) * 127.0
                                        ).astype(jnp.int8)
                    s_iatt = (jnp.max(jnp.abs(iatt.astype(jnp.float32)))
                              / 127.0).astype(cdt)
                    iatt_q = jnp.round(iatt.astype(jnp.float32)
                                       / s_iatt.astype(jnp.float32)
                                       ).astype(jnp.int8)
                    ifeat_use = None   # consumed in-quantized below
                else:
                    ifeat_use, iatt_use = ifeat, iatt

                def one_hop(q, c, h, q_pre):
                    qfeat = jnp.tanh(q_pre + h @ mp["h_proj"]["w"]
                                     + mp["h_proj"]["b"])
                    qatt = qfeat @ mp["att_q"]["w"] + mp["att_q"]["b"]
                    if quant:
                        iatt_deq = iatt_q.astype(cdt) * s_iatt
                        addfeat = jnp.tanh(iatt_deq + qatt[:, None, :])
                    else:
                        addfeat = jnp.tanh(iatt_use + qatt[:, None, :])
                    attscore = ((addfeat @ mp["att_score"]["w"])[..., 0]
                                + mp["att_score"]["b"])
                    attscore = (attscore + h @ mp["att_mem"]["w"]
                                + mp["att_mem"]["b"])
                    attprob = jax.nn.softmax(attscore, axis=-1)
                    if quant:
                        attfeat = jnp.einsum(
                            "bsm,bs->bm", ifeat_q.astype(cdt),
                            attprob) * cdt.type(1.0 / 127.0)
                    else:
                        attfeat = jnp.einsum("bsm,bs->bm", ifeat_use,
                                             attprob)
                    join = (qfeat + attfeat
                            + attprob @ mp["attprob_proj"]["w"]
                            + mp["attprob_proj"]["b"])
                    lp = mp["attlstm"]["layers"][0]
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
                    c = jnp.zeros((B, R), cdt)
                    h = jnp.zeros((B, R), cdt)
                    score = None
                    for _hop in range(cfg.n_hops):
                        score, c, h = one_hop(q, c, h, q_pre)
                    ans = jnp.argmax(score, axis=-1)
                    return (salt + 1 + ans[0].astype(jnp.int32) % 3,
                            acc.at[k % 8].set(ans[::257].astype(jnp.int32)))

                out = jax.lax.fori_loop(
                    0, K, body,
                    (jnp.int32(salt0),
                     jnp.zeros((8, (B + 256) // 257), jnp.int32)))
            return out[1]

        return chain

    full = make_chain(False)
    quant = make_chain(True)
    log("compiling full...")
    a_full = np.asarray(jax.block_until_ready(full(params, q0, feats, 0)))
    log("compiling int8...")
    a_quant = np.asarray(jax.block_until_ready(quant(params, q0, feats, 0)))
    agree = float((a_full == a_quant).mean())

    times = {"full": [], "int8": []}
    for r in range(args.rounds):
        for name, fn in (("full", full), ("int8", quant)):
            t0 = time.perf_counter()
            np.asarray(jax.block_until_ready(fn(params, q0, feats, 100 + r)))
            times[name].append((time.perf_counter() - t0) / K * 1e3)
        log(f"round {r}: full {times['full'][-1]:.2f} ms, "
            f"int8 {times['int8'][-1]:.2f} ms")

    full_ms = float(np.median(times["full"]))
    int8_ms = float(np.median(times["int8"]))
    print(json.dumps({
        "batch": B, "chain": K, "rounds": args.rounds,
        "full_ms": round(full_ms, 3), "int8_ms": round(int8_ms, 3),
        "full_all": [round(t, 3) for t in times["full"]],
        "int8_all": [round(t, 3) for t in times["int8"]],
        "speedup": round(full_ms / int8_ms, 4),
        "sampled_argmax_agreement": round(agree, 4),
    }))


if __name__ == "__main__":
    main()
