"""A/B the ViT attention sublayer's XLA formulation (same math).

profile_vit measured the 24-layer MHSA stack at 46.8 ms vs ~21 ms of
matmul speed-of-light (the MLP stack runs ~70% eff, attention ~45%), so
this probes three lowerings of the identical computation:

  v0_einsum4d : current vit._mhsa — [B, h, S, d] batched einsums
  v1_merged   : heads merged into the batch dim — [B*h, S, d] matmuls
  v2_dpa      : jax.nn.dot_product_attention (XLA's fused attention path)
  v3_flash    : jax.experimental.pallas.ops.tpu.flash_attention — the
                library Pallas kernel (softmax logits never touch HBM);
                S=256 divides its 128-min blocks exactly.  TPU-only
                (skipped on a CPU preflight); chipless-compile-checked
                offline before any rig run (mosaic_notes #10).

Chained-dispatch protocol (CLAUDE.md).  Kill criterion: adopt a variant
in models/backbones/vit.py only if it wins >= 3% on the 24-block stack;
otherwise record the tie and keep the readable einsum form.

Usage: python scripts/probe_vit_attn.py [--batch 48] [--chain 5]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--grid", type=int, default=16,
                    help="patch grid side: 16 = the shipped 224-px ViT-L "
                         "(S=256); 32 = a 448-px ViT-L (S=1024), where "
                         "the flash kernel's HBM story inverts")
    args = ap.parse_args()

    from rau_vqa_tpu.utils.rigcheck import bench_preflight, bench_watchdog
    watchdog = bench_watchdog("vit_attn_probe", "ms", timeout_s=3600.0)
    probe = bench_preflight("vit_attn_probe", "ms")
    if probe.get("platform") == "cpu":
        watchdog.cancel()

    import jax
    import jax.numpy as jnp

    from rau_vqa_tpu.models.backbones.vit import VIT_L14, _ln, vit_init

    vc = VIT_L14
    if args.grid != vc.grid:
        import dataclasses
        vc = dataclasses.replace(vc, image_size=args.grid * vc.patch)
    B, K = args.batch, args.chain
    heads, hd = vc.heads, vc.dim // vc.heads
    scale = 1.0 / float(np.sqrt(hd))

    shapes = jax.eval_shape(
        lambda k: vit_init(k, vc, dtype=jnp.bfloat16), jax.random.PRNGKey(1))
    rs = np.random.RandomState(1)
    bb = jax.device_put(jax.tree.map(
        lambda s: (0.02 * rs.standard_normal(s.shape))
        .astype(np.dtype(s.dtype)), shapes))
    x0 = jax.device_put(jnp.asarray(
        0.02 * rs.standard_normal((B, vc.seq, vc.dim)), jnp.bfloat16))

    def attn_core_v0(q, k, v):            # [B, h, S, d] einsums (current)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        att = jax.nn.softmax(att, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", att, v)

    def attn_core_v1(q, k, v):            # heads merged into batch
        Bh = q.shape[0] * q.shape[1]
        S = q.shape[2]
        qf, kf, vf = (t.reshape(Bh, S, hd) for t in (q, k, v))
        att = jnp.einsum("bqd,bkd->bqk", qf, kf) * scale
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bqk,bkd->bqd", att, vf)
        return o.reshape(q.shape)

    def make_mhsa(core):
        def mhsa(x, blk):
            Bx, S, D = x.shape
            qkv = x @ blk["qkv"]["w"] + blk["qkv"]["b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q, k, v = (t.reshape(Bx, S, heads, hd).transpose(0, 2, 1, 3)
                       for t in (q, k, v))
            o = core(q, k, v)
            o = o.transpose(0, 2, 1, 3).reshape(Bx, S, D)
            return o @ blk["proj"]["w"] + blk["proj"]["b"]
        return mhsa

    def mhsa_dpa(x, blk):                  # jax.nn.dot_product_attention
        Bx, S, D = x.shape
        qkv = x @ blk["qkv"]["w"] + blk["qkv"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (t.reshape(Bx, S, heads, hd) for t in (q, k, v))
        o = jax.nn.dot_product_attention(q, k, v)   # scale = 1/sqrt(hd)
        return o.reshape(Bx, S, D) @ blk["proj"]["w"] + blk["proj"]["b"]

    variants = {
        "v0_einsum4d": make_mhsa(attn_core_v0),
        "v1_merged": make_mhsa(attn_core_v1),
        "v2_dpa": mhsa_dpa,
    }

    if jax.devices()[0].platform == "tpu":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)

        def attn_core_v3(q, k, v):         # Pallas flash kernel
            return flash_attention(q, k, v, causal=False, sm_scale=scale)

        variants["v3_flash"] = make_mhsa(attn_core_v3)

        # one-block parity pin: the kernel computes the same softmax(qk)v
        blk0 = jax.tree.map(lambda t: t, bb["blocks"][0])
        ref = jax.jit(make_mhsa(attn_core_v0))(x0, blk0)
        got = jax.jit(variants["v3_flash"])(x0, blk0)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        log(f"probe_vit_attn: v3_flash one-block max|delta| vs v0 = {err:.2e}"
            " (bf16 operands; expect ~1e-2 band)")
        assert err < 0.1, f"flash kernel parity broke: {err}"
    else:
        log("probe_vit_attn: cpu platform — v3_flash (Mosaic) skipped")

    out = {}
    for name, mhsa in variants.items():
        def stack(p, x):
            for blk in p["blocks"]:
                x = x + mhsa(_ln(x, blk["ln1"], vc.ln_eps), blk)
            return x

        def run(p, x, salt):
            def body(i, carry):
                s, _ = carry
                o = stack(p, x + s * jnp.asarray(1e-6, x.dtype))
                return (jnp.mean(o[0]).astype(x.dtype),
                        jnp.mean(o).astype(jnp.float32))
            return jax.lax.fori_loop(
                0, K, body, (jnp.asarray(salt, x.dtype), jnp.float32(0)))[1]

        fn = jax.jit(run)
        t0 = time.perf_counter()
        float(fn(bb, x0, 0.0))
        log(f"probe_vit_attn: {name} compile+first "
            f"{time.perf_counter() - t0:.1f}s")
        times = []
        for r in range(args.rounds):
            t0 = time.perf_counter()
            float(fn(bb, x0, 100.0 + r))
            times.append((time.perf_counter() - t0) / K)
        out[name] = round(float(np.median(times)) * 1e3, 2)
        log(f"probe_vit_attn: {name} {out[name]} ms/iter (24-block stack)")

    from rau_vqa_tpu.utils.rigcheck import matmul_canary
    canary = matmul_canary()
    watchdog.cancel()
    best = min(out, key=out.get)
    print(json.dumps({
        "metric": "vit_attn_stack_ms", "value": out["v0_einsum4d"],
        "unit": "ms", "batch": B, "chain": K, "seq": vc.seq,
        "variants_ms": out,
        "best": best,
        "win_vs_v0": round(out["v0_einsum4d"] / out[best], 4),
        "rig_canary_tflops": canary["tflops"],
        "rig_canary_frac_peak": canary["frac_of_peak"],
    }))


if __name__ == "__main__":
    main()
