"""Measured decomposition of the ViT-L from-pixels serving step.

The first healthy-rig ViT benches (round 4) measured 3-4.5% MFU — ~20x
off the backbone's roofline — with the rig canary healthy in the same
process, so the deficit is in OUR program, not the chip.  This script
times each component with the chained-dispatch protocol bench.py uses
(K iterations inside one jit, data dependence between rounds):

  - vit_full : normalized images -> vit_apply tokens          [B,S,D]
  - patch    : the 14x14/14 patch-embed conv + pos add only
  - blocks   : the 24-block transformer stack on ready tokens
  - mhsa     : the attention sublayer alone, x24
  - mlp      : the MLP sublayer alone, x24
  - head     : the RAU answer path on ready tokens (qpi questions)

component times should roughly add: patch + blocks ~= vit_full,
mhsa + mlp ~= blocks.  Whatever does not add is XLA fusion boundaries.

Usage: python scripts/profile_vit.py [--batch 64] [--chain 5] [--rounds 3]
Prints ONE JSON line; progress to stderr.
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--qpi", type=int, default=3)
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    from rau_vqa_tpu.utils.rigcheck import bench_preflight, bench_watchdog
    # 7 remote compiles (6 chained cases + canary) at the documented
    # 3-460 s/compile tail: budget beyond the 2400 s default or a
    # slow-but-healthy rig trips a spurious 'tunnel hung' abort
    watchdog = bench_watchdog("vit_profile", "ms", timeout_s=4200.0)
    probe = bench_preflight("vit_profile", "ms")
    if probe.get("platform") == "cpu":
        watchdog.cancel()

    import jax
    import jax.numpy as jnp

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.models.backbones.vit import (
        VIT_L14,
        _ln,
        _mhsa,
        vit_apply,
        vit_init,
    )
    from rau_vqa_tpu.models.rau import init_params, rau_forward

    wdt = jnp.float32 if args.f32 else jnp.bfloat16
    cfg = dataclasses.replace(
        get_preset("ours_vit").model, matmul_precision="default",
        compute_dtype="float32" if args.f32 else "bfloat16")
    vc = VIT_L14
    B, Q, K = args.batch, args.qpi, args.chain

    # host-random weights (values don't matter for throughput), staged
    # on device ONCE — numpy jit args re-stage per dispatch (bench_pixels)
    shapes = jax.eval_shape(lambda k: vit_init(k, vc, dtype=wdt),
                            jax.random.PRNGKey(1))
    rs = np.random.RandomState(1)
    bb = jax.device_put(jax.tree.map(
        lambda s: (0.02 * rs.standard_normal(s.shape))
        .astype(np.dtype(s.dtype)), shapes))
    params = jax.device_put(init_params(jax.random.PRNGKey(0), cfg))

    imgs = jax.device_put(jnp.asarray(
        rs.rand(B, vc.image_size, vc.image_size, 3).astype(np.float32)))
    toks = jax.device_put(jnp.asarray(
        rs.randint(1, cfg.vocab_size, (B * Q, cfg.seq_len)), jnp.int32))
    lens = jax.device_put(jnp.asarray(
        rs.randint(1, cfg.seq_len + 1, (B * Q,)), jnp.int32))
    tokens0 = jax.device_put(jnp.asarray(
        0.02 * rs.standard_normal((B, vc.seq, vc.dim)), wdt))

    def patch_only(p, x):
        x = x.astype(p["patch_embed"]["w"].dtype)
        x = jax.lax.conv_general_dilated(
            x, p["patch_embed"]["w"],
            window_strides=(vc.patch, vc.patch), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x.reshape(B, -1, vc.dim) + p["patch_embed"]["b"]
        return x + p["pos_embed"]

    def blocks_only(p, x):
        for blk in p["blocks"]:
            x = x + _mhsa(_ln(x, blk["ln1"], vc.ln_eps), blk, vc.heads)
            h = _ln(x, blk["ln2"], vc.ln_eps)
            h = jax.nn.gelu(h @ blk["fc1"]["w"] + blk["fc1"]["b"],
                            approximate=False)
            x = x + (h @ blk["fc2"]["w"] + blk["fc2"]["b"])
        return _ln(x, p["ln_final"], vc.ln_eps)

    def mhsa_only(p, x):
        for blk in p["blocks"]:
            x = x + _mhsa(_ln(x, blk["ln1"], vc.ln_eps), blk, vc.heads)
        return x

    def mlp_only(p, x):
        for blk in p["blocks"]:
            h = _ln(x, blk["ln2"], vc.ln_eps)
            h = jax.nn.gelu(h @ blk["fc1"]["w"] + blk["fc1"]["b"],
                            approximate=False)
            x = x + (h @ blk["fc2"]["w"] + blk["fc2"]["b"])
        return x

    def head_only(p, feats):
        featsq = jnp.repeat(feats, Q, axis=0)
        out = rau_forward(p, cfg, toks, lens,
                          featsq.astype(wdt))
        return out.scores

    def chained(f, x0):
        """K data-dependent iterations of f inside one jit."""
        def run(p, x, salt):
            def body(i, carry):
                s, _ = carry
                out = f(p, x + (s * jnp.asarray(1e-6, x.dtype)))
                s2 = jnp.mean(out[0]).astype(x.dtype)
                return (s2, jnp.mean(out).astype(jnp.float32))
            return jax.lax.fori_loop(
                0, K, body, (jnp.asarray(salt, x.dtype),
                             jnp.float32(0)))[1]
        return jax.jit(run), x0

    cases = {
        "vit_full": (vit_apply_wrap := lambda p, x: vit_apply(p, vc, x),
                     bb, imgs),
        "patch": (patch_only, bb, imgs),
        "blocks": (blocks_only, bb, tokens0),
        "mhsa": (mhsa_only, bb, tokens0),
        "mlp": (mlp_only, bb, tokens0),
        "head": (head_only, params, tokens0),
    }
    out = {}
    for name, (f, p, x0) in cases.items():
        fn, x = chained(f, x0)
        t0 = time.perf_counter()
        float(fn(p, x, 0.0))
        log(f"profile_vit: {name} compiled+first {time.perf_counter()-t0:.1f}s")
        times = []
        for r in range(args.rounds):
            t0 = time.perf_counter()
            float(fn(p, x, 100.0 + r))
            times.append((time.perf_counter() - t0) / K)
        out[name] = round(float(np.median(times)) * 1e3, 2)
        log(f"profile_vit: {name} {out[name]} ms/iter")

    from rau_vqa_tpu.utils.rigcheck import matmul_canary
    canary = matmul_canary()
    watchdog.cancel()
    print(json.dumps({
        "metric": "vit_profile_ms", "batch": B, "chain": K,
        "value": out["vit_full"], "unit": "ms",
        "components_ms": out,
        "rig_canary_tflops": canary["tflops"],
        "rig_canary_frac_peak": canary["frac_of_peak"],
    }))


if __name__ == "__main__":
    main()
