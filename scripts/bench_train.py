"""Training-step benchmark on the real TPU: ms/step for the full jitted
optimization iteration (forward, joint loss, backward, grad noise, clip,
per-group Adam) of the flagship Ours_MS model.

Protocol (CLAUDE.md): K steps are chained inside ONE jitted dispatch with a
data dependence between iterations (the param/Adam state carries), each
iteration salts the tokens so no two steps are identical, and the final
params are forced to host — per-dispatch timing would otherwise measure the
~30 ms tunnel RTT and identical dispatches can be served from a cache.

Variants:
  plain  — jax.value_and_grad over the unrolled hop loop (XLA saves every
           hop's [B, S, M] ifeat/iatt/addfeat for the backward pass)
  remat  — same, with jax.checkpoint around each hop (cfg.remat_hops)
  fusedN — Pallas fused training hop loop at block_b=N (ops/rau_train_hops.py)
  maskref — fused semantics entirely in XLA (isolates kernel vs mask cost)
  truncN — plain with the token axis truncated to N (the Trainer's
           length-bucket path; exact — tests/test_train.py grad parity)
  accumN — plain with grad_accum=N (k microbatch passes per update;
           measures the lax.scan accumulation overhead vs plain)
  pixels — FROM-PIXELS training: a frozen on-device backbone (derived
           from --preset: ours_resnet->resnet101-448 folded,
           ours_vit->ViT-L, else vgg16-448) computes the [B//qpi, S, D]
           features INLINE in the chained step (the Trainer's featurize
           path, train/trainer.py), repeated qpi questions/image, then
           the full train step runs.  --batch counts QUESTIONS and must
           divide by --qpi.  The capability the reference lacks: it can
           only train on precomputed features (data/get_*.sh).
  finetune — BACKBONE FINE-TUNING: like pixels, but the backbone is the
           4th parameter group (tcfg.train_backbone) and the backward
           pass runs THROUGH it (blockwise remat, conv wgrads, 4-group
           Adam).  Per-question images like the Trainer's loader path
           (qpi duplicates per image).  Even further beyond the
           reference, whose extractor is a separate frozen binary.
  finetunegrp — fine-tuning with image-GROUPED batches: B//qpi UNIQUE
           images run the backbone once each and their features repeat
           to the qpi grouped questions (make_train_step img_repeat) —
           exact gradients, ~qpi x less backbone compute.

Usage: python scripts/bench_train.py [--batch 512] [--variants plain,remat]
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


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[512])
    ap.add_argument("--variants", type=str, default="plain,remat")
    ap.add_argument("--steps", type=int, default=10,
                    help="train steps chained per dispatch")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--f32", action="store_true",
                    help="full-f32 numerics instead of bf16 compute")
    ap.add_argument("--preset", default="ours_ms",
                    help="experiment preset (ours_ms, ours_resnet, ...)")
    ap.add_argument("--qpi", type=int, default=3,
                    help="questions per image for the pixels variant "
                         "(VQA v1 asks ~3)")
    ap.add_argument("--ft-no-remat", action="store_true",
                    help="finetune variant: disable blockwise backbone "
                         "remat (A/B: recompute FLOPs vs activation HBM)")
    ap.add_argument("--pixels-size", type=int, default=0,
                    help="override the pixels variant's image size "
                         "(0 = the preset's native 448; CPU smokes "
                         "shrink with e.g. 64; conv backbones only)")
    args = ap.parse_args()
    for variant in args.variants.split(","):
        if variant in ("pixels", "finetune", "finetunegrp"):
            for B in args.batch:
                if B % args.qpi:
                    raise SystemExit(
                        f"{variant} variant: --batch {B} (questions) must "
                        f"divide by --qpi {args.qpi} (images are "
                        f"repeated qpi times)")
            if args.pixels_size and args.pixels_size % 32:
                raise SystemExit("--pixels-size must be a multiple of 32 "
                                 "(the conv backbones' total stride)")
            if args.pixels_size and args.preset == "ours_vit":
                raise SystemExit("--pixels-size cannot shrink ViT (fixed "
                                 "patch grid); use a conv preset")

    # outage guards (CLAUDE.md): deadline + hang-proof probe BEFORE any
    # device touch; a CPU-pinned smoke cancels the watchdog
    from rau_vqa_tpu.utils.rigcheck import (
        bench_preflight,
        bench_watchdog,
        enable_compile_cache_for_probe,
    )
    watchdog = bench_watchdog("train_ms_per_step", "ms")
    probe = bench_preflight("train_ms_per_step", "ms")
    if probe.get("platform") == "cpu":
        watchdog.cancel()
    enable_compile_cache_for_probe(
        probe, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.models.rau import init_params
    from rau_vqa_tpu.train.losses import hop_grad_scale
    from rau_vqa_tpu.train.trainer import init_train_state, make_train_step

    preset = get_preset(args.preset)
    results = {}
    for B in args.batch:
        for variant in args.variants.split(","):
            numerics = (dict(matmul_precision="highest",
                             compute_dtype="float32") if args.f32 else
                        dict(matmul_precision="default",
                             compute_dtype="bfloat16"))
            # variant "fusedN" = fused training kernel with block_b=N;
            # "maskref" = fused semantics entirely in XLA (counter-hash
            # masks, plain autodiff) — isolates kernel cost from mask cost
            trunc_T = None
            if variant == "maskref":
                numerics.update(fused_train=True,
                                fused_train_impl="reference")
            elif variant.startswith("fused"):
                numerics.update(fused_train=True,
                                fused_train_block=int(variant[5:] or 16))
            elif variant.startswith("trunc"):
                trunc_T = int(variant[5:])
            mcfg = dataclasses.replace(
                preset.model, remat_hops=(variant == "remat"), **numerics)
            is_pixels = variant == "pixels"
            is_ft = variant in ("finetune", "finetunegrp")
            is_grp = variant == "finetunegrp"
            if (is_pixels or is_ft) and args.pixels_size:
                g = args.pixels_size // 32
                mcfg = dataclasses.replace(mcfg, cnn_w=g, cnn_h=g)
            tcfg = preset.train
            if variant.startswith("accum"):
                # exact gradient accumulation: k sequential microbatches per
                # update — measures the scan/accumulate overhead vs plain
                tcfg = dataclasses.replace(tcfg,
                                           grad_accum=int(variant[5:] or 4))
            if is_ft:
                tcfg = dataclasses.replace(
                    tcfg, train_backbone=True,
                    backbone_remat=not args.ft_no_remat)

            rs = np.random.RandomState(0)
            tokens = jnp.asarray(rs.randint(
                1, mcfg.vocab_size, (B, mcfg.seq_len)).astype(np.int32))
            lengths = jnp.asarray(
                rs.randint(1, mcfg.seq_len + 1, B).astype(np.int32))
            if trunc_T is not None:
                # the Trainer's bucket path: token axis sliced host-side
                tokens = tokens[:, :trunc_T]
                lengths = jnp.minimum(lengths, trunc_T)
            backbone = None
            if is_pixels or is_ft:
                # backbone weights ride as a jit ARG / in the STATE
                # (device-resident once), same rationale as bench_pixels.py.
                # finetune: a NON-folded resnet tree (BN folding is a
                # frozen-serving transform; training keeps conv+BN)
                from rau_vqa_tpu.models.pipeline import extract_features
                from rau_vqa_tpu.utils.benchparams import random_backbone
                backbone = {"ours_resnet": "resnet101",
                            "ours_vit": "vit"}.get(args.preset, "vgg16")
                wdtype = jnp.float32 if args.f32 else jnp.bfloat16
                bb_host, img_size = random_backbone(
                    backbone, 1, wdtype, fold_bn=is_pixels)
                if args.pixels_size:
                    img_size = args.pixels_size
                bb = None if is_ft else jax.device_put(bb_host)
                n_img = B if (is_ft and not is_grp) else B // args.qpi
                images = jnp.asarray(rs.randint(
                    0, 256, (n_img, img_size, img_size, 3))
                    .astype(np.uint8))
                feats = None
            else:
                feats = jnp.asarray(rs.randn(
                    B, mcfg.cnn_spat, mcfg.cnn_dim).astype(np.float32))
            state = init_train_state(jax.random.PRNGKey(0), mcfg,
                                     bb_params=bb_host if is_ft else None)
            labels = jnp.asarray(
                rs.randint(0, mcfg.answer_size, B).astype(np.int32))
            hop_scale = hop_grad_scale(
                mcfg.n_hops, scale_by_nhop=tcfg.hop_grad_scale_nhop,
                stop_timing=tcfg.hop_stop_timing, epoch=1)

            step_fn = make_train_step(mcfg, tcfg,
                                      backbone=backbone if is_ft else None,
                                      img_repeat=args.qpi if is_grp else 1)
            K = args.steps

            @jax.jit
            def chain_fn(state, bb_arg, images_arg, salt0):
                def body(k, carry):
                    st, salt = carry
                    toks = jnp.where(
                        tokens > 0,
                        (tokens + salt + k) % mcfg.vocab_size, 0)
                    if is_pixels:
                        # salt the pixels per iteration: the backbone pass
                        # must NOT be loop-invariant or XLA hoists it out
                        # of the fori_loop and the bench measures one
                        # featurization per K steps
                        imgs = jnp.bitwise_xor(
                            images_arg, (salt + k).astype(jnp.uint8))
                        fx = extract_features(backbone, bb_arg, imgs)
                        fx = jnp.repeat(fx.astype(
                            jnp.float32 if args.f32 else jnp.bfloat16),
                            args.qpi, axis=0)
                    elif is_ft:
                        # the fine-tuning step consumes raw uint8 pixels
                        # (per-question images, the Trainer's loader
                        # layout); the param-state data dependence already
                        # prevents hoisting, the salt dodges caching
                        fx = jnp.bitwise_xor(
                            images_arg, (salt + k).astype(jnp.uint8))
                    else:
                        fx = feats
                    st, metrics = step_fn(st, toks, lengths, fx, labels,
                                          hop_scale, jnp.float32(3e-3),
                                          jnp.float32(3e-4))
                    return st, salt
                st, _ = jax.lax.fori_loop(0, K, body, (state, salt0))
                return st

            # images/bb ride as jit ARGUMENTS (device-resident once): a
            # closure constant would bake ~72 MB of uint8 pixels into the
            # lowered program and re-ship it through the ~15 MB/s tunnel
            # on every compile (same rationale as bench_pixels's weights)
            if is_pixels or is_ft:
                # finetune: bb is None — the backbone rides in the STATE
                def chain(state, salt0):
                    return chain_fn(state, bb, images, salt0)
            else:
                def chain(state, salt0):
                    return chain_fn(state, None, None, salt0)

            t0 = time.perf_counter()
            out = chain(state, jnp.int32(0))
            np.asarray(out.params["mult"]["cls"]["b"])
            log(f"[{variant} B={B}] compile+first {time.perf_counter()-t0:.1f}s")
            # warm second dispatch (different salt: no cache)
            np.asarray(chain(state, jnp.int32(7)).params["mult"]["cls"]["b"])

            t0 = time.perf_counter()
            for r in range(args.rounds):
                out = chain(state, jnp.int32(100 + r))
                np.asarray(out.params["mult"]["cls"]["b"])
            dt = time.perf_counter() - t0
            ms = dt / (args.rounds * K) * 1e3
            eps = B / (ms / 1e3)
            log(f"[{variant} B={B}] {ms:.2f} ms/step  "
                f"({eps:,.0f} examples/sec)")
            if is_pixels:
                log(f"[{variant} B={B}] from-pixels training: "
                    f"{eps / args.qpi:,.0f} images/sec "
                    f"({B // args.qpi} images/step, qpi={args.qpi})")
            elif is_ft:
                n_per_step = B // args.qpi if is_grp else B
                log(f"[{variant} B={B}] backbone fine-tuning: "
                    f"{eps / args.qpi:,.0f} unique images/sec "
                    f"({n_per_step} backbone images/step, qpi={args.qpi}"
                    f"{' grouped' if is_grp else ' duplicates'})")
            results[f"{variant}_b{B}"] = round(ms, 3)

    from rau_vqa_tpu.utils.rigcheck import matmul_canary
    canary = matmul_canary()
    log(f"bench_train: rig canary {canary['tflops']} TFLOP/s")
    watchdog.cancel()
    # headline = the first variant/batch requested; 32.8 ms/step is the
    # measured round-2 plain-b512 baseline (BASELINE.md training table),
    # so the ratio is only meaningful when THAT config was measured —
    # otherwise emit null rather than a cross-config non-ratio
    head = next(iter(results.values()))
    base = results.get("plain_b512")
    print(json.dumps({
        "metric": "train_ms_per_step", "value": head, "unit": "ms",
        "vs_baseline": round(32.8 / base, 3) if base else None,
        "results": results,
        "rig_canary_tflops": canary["tflops"],
        "rig_canary_frac_peak": canary["frac_of_peak"],
    }))


if __name__ == "__main__":
    main()
