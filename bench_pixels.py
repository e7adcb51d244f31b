"""From-pixels serving benchmark: images+questions -> answers, one program.

BASELINE.json's north star is literally end-to-end image+question->answer
(configs[3]: "Ours_ResNet run on-TPU end-to-end, features not
precomputed").  The reference never runs this path on-line — it precomputes
per-image features with separate scripts (data/get_resnet_101_448.sh,
vqa_prepro_loader.lua:1045-1068) and amortizes them over the ~3 questions
VQA v1 asks per image.  This bench measures the REAL fused serving
pattern at that ratio: one jitted program takes a uint8 image batch +
``qpi`` questions per image, runs normalize -> backbone -> feature repeat
-> the full 8-hop RAU answer path, and K iterations are chained inside one
dispatch with a data dependence between rounds (same tunnel-proof protocol
as bench.py — per-dispatch timing would measure the ~30 ms RTT).

Prints ONE JSON line: questions/sec/chip (at qpi questions/image),
images/sec, backbone MFU, spread.  Baseline: the 5,000 q/s north star.

Usage: python bench_pixels.py [--backbone resnet101|vgg16] [--batch 64]
                              [--qpi 3] [--chain 10] [--rounds 5]
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
PEAK_FLOPS = 197e12          # v5e bf16


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="resnet101",
                    choices=["resnet101", "vgg16", "vit"])
    ap.add_argument("--batch", type=int, default=120,
                    help="images per step; the measured ResNet-101-448 "
                         "bf16 curve (img/s): 64:1494 80:1715 96:1792 "
                         "104:1627 112:1834 120:1862 128:1682 — ragged "
                         "XLA tiling effects, 120 is the measured peak")
    ap.add_argument("--qpi", type=int, default=3, help="questions per image")
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--size", type=int, default=448)
    ap.add_argument("--f32", action="store_true",
                    help="keep f32 weights (default: bf16 end-to-end)")
    ap.add_argument("--no-fold-bn", action="store_true",
                    help="keep separate BN ops (default: fold into convs)")
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth stem rewrite — measured SLOWER on "
                         "this toolchain (59.8 vs 53.9 ms/step B=64: XLA "
                         "already handles the C=3 stem; the manual shuffle "
                         "only adds traffic), kept for A/B")
    ap.add_argument("--no-s2d", action="store_true",
                    help="(default; kept for compatibility)")
    ap.add_argument("--int8", action="store_true",
                    help="experimental int8 backbone (s8s8s32 convs, "
                         "dynamic activation quant; resnet101 only)")
    ap.add_argument("--fused-stages", default="",
                    help="comma list of ResNet stage indices (0-3) whose "
                         "identity blocks run through the VMEM-resident "
                         "Pallas stage kernel (ops/fused_resnet.py) — the "
                         "VERDICT r3 #2 block-fusion A/B; requires the "
                         "folded resnet101 tree")
    ap.add_argument("--fused-block-b", type=int, default=0,
                    help="batch tile for the fused stage kernel "
                         "(0 = auto: ~2k matmul rows per grid step, "
                         "matching resnet101_apply)")
    ap.add_argument(
        "--artifact", metavar="DIR", nargs="?",
        const="", default=None,
        help="run the timed protocol from an AOT StableHLO artifact of the "
             "chained program (built here if missing/stale — tracing only, "
             "works offline) instead of jit-compiling it; default DIR is "
             "benchmarks/artifacts/pixels_chain_<backbone><size>")
    args = ap.parse_args()

    # pure-flag validation first: a typo must fail instantly,
    # before the watchdog/preflight/any device touch
    if args.s2d and (args.no_fold_bn or args.int8):
        raise SystemExit("--s2d needs the folded f32/bf16 tree: it cannot "
                         "combine with --no-fold-bn or --int8")
    if args.int8 and args.no_fold_bn:
        raise SystemExit("--int8 quantizes the FOLDED tree: it cannot "
                         "combine with --no-fold-bn")
    if args.backbone != "resnet101" and (args.int8 or args.s2d):
        raise SystemExit(f"--int8/--s2d are resnet101 variants; the "
                         f"emitted JSON would mislabel a plain "
                         f"{args.backbone} run as the requested variant")
    if args.rounds < 1:
        raise SystemExit("--rounds must be >= 1")
    if args.artifact is not None and args.int8:
        # int8 substitutes a different apply fn (not a tree-structural
        # variant) — a cached artifact could silently pin the wrong program
        raise SystemExit("--artifact does not support --int8 (a retired "
                         "A/B variant; run it live)")
    try:
        fused_stages = tuple(int(s) for s in
                             args.fused_stages.split(",") if s != "")
    except ValueError:
        raise SystemExit(f"--fused-stages wants comma-separated ints, "
                         f"got {args.fused_stages!r}")
    if fused_stages and not set(fused_stages) <= {0, 1, 2, 3}:
        raise SystemExit("--fused-stages indices must be in 0..3")
    if fused_stages and (args.backbone != "resnet101" or args.no_fold_bn
                         or args.int8 or args.s2d):
        raise SystemExit("--fused-stages needs the plain folded resnet101 "
                         "tree (no --no-fold-bn/--int8/--s2d)")
    if fused_stages and args.artifact is not None:
        # Pallas lowers to a Mosaic custom call; keep the exported
        # artifacts pure StableHLO
        raise SystemExit("--fused-stages is a live A/B; it cannot be "
                         "exported to an --artifact")

    # armed BEFORE the first device touch: a hung tunnel blocks forever
    # and a hung bench is an uninterpretable artifact
    from rau_vqa_tpu.utils.rigcheck import bench_watchdog
    watchdog = bench_watchdog("pixels_questions_per_sec_per_chip",
                              "questions/sec")
    # fast hang-proof probe: a hard-hung tunnel fails in ~4 min with the
    # same parseable error line instead of burning the 2400 s deadline
    from rau_vqa_tpu.utils.rigcheck import bench_preflight
    probe = bench_preflight("pixels_questions_per_sec_per_chip",
                            "questions/sec")
    if probe.get("platform") == "cpu":
        # deliberate CPU smoke: cancel — a false 'tunnel hung' error line
        # on a long host run would be a lie (see bench.py)
        watchdog.cancel()

    # persistent executable cache: a re-run of this unchanged program
    # loads the compiled binary instead of re-paying the remote compile
    from rau_vqa_tpu.utils.rigcheck import enable_compile_cache_for_probe
    enable_compile_cache_for_probe(
        probe, os.path.dirname(os.path.abspath(__file__)))

    import jax
    import jax.numpy as jnp

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.models.backbones.resnet import resnet101_init
    from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
    from rau_vqa_tpu.models.rau import init_params

    preset = {"resnet101": "ours_resnet", "vgg16": "ours_ms",
              "vit": "ours_vit"}[args.backbone]
    wdtype = jnp.float32 if args.f32 else jnp.bfloat16
    if args.backbone == "vit":
        from rau_vqa_tpu.models.backbones.vit import VIT_L14
        args.size = VIT_L14.image_size        # 224, 16x16 patch grid
        grid = VIT_L14.grid
    else:
        grid = args.size // 32
    cfg = dataclasses.replace(
        get_preset(preset).model,
        cnn_w=grid, cnn_h=grid,
        matmul_precision="default",
        compute_dtype="float32" if args.f32 else "bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    # host-side random weights with the init fn's exact structure (shared
    # with bench_train's from-pixels variant — utils/benchparams.py)
    from rau_vqa_tpu.utils.benchparams import np_params_like as _npl

    def np_params_like(init_fn, seed):
        return _npl(init_fn, seed, wdtype)

    apply_override = None
    if args.backbone == "resnet101":
        bb = np_params_like(resnet101_init, 1)
        if args.int8 or not args.no_fold_bn:
            from rau_vqa_tpu.models.backbones.resnet import (
                fold_batchnorm,
                space_to_depth_stem,
            )
            bb = fold_batchnorm(bb)
            if args.int8:
                from rau_vqa_tpu.models.backbones.resnet import (
                    quantize_resnet,
                    resnet101_apply_int8,
                )
                bb = quantize_resnet(bb)
                apply_override = resnet101_apply_int8
            elif args.s2d:
                bb = space_to_depth_stem(bb)
    elif args.backbone == "vit":
        from rau_vqa_tpu.models.backbones.vit import VIT_L14, vit_init
        bb = np_params_like(
            lambda k, dtype: vit_init(k, VIT_L14, dtype=dtype), 1)
    else:
        bb = np_params_like(vgg16_pool5_init, 1)
    # stage the weights on device ONCE: numpy jit args are re-staged on
    # EVERY dispatch (ViT-L bf16 is ~610 MB — re-hashing it per timed
    # round both inflated the time and produced 20%+ spread; production
    # serving has resident weights).  The folded resnet tree is already
    # device-resident (fold_batchnorm returns jnp arrays); this makes the
    # vgg/vit/unfolded paths match.
    bb = jax.device_put(bb)

    B, Q, K = args.batch, args.qpi, args.chain
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.randint(0, 256, (B, args.size, args.size, 3))
                         .astype(np.uint8))
    tokens = jnp.asarray(rs.randint(1, cfg.vocab_size, (B * Q, cfg.seq_len))
                         .astype(np.int32))
    lengths = jnp.asarray(rs.randint(1, cfg.seq_len + 1, B * Q)
                          .astype(np.int32))

    feat_dt = jnp.float32 if args.f32 else jnp.bfloat16
    n_acc = min(4, B * Q)   # accumulator columns (B*Q can be < 4)

    # weights ride as jit ARGUMENTS like bench.py's params — closure
    # constants would bake ~100MB+ of weights into the HLO and re-upload
    # them through the tunnel for every compile (serve_chain AND the MFU
    # lower below).  The chained program is defined once in eval/chain.py,
    # shared verbatim between this live path and the AOT artifact.
    from rau_vqa_tpu.eval.chain import make_pixels_chain

    def chain_fn(k):
        return make_pixels_chain(cfg, args.backbone, k, Q, n_acc,
                                 feat_dtype=feat_dt,
                                 apply_override=apply_override,
                                 fused_stages=fused_stages,
                                 fused_block_b=args.fused_block_b)

    if args.artifact is not None:
        from rau_vqa_tpu.eval.export import (
            export_pixels_chain,
            load_or_build_chain_artifact,
        )
        variant = args.backbone + str(args.size) + \
            ("_s2d" if args.s2d else "") + \
            ("_nofold" if args.no_fold_bn else "") + \
            ("_f32" if args.f32 else "")
        art_dir = args.artifact or os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "benchmarks", "artifacts", f"pixels_chain_{variant}")
        serve_chain = load_or_build_chain_artifact(
            art_dir,
            lambda: export_pixels_chain(
                bb, params, cfg, args.backbone, art_dir, batch=B, chain=K,
                qpi=Q, image_size=args.size, n_acc=n_acc,
                extra_meta={"variant": variant}),
            {"kind": "pixels_chain", "batch": B, "chain": K, "qpi": Q,
             "image_size": args.size, "variant": variant,
             "model_config": dataclasses.asdict(cfg)}, log=log)
        log("bench_pixels: timing from AOT artifact (no Python trace)")
    else:
        serve_chain = jax.jit(chain_fn(K))

    log(f"bench_pixels: compiling {args.backbone} B={B} qpi={Q} "
        f"{'f32' if args.f32 else 'bf16'}")
    t0 = time.perf_counter()
    np.asarray(serve_chain(bb, params, images, tokens, lengths,
                           jnp.int32(0))[1])
    t_first = time.perf_counter() - t0
    log(f"bench_pixels: compile+first {t_first:.1f}s")
    np.asarray(serve_chain(bb, params, images, tokens, lengths,
                           jnp.int32(5))[1])

    times = []
    for r in range(args.rounds):
        t0 = time.perf_counter()
        acc = np.asarray(serve_chain(bb, params, images, tokens, lengths,
                                     jnp.int32(100 + r))[1])
        times.append(time.perf_counter() - t0)
    # rig-health canary ADJACENT to the timed rounds (after the variable
    # remote compile) — time-stamps rig capability (utils/rigcheck.py)
    from rau_vqa_tpu.utils.rigcheck import matmul_canary
    canary = matmul_canary()
    log(f"bench_pixels: rig canary {canary['tflops']} TFLOP/s "
        f"({canary['frac_of_peak'] * 100:.1f}% of v5e bf16 peak)")

    assert acc.shape == (cfg.n_hops + 2, n_acc)
    dt = float(np.median(times))
    spread = (max(times) - min(times)) / dt
    img_ps = K * B / dt
    qps = img_ps * Q
    log(f"bench_pixels: {dt / K * 1e3:.2f} ms/step of {B} images "
        f"(median of {args.rounds}, spread {spread * 100:.1f}%)")

    mfu = None
    try:
        if args.artifact is not None:
            # the MFU probe lowers+compiles a second program — exactly the
            # compile tax artifact mode exists to avoid
            raise RuntimeError("skipped in --artifact mode")
        # a K=1 chain is one serving step (the fori_loop collapses)
        compiled = jax.jit(chain_fn(1)).lower(
            bb, params, images, tokens, lengths, jnp.int32(0)).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost["flops"])
        mfu = flops / (dt / K) / PEAK_FLOPS
        log(f"bench_pixels: {flops / B / 1e9:.2f} GFLOP/image(+{Q}q), "
            f"MFU {mfu * 100:.2f}%")
    except Exception as e:  # noqa: BLE001 — cost_analysis isn't stable API
        log(f"bench_pixels: cost_analysis unavailable ({e})")

    watchdog.cancel()
    print(json.dumps({
        "metric": "pixels_questions_per_sec_per_chip",
        "value": round(qps, 1),
        "unit": "questions/sec",
        "vs_baseline": round(qps / NORTH_STAR_QPS, 3),
        "images_per_sec": round(img_ps, 1),
        "questions_per_image": Q,
        "backbone": args.backbone,
        **({"fused_stages": list(fused_stages),
            "fused_block_b": args.fused_block_b} if fused_stages else {}),
        "batch": B,
        "spread": round(spread, 4),
        "compile_first_s": round(t_first, 1),
        "rig_canary_tflops": canary["tflops"],
        "rig_canary_frac_peak": canary["frac_of_peak"],
        **({"artifact": True} if args.artifact is not None else {}),
        **({"mfu": round(mfu, 4)} if mfu is not None else {}),
    }))


if __name__ == "__main__":
    main()
