"""Measure `rau-vqa precompute-features` throughput on the real chip.

The one number round 3 could not record (the tunnel was hard-hung for the
whole window): raw JPEGs -> native decode pool -> on-TPU backbone ->
packed shard write, images/sec end to end.  Uses SYNTHETIC JPEGs (no
egress on this rig), which is honest for throughput: decode cost depends
on pixel count, not content, and the backbone is content-oblivious.

    python scripts/bench_precompute.py                       # resnet101 448
    python scripts/bench_precompute.py --backbone vgg16 --n 256

Prints ONE JSON line: {"metric": "precompute_images_per_sec", ...} with
the rig canary alongside (same interpretability contract as bench.py).
Compare against bench_pixels' backbone figure (1,188 img/s ResNet-101-448
B=64 bf16) — precompute adds decode + host->device + shard-write overlap.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_images(root: str, n: int, *, w: int = 640, h: int = 480) -> None:
    import numpy as np
    from PIL import Image

    rs = np.random.RandomState(0)
    for i in range(n):
        arr = rs.randint(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"img_{i:05d}.jpg"),
                                  quality=85)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="resnet101",
                    choices=["resnet101", "vgg16"])
    ap.add_argument("--n", type=int, default=512,
                    help="synthetic images (one shard row each)")
    ap.add_argument("--size", type=int, default=448)
    ap.add_argument("--batch", type=int, default=64,
                    help="device batch (B=64 is the measured sweet spot)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float16", "int8"],
                    help="shard STORAGE dtype")
    ap.add_argument("--f32", action="store_true",
                    help="keep f32 backbone compute (default bf16)")
    args = ap.parse_args()

    from rau_vqa_tpu.utils.rigcheck import bench_preflight, bench_watchdog

    watchdog = bench_watchdog("precompute_images_per_sec", "images/sec")
    probe = bench_preflight("precompute_images_per_sec", "images/sec")
    on_cpu = probe.get("platform") == "cpu"
    if on_cpu:
        # deliberate CPU smoke (jax pinned in-process): the hang mode the
        # watchdog exists for cannot occur, and its 'tunnel hung' error
        # line would be a lie if a big CPU sweep just ran long
        watchdog.cancel()

    import jax

    from rau_vqa_tpu.precompute import precompute_features, scan_image_dir

    with tempfile.TemporaryDirectory() as td:
        img_root = os.path.join(td, "imgs")
        out_dir = os.path.join(td, "shard")
        os.makedirs(img_root)
        # 2x images: the warmup sweep and the TIMED sweep must use
        # DISJOINT inputs — identical dispatches can be served from a
        # cache on this rig (CLAUDE.md measuring protocol)
        log(f"bench_precompute: writing {2 * args.n} synthetic JPEGs")
        make_images(img_root, 2 * args.n)
        rel_all = scan_image_dir(img_root)
        rel_warm, rel = rel_all[:args.n], rel_all[args.n:]

        if args.backbone == "resnet101":
            from rau_vqa_tpu.models.backbones.resnet import resnet101_init
            bb = resnet101_init(jax.random.PRNGKey(0))
        else:
            from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
            bb = vgg16_pool5_init(jax.random.PRNGKey(0))

        # first sweep = compile + warm caches; second sweep is the
        # steady-state measurement (same protocol as the benches: never
        # time a first dispatch on this rig)
        log("bench_precompute: warmup sweep (incl. compile)")
        t0 = time.time()
        precompute_features(
            img_root, rel_warm, out_dir + "_warm", args.backbone, bb,
            size=args.size, batch_size=args.batch, dtype=args.dtype,
            compute_dtype=None if args.f32 else "bfloat16")
        warm = time.time() - t0
        log(f"bench_precompute: warmup {warm:.1f}s; timed sweep")
        t0 = time.time()
        store = precompute_features(
            img_root, rel, out_dir, args.backbone, bb,
            size=args.size, batch_size=args.batch, dtype=args.dtype,
            compute_dtype=None if args.f32 else "bfloat16")
        dt = time.time() - t0
        n_rows = len(store.index)

    from rau_vqa_tpu.utils.rigcheck import matmul_canary
    # the full-size canary is a TPU capability probe (~165 TFLOP total);
    # on a CPU smoke run it would take hours — shrink it
    canary = matmul_canary() if not on_cpu else \
        matmul_canary(n=256, iters=4, rounds=1)
    watchdog.cancel()

    img_ps = n_rows / dt
    # the 1,188 img/s baseline is SPECIFICALLY ResNet-101-448 B=64 bf16
    # (bench_pixels): emit the ratio only for that config
    comparable = (args.backbone == "resnet101" and args.size == 448
                  and args.batch == 64 and not args.f32)
    print(json.dumps({
        "metric": "precompute_images_per_sec",
        "value": round(img_ps, 1),
        "unit": "images/sec",
        # vs the from-pixels serving backbone figure at the same shapes
        "vs_baseline": round(img_ps / 1188.0, 4) if comparable else None,
        "backbone": args.backbone,
        "size": args.size,
        "batch": args.batch,
        "storage_dtype": args.dtype,
        "n_images": n_rows,
        "sweep_sec": round(dt, 2),
        "canary_tflops": canary["tflops"],
        "canary_frac_of_peak": canary["frac_of_peak"],
    }), flush=True)


if __name__ == "__main__":
    main()
