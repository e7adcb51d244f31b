#!/usr/bin/env python
"""Fine-tuning accuracy A/B: frozen vs trained backbone, same budget.

VERDICT r4 #2: ``--train-backbone`` had throughput numbers and
parity-pinned gradients but no run where fine-tuning IMPROVES held-out
accuracy over the frozen-backbone baseline.  This is that experiment,
engineered to be decidable zero-asset:

- The image fixture's ``texture`` mode encodes the class as stripe
  orientation x period with first-order statistics equalized (identical
  pixel mean/variance per class — pinned by test).  A FROZEN random
  backbone's pooled features carry the class only through accidental
  filter selectivity, so the head-only arm plateaus near the question
  prior; the fine-tuned arm must LEARN spatial filters to exceed it.
- Both arms share everything else: the same down-scaled random vgg16
  init (cli.py's x0.72, the measured anti-saturation scale), the same
  RMS feature interface (backbone_feat_norm), head dims, LRs, data
  order, and epoch budget.  The only difference is train_backbone.

Success = the fine-tuned arm's best held-out best-hop accuracy clearly
above the frozen arm's, with grad_norm_backbone alive through training
(recorded per epoch in the result JSON).
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

OUT_DIR = os.path.join(_REPO, "benchmarks", "ft_accuracy")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _build(root: str, workdir: str, *, train_backbone: bool, args):
    import jax

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data.images import ImageDirSource
    from rau_vqa_tpu.data.loader import load_gt_annotations, load_vqa_data
    from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
    from rau_vqa_tpu.train.trainer import Trainer

    vqa_dir = os.path.join(root, "vqa_prepro")
    vit_cfg = None
    if args.backbone == "vit":
        # tiny ViT: a 16-DIM feature interface (the t7-proven scale the
        # fixed-0.08 tanh head demonstrably learns — the 512-dim conv
        # interface self-saturates, BASELINE.md) and only 2 blocks
        # between loss and pixels, so the backbone gradient has a real
        # foothold.  Patch-embed is linear: stripes are learnable by a
        # TRAINED projection while a frozen random one mostly collapses
        # them in 16 dims.
        from rau_vqa_tpu.models.backbones.vit import ViTConfig
        vit_cfg = ViTConfig(image_size=64, patch=16, dim=16, depth=2,
                            heads=4)
    cdims = (dict(cnn_dim=16, cnn_w=4, cnn_h=4) if args.backbone == "vit"
             else dict(cnn_dim=512, cnn_w=2, cnn_h=2))
    exp = get_preset("ours_ms")
    exp = exp.replace(
        model=dc.replace(
            exp.model, n_hops=2, **cdims,
            embed_dim=16, rnn_size=16, multfeat_dim=16, attfeat_dim=8,
            att_rnn_size=16, embed_dropout=0.0, rnn_dropout=0.0,
            mult_dropout=0.1,
            compute_dtype="bfloat16" if args.bf16 else "float32"),
        train=dc.replace(
            exp.train, batch_size=args.batch_size,
            # mult (the head) at lr/10 — the reference's ratio; at
            # full lr the fixed-0.08-init tanh head self-saturates
            # over a 512-dim interface (BASELINE.md zero-asset limit)
            learning_rate=args.lr, mult_learning_rate=args.lr / 10,
            lr_decay=1.0, mult_lr_decay=1.0, noisy_eta=0.0,
            grad_clip=10.0, length_buckets=(),
            train_backbone=train_backbone,
            backbone_lr_scale=args.backbone_lr_scale,
            backbone_feat_norm=args.feat_norm),
        data=dc.replace(exp.data, split="val2014"))
    data = load_vqa_data(vqa_dir, batch_size=args.batch_size,
                         split="val2014", test_batch_size=32)
    src = ImageDirSource(os.path.join(root, "images"), size=64)
    gt = load_gt_annotations(os.path.join(vqa_dir, "gt_annotations.json"))
    if args.backbone == "vit":
        from rau_vqa_tpu.models.backbones.vit import vit_init
        bb = vit_init(jax.random.PRNGKey(0), vit_cfg)
    else:
        # identical init in both arms, cli.py's measured x0.72 down-scale
        bb = vgg16_pool5_init(jax.random.PRNGKey(0))
        bb = jax.tree.map(lambda x: x * 0.72 if x.ndim == 4 else x, bb)
    return Trainer(exp, data, src, workdir, gt_anno=gt,
                   backbone=args.backbone, bb_params=bb,
                   vit_cfg=vit_cfg)


def _run_arm(name: str, root: str, workdir: str, *, train_backbone: bool,
             args, warm_start: str | None = None,
             save_final: bool = False):
    trainer = _build(root, workdir, train_backbone=train_backbone,
                     args=args)
    if warm_start:
        # the production two-phase recipe: a head-only snapshot restores
        # the three head groups; the backbone keeps its init and (in the
        # finetune arm) starts learning with a MEANINGFUL error signal
        # instead of the double-random joint start whose backbone
        # gradient collapses in ~2 epochs (first A/B, result.json)
        trainer.restore(warm_start)
    hist = []
    best = 0.0
    t0 = time.time()
    for _ in range(args.epochs):
        rec = trainer.train_epoch()
        if rec.get("aborted"):
            log(f"[{name}] epoch aborted by guard; continuing")
            continue
        ev = trainer.evaluate(write_submissions=False)
        te = max(ev["testOEacc"])
        best = max(best, te)
        hist.append({"epoch": trainer.epoch,
                     "test_acc": round(te, 4),
                     "train_acc": round(max(
                         (v for k, v in rec.items()
                          if k.startswith("trainacc_")), default=0.0), 4),
                     "loss": round(float(rec.get("loss", float("nan"))), 4),
                     "grad_norm_backbone": round(float(
                         rec.get("grad_norm_backbone", 0.0)), 6)})
        log(f"[{name}] epoch {trainer.epoch}: held-out {te:.4f} "
            f"(best {best:.4f}) loss {rec.get('loss', float('nan')):.3f}"
            + (f" gB {rec.get('grad_norm_backbone', 0):.4f}"
               if train_backbone else ""))
    out = {"name": name, "best_test_acc": round(best, 4),
           "wall_s": round(time.time() - t0, 1), "history": hist}
    if save_final:
        out["snapshot"] = trainer.save()
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default=os.path.join(_REPO, ".scratch",
                                                   "ft_ab"))
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--backbone-lr-scale", type=float, default=1.0)
    ap.add_argument("--n-classes", type=int, default=4)
    ap.add_argument("--n-train", type=int, default=320)
    ap.add_argument("--n-test", type=int, default=64)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--f32", dest="bf16", action="store_false")
    ap.add_argument("--arms", default="frozen,finetune",
                    help="comma list: frozen,finetune")
    ap.add_argument("--backbone", default="vgg16",
                    choices=("vgg16", "vit"))
    ap.add_argument("--image-mode", default="mixed",
                    choices=("texture", "mixed"),
                    help="pure texture has no pixel-gradient foothold through\na deep random conv stack (both arms sit at chance); mixed adds a\nweak overlapping gray cue that keeps the image pathway live")
    ap.add_argument("--head-warmup", type=int, default=0,
                    help="shared phase-0 head-only epochs; both arms "
                         "warm-start from its snapshot (the production "
                         "two-phase recipe — joint double-random "
                         "training collapses the backbone gradient)")
    ap.add_argument("--feat-norm", action="store_true",
                    help="RMS feature interface.  OFF by default: a\nbias-free random conv stack is positively homogeneous, so RMS\nnormalization deletes every intensity cue — with it on, the\nmixed-mode gray foothold is provably invisible (A/B v3)")
    ap.add_argument("--budget-s", type=float, default=5400.0)
    args = ap.parse_args()

    from rau_vqa_tpu.utils.rigcheck import (
        bench_preflight,
        bench_watchdog,
        enable_compile_cache_for_probe,
        matmul_canary,
    )

    watchdog = bench_watchdog("ft_ab_gap", "accuracy",
                              timeout_s=args.budget_s)
    probe = bench_preflight("ft_ab_gap", "accuracy")
    if probe.get("platform") == "cpu":
        watchdog.cancel()
    enable_compile_cache_for_probe(probe, _REPO)

    from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture

    spec = FixtureSpec(n_train=args.n_train, n_test=args.n_test,
                       n_images=40, n_answers=args.n_classes,
                       n_img_classes=args.n_classes, seed=13)
    # the fixture is a function of (spec, image_mode): an existence-only
    # check would silently reuse a stale dataset when --image-mode or
    # --n-classes changes while the result JSON records the NEW settings
    # (code-review r5 finding) — pin the generating config and rebuild
    # on any mismatch
    want = {"spec": dc.asdict(spec), "image_mode": args.image_mode}
    pin = os.path.join(args.root, "abspec.json")
    have = None
    if os.path.exists(pin):
        with open(pin) as f:
            have = json.load(f)
    if have != json.loads(json.dumps(want)):
        import shutil
        if os.path.isdir(args.root):
            shutil.rmtree(args.root)
        generate_fixture(args.root, spec, images=True, image_size=64,
                         uniform_img_assign=True,
                         image_mode=args.image_mode)
        with open(pin, "w") as f:
            json.dump(want, f)
        log(f"{args.image_mode} fixture generated under {args.root}")

    canary = matmul_canary()
    log(f"rig canary {canary['tflops']} TFLOP/s "
        f"({canary['frac_of_peak'] * 100:.1f}% of peak)")

    wd = args.workdir or os.path.join(args.root, "runs")
    arms = {}
    warm = None
    if args.head_warmup > 0:
        # shared phase 0: head-only training from scratch (frozen random
        # backbone) to a snapshot BOTH arms start from — the honest
        # baseline state for "does unfreezing the backbone help"
        wu_args = argparse.Namespace(**vars(args))
        wu_args.epochs = args.head_warmup
        arms["head_warmup"] = _run_arm(
            "head_warmup", args.root, os.path.join(wd, "head_warmup"),
            train_backbone=False, args=wu_args, save_final=True)
        warm = arms["head_warmup"]["snapshot"]
    for arm in args.arms.split(","):
        arms[arm] = _run_arm(arm, args.root,
                             os.path.join(wd, arm),
                             train_backbone=(arm == "finetune"),
                             args=args, warm_start=warm)

    frozen = arms.get("frozen", {}).get("best_test_acc")
    tuned = arms.get("finetune", {}).get("best_test_acc")
    result = {
        "metric": "ft_ab_gap",
        "value": (round(tuned - frozen, 4)
                  if frozen is not None and tuned is not None else None),
        "unit": "accuracy",
        "frozen_best_test_acc": frozen,
        "finetune_best_test_acc": tuned,
        "chance": round(1.0 / args.n_classes, 4),
        "epochs": args.epochs,
        "image_mode": args.image_mode,
        "backbone": args.backbone,
        "lr": args.lr,
        "backbone_lr_scale": args.backbone_lr_scale,
        "compute_dtype": "bfloat16" if args.bf16 else "float32",
        "arms": arms,
        "rig_canary_tflops": canary["tflops"],
        "rig_canary_frac_peak": canary["frac_of_peak"],
    }
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    watchdog.cancel()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
