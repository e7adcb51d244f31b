"""Command-line interface.

Replaces the reference's per-experiment torch.CmdLine scripts + shell
wrappers (Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:17-80,
experiments/*/run_*.sh) with one CLI over the four presets:

    rau-vqa train --preset ours_ss --vqa-dir ... --feat-dir ...
    rau-vqa train --preset ours_ms --fixture            # tiny e2e smoke
    rau-vqa eval  --checkpoint snapshot.msgpack ...     # Eval.lua equivalent
    rau-vqa pack-features --feat-dir ... --vqa-dir ... --out packed/
    rau-vqa fixture --out /tmp/fixture

Every hyper-parameter flag maps onto a config dataclass field; presets pin
the per-experiment values the reference hard-codes in its run scripts.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _pin_platform(name: str) -> None:
    """Re-pin the JAX platform via jax.config (env vars are too late here:
    this rig's sitecustomize imports jax at interpreter start and pins the
    platform through jax.config, so only another config update wins)."""
    if name not in ("cpu", "tpu", "axon"):
        raise SystemExit(
            f"rau-vqa: --platform must be cpu|tpu|axon, got {name!r}")
    import jax
    jax.config.update("jax_platforms", name)


def _add_common_data_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--vqa-dir", default=None,
                   help="directory with data_prepro.{json,h5}")
    p.add_argument("--feat-dir", default=None, action="append",
                   help="feature dir (.t7 files) or packed shard dir; "
                        "repeat for multi-datatype splits")
    p.add_argument("--split", default=None,
                   choices=["train2014", "val2014", "test2015",
                            "test-dev2015"])
    p.add_argument("--gt-anno", default=None,
                   help="comprehend GT json for fast validation")
    p.add_argument("--official-anno", default=None,
                   help="official VQA annotations JSON: eval sweeps also "
                        "report the official 10-rater consensus accuracy "
                        "(testOEaccOfficial)")
    p.add_argument("--batch-order", default=None,
                   choices=["shuffle", "inorder", "sort", "randsort",
                            "imggroup"],
                   help="training batch order; 'imggroup' keeps each "
                        "image's questions consecutive (grouped "
                        "fine-tuning: one backbone pass per unique image)")
    p.add_argument("--test-batch-size", type=int, default=None,
                   help="override the split-derived test batch size")
    p.add_argument("--ship-int8", action="store_true",
                   help="with an int8 packed shard: ship raw int8 features "
                        "to the device and dequantize there (4x less "
                        "host->device transfer than f32)")
    p.add_argument("--valid-ratio", type=float, default=None,
                   help="carve a validation split out of train "
                        "(reference valid_ratio, vqa_prepro_loader.lua:1346)")


def _add_train_flags(p: argparse.ArgumentParser) -> None:
    from rau_vqa_tpu.config import PRESETS
    p.add_argument("--preset", default="ours_ss", choices=sorted(PRESETS))
    p.add_argument("--fixture", action="store_true",
                   help="generate + train on the deterministic tiny fixture")
    p.add_argument("--save-dir", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--mult-learning-rate", type=float, default=None)
    p.add_argument("--lr-decay", type=float, default=None)
    p.add_argument("--grad-clip", type=float, default=None)
    p.add_argument("--noisy-eta", type=float, default=None)
    p.add_argument("--noisy-gamma", type=float, default=None)
    p.add_argument("--grad-accum", type=int, default=None,
                   help="microbatches per optimizer step (exact gradient "
                        "accumulation; batch-size must divide by it)")
    p.add_argument("--nhop", type=int, default=None)
    p.add_argument("--cnnout-dim", type=int, default=None)
    p.add_argument("--cnnout-w", type=int, default=None)
    p.add_argument("--cnnout-h", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--test-interval", type=int, default=None)
    p.add_argument("--init-from", default=None,
                   help="checkpoint to resume from (a real resume, unlike "
                        "the reference's vestigial -init_from)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute + MXU-default matmul precision")
    p.add_argument("--fused-eval", action="store_true",
                   help="run eval sweeps through the fused Pallas kernels")
    p.add_argument("--eval-buckets", default=None,
                   help="comma-separated question-length buckets for eval "
                        "dispatch, e.g. 8,16 (exact; smallest covering "
                        "bucket is used per batch; composes with --mesh-*)")
    p.add_argument("--train-buckets", default=None,
                   help="comma-separated question-length buckets for the "
                        "TRAIN step's token axis (exact truncation to the "
                        "batch max, as the reference's forward loop does); "
                        "default 8,16 — pass 'none' to disable")
    p.add_argument("--fused-train", action="store_true",
                   help="run the training hop loop through the fused Pallas "
                        "custom-VJP kernel pair (XLA reference path off-TPU)")
    p.add_argument("--fused-train-block", type=int, default=None,
                   help="batch tile for the fused training kernels "
                        "(batch size must divide by it)")
    p.add_argument("--visatt", action="store_true",
                   help="dump attention-map PNGs during eval sweeps")
    p.add_argument("--visatt-batches", type=int, default=None,
                   help="eval batches to dump per epoch; -1 = every test "
                        "question (reference semantics)")
    p.add_argument("--image-root", default=None,
                   help="train/eval from RAW images under this root (paths "
                        "from the json unique_img lists) through an on-TPU "
                        "backbone instead of precomputed features — the "
                        "path the reference's next_batch_image sketches")
    p.add_argument("--image-size", type=int, default=448)
    p.add_argument("--backbone", default=None,
                   choices=["vgg16", "resnet101", "vit"],
                   help="on-TPU visual backbone (with --image-root, or for "
                        "serve image_b64 requests)")
    p.add_argument("--backbone-state", default=None,
                   help="torchvision state_dict (.pth) with backbone "
                        "weights (weights ship with the user; no egress)")
    p.add_argument("--train-backbone", action="store_true",
                   help="FINE-TUNE the backbone: it joins the state as a "
                        "4th parameter group and gradients flow through "
                        "the pixels (needs --image-root; the reference "
                        "can only consume frozen precomputed features)")
    p.add_argument("--backbone-lr-scale", type=float, default=None,
                   help="backbone LR = learning-rate x this (default 0.1); "
                        "follows the same per-epoch decay")
    p.add_argument("--backbone-trust-ratio", type=float, default=None,
                   help="per-leaf backbone update cap: ||update|| <= "
                        "tau*(||w||+1e-3) per step (default 2e-4; 0 "
                        "disables) — guards against coherent-update "
                        "feature explosions when fine-tuning")
    p.add_argument("--no-backbone-remat", action="store_true",
                   help="disable blockwise activation checkpointing in the "
                        "fine-tuned backbone forward (more memory, fewer "
                        "recomputed FLOPs)")
    p.add_argument("--backbone-feat-norm", action="store_true",
                   help="RMS-normalize the backbone/head feature interface "
                        "(scale-invariant: no backbone drift can saturate "
                        "the tanh head; recorded in snapshots and honored "
                        "by eval/serve; usable with or without "
                        "--train-backbone — adopted automatically from a "
                        "fine-tuned --backbone-state sidecar)")
    p.add_argument("--mesh-data", type=int, default=None,
                   help="size of the 'data' (DP) mesh axis; -1 = all "
                        "available devices")
    p.add_argument("--mesh-model", type=int, default=None,
                   help="size of the 'model' (TP) mesh axis")
    p.add_argument("--tp", action="store_true",
                   help="shard the classifier + LSTM gate projections over "
                        "the 'model' axis (implies --mesh-model 2 unless set)")


def _parse_buckets(raw):
    """Bucket-flag grammar shared by --eval-buckets/--train-buckets and
    serve: None = not given; ''/'none'/'off' = disabled; else int list."""
    if raw is None:
        return None
    s = raw.strip().lower()
    if s in ("", "none", "off"):
        return ()
    return tuple(int(x) for x in raw.split(",") if x.strip())


def _apply_overrides(exp, args):
    m, t, d = {}, {}, {}
    if args.nhop is not None:
        m["n_hops"] = args.nhop
    if args.cnnout_dim is not None:
        m["cnn_dim"] = args.cnnout_dim
    if args.cnnout_w is not None:
        m["cnn_w"] = args.cnnout_w
    if args.cnnout_h is not None:
        m["cnn_h"] = args.cnnout_h
    if args.bf16:
        m["compute_dtype"] = "bfloat16"
        m["matmul_precision"] = "default"
    if getattr(args, "fused_train", False):
        m["fused_train"] = True
    if getattr(args, "fused_train_block", None) is not None:
        if not getattr(args, "fused_train", False):
            raise SystemExit(
                "--fused-train-block tunes the fused training path; pass "
                "--fused-train explicitly to enable it")
        m["fused_train_block"] = args.fused_train_block
    if getattr(args, "fused_eval", False):
        exp = exp.replace(fused_eval=True)
    eb = _parse_buckets(getattr(args, "eval_buckets", None))
    if eb is not None:
        exp = exp.replace(eval_buckets=eb)
    tb = _parse_buckets(getattr(args, "train_buckets", None))
    if tb is not None:
        t["length_buckets"] = tb
    # fine-tuning may come from the --train-backbone flag or a preset
    # whose TrainConfig already sets it (ours_resnet_ft)
    wants_ft = exp.train.train_backbone or getattr(args, "train_backbone",
                                                   False)
    if getattr(args, "train_backbone", False):
        if not getattr(args, "image_root", None) \
                and not getattr(args, "fixture", False):
            raise SystemExit(
                "--train-backbone fine-tunes through the pixels: it needs "
                "--image-root (+ --backbone/--backbone-state), or "
                "--fixture for a zero-asset smoke run")
        t["train_backbone"] = True
    if wants_ft:
        if getattr(args, "backbone_lr_scale", None) is not None:
            t["backbone_lr_scale"] = args.backbone_lr_scale
        if getattr(args, "no_backbone_remat", False):
            t["backbone_remat"] = False
        if getattr(args, "backbone_trust_ratio", None) is not None:
            t["backbone_trust_ratio"] = args.backbone_trust_ratio
    elif getattr(args, "backbone_lr_scale", None) is not None:
        raise SystemExit("--backbone-lr-scale needs --train-backbone")
    elif getattr(args, "no_backbone_remat", False):
        raise SystemExit("--no-backbone-remat needs --train-backbone")
    elif getattr(args, "backbone_trust_ratio", None) is not None:
        raise SystemExit("--backbone-trust-ratio needs --train-backbone")
    if getattr(args, "backbone_feat_norm", False):
        # NOT gated on --train-backbone: the RMS feature interface is
        # meaningful whenever a backbone featurizes — in particular the
        # two-phase recipe's head-only pass on a FROZEN fine-tuned RMS
        # backbone must train on the interface the backbone produced
        t["backbone_feat_norm"] = True
    if getattr(args, "visatt", False):
        exp = exp.replace(visatt=True)
    if getattr(args, "visatt_batches", None) is not None:
        exp = exp.replace(visatt=True, visatt_batches=args.visatt_batches)
    me = {}
    if getattr(args, "mesh_data", None) is not None:
        me["data_axis"] = args.mesh_data
    if getattr(args, "mesh_model", None) is not None:
        me["model_axis"] = args.mesh_model
    if getattr(args, "tp", False):
        me["shard_params_tp"] = True
        me.setdefault("model_axis", max(exp.mesh.model_axis, 2))
    if me:
        me["enabled"] = True
        exp = exp.replace(mesh=dataclasses.replace(exp.mesh, **me))
    for flag, field in [("epochs", "max_epochs"), ("batch_size", "batch_size"),
                        ("learning_rate", "learning_rate"),
                        ("mult_learning_rate", "mult_learning_rate"),
                        ("lr_decay", "lr_decay"), ("grad_clip", "grad_clip"),
                        ("noisy_eta", "noisy_eta"),
                        ("noisy_gamma", "noisy_gamma"),
                        ("grad_accum", "grad_accum"), ("seed", "seed"),
                        ("test_interval", "test_interval")]:
        v = getattr(args, flag)
        if v is not None:
            t[field] = v
    for flag, field in [("vqa_dir", "vqa_dir"), ("split", "split"),
                        ("gt_anno", "gt_anno"),
                        ("official_anno", "official_anno"),
                        ("batch_order", "batch_order"),
                        ("test_batch_size", "test_batch_size"),
                        ("valid_ratio", "valid_ratio")]:
        v = getattr(args, flag)
        if v is not None:
            d[field] = v
    if args.feat_dir:
        # multiple dirs = per-datatype sources (test2015 splits mix train2014
        # and val2014 features, vqa_prepro_loader.lua:876); stored
        # comma-separated
        d["feat_dir"] = ",".join(args.feat_dir)
    exp = exp.replace(
        model=dataclasses.replace(exp.model, **m),
        train=dataclasses.replace(exp.train, **t),
        data=dataclasses.replace(exp.data, **d))
    if args.save_dir:
        exp = exp.replace(save_dir=args.save_dir)
    return exp


def _make_feature_source(feat_dirs, mcfg, *, ship_int8: bool = False):
    from rau_vqa_tpu.data.features import PackedFeatureStore, T7DirFeatureSource
    if len(feat_dirs) == 1 and "," in feat_dirs[0]:
        feat_dirs = feat_dirs[0].split(",")
    first = feat_dirs[0]
    if os.path.exists(os.path.join(first, "index.json")):
        return PackedFeatureStore(first, raw_int8=ship_int8)
    return T7DirFeatureSource(feat_dirs, mcfg.cnn_dim, mcfg.cnn_w, mcfg.cnn_h)


def _load_backbone_state(backbone: str, state_path: str):
    """torchvision state_dict (.pth) -> serving-optimized backbone params
    (ResNet: BN folded — exact; the s2d stem rewrite measured slower and
    stays opt-in, BASELINE.md).
    A ``.msgpack`` path instead loads the FINE-TUNED backbone group from
    a --train-backbone snapshot (utils/checkpoint.load_backbone_group) —
    so serve/eval/precompute/export all consume fine-tuned backbones."""
    if not state_path:
        raise SystemExit("--backbone requires --backbone-state (a "
                         "torchvision state_dict .pth, or a fine-tuned "
                         "training snapshot .msgpack)")
    if state_path.endswith(".msgpack"):
        from rau_vqa_tpu.utils.checkpoint import load_backbone_group
        return load_backbone_group(state_path, backbone)
    import torch

    state = torch.load(state_path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    state = {k: v.numpy() if hasattr(v, "numpy") else v
             for k, v in state.items()}
    if backbone == "resnet101":
        # BN folding is a measured win; the s2d stem rewrite measured
        # SLOWER on this toolchain (BASELINE.md) so it stays opt-in
        from rau_vqa_tpu.models.backbones.resnet import (
            fold_batchnorm,
            resnet_from_torch_state,
        )
        return fold_batchnorm(resnet_from_torch_state(state))
    if backbone == "vit":
        # timm-format state dict; the default ViT-L/14 config (the
        # ours_vit stretch preset's backbone)
        from rau_vqa_tpu.models.backbones.vit import VIT_L14, vit_from_timm_state
        return vit_from_timm_state(state, VIT_L14)
    from rau_vqa_tpu.models.backbones.vgg import vgg16_from_torch_state
    return vgg16_from_torch_state(state)


def _validate_backbone_image_size(backbone, size, flag):
    """ViT's position embeddings fix the input side (cfg.image_size); the
    stride-32 conv backbones accept any multiple of 32.  Catch a mismatch
    up front instead of a broadcast error mid-sweep."""
    if backbone == "vit":
        from rau_vqa_tpu.models.backbones import vit as vit_mod
        need = vit_mod.VIT_L14.image_size
        if size != need:
            raise SystemExit(
                f"--backbone vit uses the ViT-L/14 config, whose position "
                f"embeddings fix the input at {need}px — pass {flag} {need}")


def _make_source_and_backbone(args, exp, *, adopt_feat_norm=False):
    """(source, backbone, bb_params, exp) for cmd_train/cmd_eval:
    precomputed features by default, or raw images + on-TPU backbone with
    --image-root.

    ``adopt_feat_norm``: with a fine-tuned ``--backbone-state`` snapshot
    whose sidecar records the RMS feature interface, adopt it into the
    returned exp (cmd_train passes True when the user didn't set the flag
    themselves — a fresh head must train on the interface the backbone
    produces; cmd_eval passes False because the HEAD checkpoint's meta is
    authoritative there and a mismatch is a real warning)."""
    if getattr(args, "image_root", None):
        if not args.backbone:
            raise SystemExit(
                "--image-root needs --backbone (+ --backbone-state)")
        _validate_backbone_image_size(args.backbone, args.image_size,
                                      "--image-size")
        # the backbone's output grid must match the model's attention grid
        # — catch it BEFORE the dataset load and the ~0.5 GB torch.load,
        # not as an XLA broadcast error mid-sweep (cmd_export has the same
        # check for artifacts)
        mcfg = exp.model
        if args.backbone == "vit":
            from rau_vqa_tpu.models.backbones import vit as vit_mod
            if vit_mod.VIT_L14.seq != mcfg.cnn_spat:
                raise SystemExit(
                    f"ViT-L/14 yields {vit_mod.VIT_L14.seq} tokens but the "
                    f"model config expects cnn_spat={mcfg.cnn_spat} "
                    f"({mcfg.cnn_w}x{mcfg.cnn_h})")
        else:
            # exact multiple required: the ceil-behaving strided convs
            # would produce a BIGGER grid for a non-multiple (479 -> 15x15,
            # not 14x14) and floor division would wave it through
            if args.image_size % 32:
                raise SystemExit(
                    f"--image-size {args.image_size} is not a multiple of "
                    f"32 (the conv backbones are stride-32) — use "
                    f"--image-size {mcfg.cnn_w * 32}")
            grid = args.image_size // 32   # vgg16/resnet101 are stride-32
            if grid * grid != mcfg.cnn_spat:
                raise SystemExit(
                    f"--image-size {args.image_size} gives a {grid}x{grid}"
                    f"={grid * grid} feature grid but the model config "
                    f"expects cnn_spat={mcfg.cnn_spat} "
                    f"({mcfg.cnn_w}x{mcfg.cnn_h}) — use --image-size "
                    f"{mcfg.cnn_w * 32}")
        from rau_vqa_tpu.data.images import ImageDirSource
        source = ImageDirSource(args.image_root, size=args.image_size,
                                backend="native")
        if not args.backbone_state and getattr(args, "fixture", False):
            # zero-asset fixture smoke: a randomly initialized backbone
            # (real architecture, no weights to ship)
            if args.backbone not in ("vgg16", "resnet101"):
                raise SystemExit(
                    f"--fixture random-init supports the conv backbones; "
                    f"--backbone {args.backbone} needs --backbone-state")
            import jax
            print(f"fixture: random-init {args.backbone} backbone "
                  f"(no --backbone-state)")
            if args.backbone == "resnet101":
                from rau_vqa_tpu.models.backbones.resnet import resnet101_init
                bb_params = resnet101_init(jax.random.PRNGKey(0))
            else:
                from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
                bb_params = vgg16_pool5_init(jax.random.PRNGKey(0))
                # down-scale the He init (x0.72 per conv, 13 convs: pool5
                # std 57 -> ~0.8): the reference-pinned stacked-tanh head
                # saturates to an exactly-zero f32 gradient on std>~3
                # features (it was built for trained-extractor feature
                # scales; the t7 fixture's features are likewise
                # ~unit-scale).  Measured: unscaled random init never
                # learns the image signal; scaled + the trust-ratio cap
                # trains the fixture probe to 100% (BASELINE.md).  The
                # factor is VGG-depth-specific — resnet's random fallback
                # stays raw (mechanical smoke only).
                bb_params = jax.tree.map(
                    lambda x: x * 0.72 if x.ndim == 4 else x, bb_params)
        else:
            bb_params = _load_backbone_state(args.backbone,
                                             args.backbone_state)
            if args.backbone_state.endswith(".msgpack"):
                # interface sanity: a fine-tuned snapshot records whether
                # it trained on the RMS-normalized feature interface
                sn = bool(_snapshot_meta(args.backbone_state)
                          .get("backbone_feat_norm", False))
                if sn != bool(exp.train.backbone_feat_norm):
                    if adopt_feat_norm:
                        # fresh head on a fine-tuned backbone: train on
                        # the interface the backbone produces
                        print(f"adopting backbone_feat_norm={sn} from "
                              f"{args.backbone_state} (pass "
                              f"--backbone-feat-norm to override)")
                        exp = exp.replace(train=dataclasses.replace(
                            exp.train, backbone_feat_norm=sn))
                    else:
                        # mismatch vs an explicit flag or the head
                        # checkpoint's own meta (cmd_eval) — warn: the
                        # head's interface is what the run honors
                        print(f"WARNING: {args.backbone_state} was "
                              f"fine-tuned with backbone_feat_norm={sn} "
                              f"but this run uses "
                              f"{bool(exp.train.backbone_feat_norm)} — "
                              f"the feature interface will not match the "
                              f"backbone's training")
        return source, args.backbone, bb_params, exp
    source = _make_feature_source(
        [exp.data.feat_dir], exp.model,
        ship_int8=bool(getattr(args, "ship_int8", False)))
    return source, None, None, exp


def _fixture_setup(exp, workdir, images_backbone=None):
    """Generate the tiny fixture and shrink the experiment onto it.
    ``images_backbone`` (a conv backbone name) additionally writes 64-px
    JPEGs and sizes the model for that backbone's 2x2 pool grid — the
    zero-asset `--fixture --train-backbone` smoke path."""
    from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture
    spec = FixtureSpec()
    fix_root = os.path.join(workdir, "fixture")
    vqa_dir = generate_fixture(fix_root, spec, images=bool(images_backbone),
                               image_size=64,
                               # uniform questions-per-image so the
                               # grouped fine-tune order (--batch-order
                               # imggroup) also smokes on the fixture
                               uniform_img_assign=bool(images_backbone))
    if images_backbone:
        # from-pixels fixture: tiny 64-px JPEGs through a REAL (randomly
        # initialized) stride-32 backbone -> 2x2 feature grid
        cnn = dict(cnn_dim={"vgg16": 512,
                            "resnet101": 2048}[images_backbone],
                   cnn_w=2, cnn_h=2)
    else:
        cnn = dict(cnn_dim=spec.feat_dim, cnn_w=spec.feat_w,
                   cnn_h=spec.feat_h)
    exp = exp.replace(
        model=dataclasses.replace(
            exp.model, **cnn, embed_dim=16, rnn_size=16, multfeat_dim=16,
            attfeat_dim=8, att_rnn_size=16, embed_dropout=0.0,
            rnn_dropout=0.0, mult_dropout=0.1),
        train=dataclasses.replace(
            exp.train, batch_size=16, learning_rate=1e-2,
            mult_learning_rate=1e-2, lr_decay=1.0, mult_lr_decay=1.0,
            noisy_eta=0.0, grad_clip=10.0, max_epochs=40,
            # fixture questions are <= 9 tokens: a second bucketed
            # executable only doubles CPU-test compile time
            length_buckets=()),
        data=dataclasses.replace(
            exp.data, split="val2014", vqa_dir=vqa_dir,
            feat_dir=os.path.join(fix_root, "feat"), test_batch_size=8,
            gt_anno=os.path.join(vqa_dir, "gt_annotations.json")))
    return exp


def cmd_train(args) -> int:
    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data.loader import load_gt_annotations, load_vqa_data
    from rau_vqa_tpu.train.trainer import Trainer

    exp = _apply_overrides(get_preset(args.preset), args)
    workdir = args.save_dir or f"{exp.save_dir}_{exp.data.split}"
    os.makedirs(workdir, exist_ok=True)
    # train_backbone may come from the flag OR a preset (ours_resnet_ft)
    wants_ft = exp.train.train_backbone
    if wants_ft and not args.fixture and not args.image_root:
        raise SystemExit(
            f"preset {exp.name!r} fine-tunes the backbone: pass "
            f"--image-root + --backbone resnet101 + --backbone-state "
            f"(or --fixture for the zero-asset smoke)")
    if args.fixture:
        bb_kind = None
        if wants_ft and not args.image_root:
            # zero-asset fine-tune smoke: image fixture + random-init
            # conv backbone (ViT-L/14 pins 224 px — too heavy here)
            bb_kind = args.backbone or "vgg16"
            if bb_kind == "vit":
                raise SystemExit(
                    "--fixture --train-backbone supports the conv "
                    "backbones (ViT-L/14's position embedding pins 224 px)")
            args.backbone = bb_kind
            args.image_size = 64
        exp = _fixture_setup(exp, workdir, images_backbone=bb_kind)
        if bb_kind:
            args.image_root = os.path.join(workdir, "fixture", "images")
            # random-init backbone: the raw interface saturates the tanh
            # head (config.py backbone_feat_norm) — the smoke uses the
            # scale-invariant interface so it actually LEARNS the image
            exp = exp.replace(train=dataclasses.replace(
                exp.train, backbone_feat_norm=True))

    data = load_vqa_data(
        exp.data.vqa_dir, exp.train.batch_size, split=exp.data.split,
        test_batch_size=exp.data.resolved_test_batch_size()
        if not args.fixture else 8,
        valid_ratio=exp.data.valid_ratio, seed=exp.train.seed)
    source, backbone, bb_params, exp = _make_source_and_backbone(
        args, exp,
        # a fresh/resumed head should train on the interface its frozen
        # fine-tuned backbone produces unless the user pinned it
        adopt_feat_norm=not getattr(args, "backbone_feat_norm", False))
    gt = None
    if exp.data.gt_anno and os.path.exists(exp.data.gt_anno):
        gt = load_gt_annotations(exp.data.gt_anno)

    mesh = None
    if exp.mesh.enabled:
        from rau_vqa_tpu.parallel.mesh import mesh_from_config
        mesh = mesh_from_config(exp.mesh)
        print(f"mesh: {dict(mesh.shape)}"
              + (" (TP weight sharding)" if exp.mesh.shard_params_tp else ""))
    trainer = Trainer(exp, data, source, workdir, gt_anno=gt, mesh=mesh,
                      official_anno=_checked_official_anno(exp),
                      backbone=backbone, bb_params=bb_params)
    if args.init_from:
        trainer.restore(args.init_from)
        print(f"resumed from {args.init_from} at epoch {trainer.epoch}")
    with open(os.path.join(workdir, "config.json"), "w") as f:
        # record the RESOLVED model config (vocab/answer/seq_len come from
        # the data bundle, Trainer.__init__): convert-snapshot --config-json
        # documents pointing at this file, and the preset's unresolved dims
        # would silently convert against the wrong layout
        cfg_out = dataclasses.asdict(exp)
        cfg_out["model"] = dataclasses.asdict(trainer.mcfg)
        json.dump(cfg_out, f, indent=2, default=str)

    epochs = args.epochs or exp.train.max_epochs
    print(f"training {exp.name} ({trainer.mcfg.n_hops} hops) for "
          f"{epochs} epochs, {data.train_data.iter_per_epoch} iters/epoch")
    result = trainer.fit(epochs=epochs)
    if "testOEacc" in result:
        accs = ", ".join(f"{a * 100:.2f}" for a in result["testOEacc"])
        print(f"final testOE accuracy per hop: {accs}")
    print(f"done; artifacts in {workdir}")
    return 0


def cmd_eval(args) -> int:
    """Standalone evaluation (the reference's Eval.lua:113-680): load a
    snapshot, adopt its configuration, run a test-only sweep, write result
    files."""
    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data.loader import load_gt_annotations, load_vqa_data
    from rau_vqa_tpu.train.trainer import Trainer

    from rau_vqa_tpu.config import ModelConfig

    # adopt the snapshot's self-describing config FIRST (the reference's
    # Eval.lua adopts the snapshot's opt table, Eval.lua:116-118), THEN
    # apply runtime flags — the reverse order silently discarded model
    # overrides like --bf16 under the sidecar's training-time config
    exp = get_preset(args.preset)
    meta = _snapshot_meta(args.checkpoint)
    if "model_config" in meta:
        exp = exp.replace(model=ModelConfig(**meta["model_config"]))
    elif "n_hops" in meta:
        exp = exp.replace(
            model=dataclasses.replace(exp.model, n_hops=meta["n_hops"]))
    if "alg_name" in meta:
        exp = exp.replace(alg_name=meta["alg_name"])
    if meta.get("backbone_feat_norm"):
        # the head was fine-tuned on the RMS-normalized feature interface
        # (TrainConfig.backbone_feat_norm): eval must featurize the same
        # way or the features are off-distribution (serve adopts the same
        # bit from this meta)
        exp = exp.replace(train=dataclasses.replace(
            exp.train, backbone_feat_norm=True))
    exp = _apply_overrides(exp, args)
    if exp.train.train_backbone:
        # evaluate() never trains: a fine-tuning preset (ours_resnet_ft)
        # must still evaluate from precomputed features or a frozen
        # backbone — without this, Trainer raises its training-oriented
        # "needs an image data source" error for a plain eval.  The
        # preset's 'imggroup' TRAIN batch order is likewise
        # training-only (the loader enforces uniform questions-per-image
        # at load, which a valid_ratio re-split breaks): eval only
        # consumes the test split, so drop it too.
        exp = exp.replace(
            train=dataclasses.replace(exp.train, train_backbone=False),
            data=dataclasses.replace(
                exp.data,
                batch_order="shuffle" if exp.data.batch_order == "imggroup"
                else exp.data.batch_order))
    if getattr(args, "image_root", None) and not args.backbone_state \
            and meta.get("train_backbone") and meta.get("backbone"):
        # from-pixels eval of a fine-tuned snapshot: the snapshot itself
        # carries the trained backbone group — use it (serve adopts the
        # same way) instead of demanding a separate --backbone-state
        args.backbone = args.backbone or meta["backbone"]
        args.backbone_state = args.checkpoint
        print(f"adopting the fine-tuned {args.backbone} backbone from "
              f"{args.checkpoint}")

    workdir = args.save_dir or f"save_result_eval_{exp.data.split}"
    os.makedirs(workdir, exist_ok=True)
    if args.fixture:
        # route to the deterministic tiny fixture (regenerated in this
        # workdir — generate_fixture is seed-stable, so it matches the
        # bundle a `train --fixture` snapshot was trained on).  Only the
        # DATA config is adopted: the model config must stay whatever the
        # snapshot self-describes (the flag was previously accepted by
        # the parser and silently ignored — eval then crashed looking
        # for the real VQA bundle).
        exp = exp.replace(data=_fixture_setup(exp, workdir).data)
    data = load_vqa_data(
        exp.data.vqa_dir, exp.train.batch_size, split=exp.data.split,
        test_batch_size=exp.data.resolved_test_batch_size(),
        valid_ratio=exp.data.valid_ratio, seed=exp.train.seed)
    source, backbone, bb_params, exp = _make_source_and_backbone(args, exp)
    gt = None
    if exp.data.gt_anno and os.path.exists(exp.data.gt_anno):
        gt = load_gt_annotations(exp.data.gt_anno)

    trainer = Trainer(exp, data, source, workdir, gt_anno=gt,
                      official_anno=_checked_official_anno(exp),
                      backbone=backbone, bb_params=bb_params)
    trainer.restore(args.checkpoint)
    print(f"evaluating snapshot at epoch {trainer.epoch} "
          f"({trainer.mcfg.n_hops} hops) on {exp.data.split}")
    result = trainer.evaluate()
    if "testOEacc" in result:
        for h, a in enumerate(result["testOEacc"]):
            print(f"hop {h + 1:02d}: OE {a * 100:.2f}"
                  + (f", MC {result['testMCacc'][h] * 100:.2f}"
                     if "testMCacc" in result else ""))
    print(f"result files in {workdir}/results/")
    return 0


def cmd_pack_features(args) -> int:
    """Pack per-image .t7 features into one mmap shard.

    Per-image source dirs follow the h5 ``datatype_train`` contract: the
    reference indexes tab_featpaths by each question's datatype
    (vqa_prepro_loader.lua:876), so a mixed train2014+val2014 split reads
    images from different dirs.  Test images always use datatype 1 (the
    reference fills test datatypes with 1, vqa_prepro_loader.lua:1378)."""
    import numpy as np

    from rau_vqa_tpu.data.features import pack_feature_dir

    with open(os.path.join(args.vqa_dir, "data_prepro.json")) as f:
        info = json.load(f)
    imgs = list(info.get("unique_img_train", []))
    dts = np.ones(len(imgs), np.int32)
    h5_path = os.path.join(args.vqa_dir, "data_prepro.h5")
    if imgs and os.path.exists(h5_path):
        import h5py
        with h5py.File(h5_path, "r") as h5:
            if "datatype_train" in h5:
                # per-question datatype -> per-image via img_pos (1-based)
                pos = np.asarray(h5["img_pos_train"], np.int64)
                dt = np.asarray(h5["datatype_train"], np.int32)
                dts[pos - 1] = dt
    dts = dts.tolist()
    for p in info.get("unique_img_test", []):
        imgs.append(p)
        dts.append(1)
    store = pack_feature_dir(args.feat_dir, imgs, dts, args.out,
                             args.cnnout_dim, args.cnnout_w, args.cnnout_h,
                             dtype=args.dtype)
    print(f"packed {len(store.index)} images -> {args.out}")
    return 0


def _snapshot_meta(checkpoint: str) -> dict:
    """Sidecar metadata of a native snapshot ({} when absent).  splitext,
    not str.replace: a checkpoint path not ending in .msgpack must never
    resolve to ITSELF and json.load the msgpack binary."""
    meta_path = os.path.splitext(checkpoint)[0] + ".json"
    if meta_path != checkpoint and os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def _checked_official_anno(exp) -> "str | None":
    """Fail FAST on a bad --official-anno path: the trainer digests the
    file lazily at the first eval sweep, which would otherwise cost a full
    epoch of training before the typo surfaces."""
    p = exp.data.official_anno
    if p and not os.path.exists(p):
        raise SystemExit(f"--official-anno: {p} does not exist")
    return p or None


def cmd_vqa_accuracy(args) -> int:
    """Score an OE submission with the official VQA metric locally — the
    evaluation the reference outsources to the VQA server (it only writes
    the result JSONs, Ours_SS/...lua:1171-1186)."""
    from rau_vqa_tpu.eval.vqa_accuracy import evaluate_files

    rep = evaluate_files(args.results, args.annotations,
                         precision=args.precision)
    print(f"overall: {rep['overall']:.{args.precision}f}  "
          f"(n={rep['n']}, unannotated result rows: {rep['missing']})")
    for section in ("per_answer_type", "per_question_type"):
        rows = rep[section]
        if section == "per_question_type" and not args.question_types:
            continue
        print(section + ":")
        for k, v in rows.items():
            print(f"  {k}: {v:.{args.precision}f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=1)
        print(f"report -> {args.out}")
    return 0


def cmd_prepro(args) -> int:
    """Build data_prepro.{json,h5} from the official VQA v1 release JSONs —
    the preprocessing the reference outsources to downloads
    (data/get_vqa_prepro.sh; data/VQA_prepro/README.md credits
    VT-vision-lab/VQA_LSTM_CNN).  With `precompute-features` this makes the
    framework self-sufficient from raw VQA + COCO data."""
    from rau_vqa_tpu.data.prepro import PreproConfig, build_prepro, join_split

    train_sources = []
    for split, qjson, ajson in args.train:
        train_sources.append((split, join_split(qjson, ajson, split)))
    test_split, test_q = args.test
    test_entries = join_split(test_q, args.test_annotations, test_split)
    if args.test_mc:
        # overlay multiple_choices from the MC-task questions file
        mc_entries = {e.question_id: e.multiple_choices
                      for e in join_split(args.test_mc, None, test_split)}
        for e in test_entries:
            e.multiple_choices = mc_entries.get(e.question_id,
                                                e.multiple_choices)
    cfg = PreproConfig(num_answers=args.num_answers,
                       max_length=args.max_length,
                       word_threshold=args.word_threshold)
    summary = build_prepro(train_sources, test_entries, args.out, cfg)
    print(f"prepro -> {args.out}: {summary['n_train']} train questions "
          f"({summary['n_dropped']} dropped outside the top-"
          f"{summary['n_answers']} answers), {summary['n_test']} test, "
          f"vocab {summary['vocab_size']}"
          + (f", gt map {summary['gt_annotations']}"
             if summary["gt_annotations"] else ""))
    return 0


def cmd_precompute_features(args) -> int:
    """Run a backbone over raw images on the device and write a packed
    feature shard — the reference's offline feature-extraction protocol
    (data/get_vgg16_pool5_448.sh downloads these; the extractor itself is
    not in the reference repo), produced natively.  The output dir is
    directly consumable as ``--feat-dir``."""
    import time

    from rau_vqa_tpu.precompute import precompute_features, scan_image_dir

    if args.vqa_dir:
        with open(os.path.join(args.vqa_dir, "data_prepro.json")) as f:
            info = json.load(f)
        rel = (list(info.get("unique_img_train", []))
               + list(info.get("unique_img_test", [])))
    else:
        rel = scan_image_dir(args.image_root)
    if not rel:
        raise SystemExit("no images found (empty --image-root scan or "
                         "empty unique_img lists)")
    _validate_backbone_image_size(args.backbone, args.size, "--size")
    bb_params = _load_backbone_state(args.backbone, args.backbone_state)
    mesh = None
    if args.mesh_data:
        from rau_vqa_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_data=args.mesh_data, n_model=1)
        print(f"mesh: {dict(mesh.shape)}")

    # a hung tunnel blocks inside the first dispatch with no error
    # (BASELINE.md hard-hang mode); abort loudly if no batch lands
    from rau_vqa_tpu.utils.rigcheck import StallWatchdog
    watchdog = StallWatchdog("precompute-features", args.stall_timeout)

    t0 = time.time()
    last = [0.0]

    def progress(done, total):
        watchdog.poke()
        now = time.time()
        if now - last[0] >= 10 or done == total:
            last[0] = now
            rate = done / max(now - t0, 1e-9)
            print(f"  {done}/{total} images ({rate:.1f} img/s)", flush=True)

    # a fine-tuned snapshot records its feature interface in the sidecar:
    # shards fed to an RMS-interface head must be RMS-normalized too
    feat_norm = bool(args.backbone_state
                     and args.backbone_state.endswith(".msgpack")
                     and _snapshot_meta(args.backbone_state)
                     .get("backbone_feat_norm", False))
    if feat_norm:
        print("fine-tuned snapshot uses the RMS-normalized feature "
              "interface (backbone_feat_norm) — applying it to the shard")
    store = precompute_features(
        args.image_root, rel, args.out, args.backbone, bb_params,
        size=args.size, batch_size=args.batch, dtype=args.dtype,
        backend=args.backend, mesh=mesh,
        compute_dtype="bfloat16" if args.bf16 else None,
        feat_norm=feat_norm, progress=progress)
    watchdog.cancel()
    print(f"precomputed {len(store.index)} images -> {args.out} "
          f"[S={store.spat}, D={store.dim}] dtype={args.dtype}")
    return 0


def cmd_convert_snapshot(args) -> int:
    """Convert a reference Torch7 snapshot into a native checkpoint (or the
    reverse with --to-torch)."""
    import jax
    import numpy as np

    from rau_vqa_tpu.config import get_preset, ModelConfig
    from rau_vqa_tpu.train.trainer import init_train_state
    from rau_vqa_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from rau_vqa_tpu.utils import torch_convert as tc

    exp = _apply_overrides(get_preset(args.preset), args)
    mcfg = dataclasses.replace(exp.model, vocab_size=args.vocab_size,
                               answer_size=args.answer_size,
                               seq_len=args.seq_len)
    if args.config_json:
        with open(args.config_json) as f:
            cfg_dict = json.load(f)
        mcfg = ModelConfig(**cfg_dict.get("model", cfg_dict))
    if args.to_torch:
        # adopt the native checkpoint's own (self-describing) model config
        saved = _snapshot_meta(args.input)
        if "model_config" in saved:
            mcfg = ModelConfig(**saved["model_config"])
        state = init_train_state(jax.random.PRNGKey(0), mcfg)
        tree, meta = load_checkpoint(args.input, state._asdict())
        params = jax.tree.map(np.asarray, tree["params"])
        tc.export_snapshot(args.output, params, mcfg,
                           it=meta.get("step", 0),
                           epoch=meta.get("epoch", 0.0))
        print(f"wrote Torch snapshot {args.output}")
        return 0
    params = tc.convert_snapshot(args.input, mcfg)
    state = init_train_state(jax.random.PRNGKey(0), mcfg)
    state = state._replace(params=jax.tree.map(
        lambda t, s: s.astype(t.dtype), state.params, params))
    # honor --output LITERALLY: save_checkpoint names files by step/epoch
    # (snapshot_iter..._epoch...), so write into a temp dir and move the
    # .msgpack/.json pair to the requested path
    import shutil
    import tempfile

    out_dir = os.path.dirname(os.path.abspath(args.output)) or "."
    os.makedirs(out_dir, exist_ok=True)
    base = (args.output[:-len(".msgpack")]
            if args.output.endswith(".msgpack") else args.output)
    with tempfile.TemporaryDirectory(dir=out_dir) as td:
        path = save_checkpoint(td, 0, 0.0, state._asdict(),
                               extra={"model_config":
                                      dataclasses.asdict(mcfg),
                                      "converted_from": args.input})
        shutil.move(path, base + ".msgpack")
        shutil.move(path[:-len(".msgpack")] + ".json", base + ".json")
    print(f"converted {args.input} -> {base}.msgpack")
    return 0


def cmd_export(args) -> int:
    """AOT-export a snapshot's predict program to a StableHLO artifact
    directory (eval/export.py): params baked in as constants, symbolic
    batch, one program per token-length bucket.  The artifact needs only
    a JAX runtime to serve — no model code, no config system."""
    from flax import serialization

    from rau_vqa_tpu.config import ModelConfig, get_preset
    from rau_vqa_tpu.eval.export import export_predict

    exp = get_preset(args.preset)
    mcfg = exp.model
    meta = _snapshot_meta(args.checkpoint)
    if "model_config" in meta:
        # self-describing snapshot (the reference's Eval.lua adopts the
        # snapshot's opt table, Eval.lua:116-118)
        mcfg = ModelConfig(**meta["model_config"])
    if args.bf16:
        # fast serving artifact: bf16 MXU passes, like bench.py
        mcfg = dataclasses.replace(mcfg, compute_dtype="bfloat16",
                                   matmul_precision="default")
    import jax

    from rau_vqa_tpu.models.rau import init_params

    with open(args.checkpoint, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    raw = tree["params"] if "params" in tree else tree
    # msgpack stores lists as {"0": ...} dicts; re-impose the real
    # structure (e.g. rnn["layers"] list) from a freshly-initialized
    # template of the snapshot's own config
    template = init_params(jax.random.PRNGKey(0), mcfg)
    params = serialization.from_state_dict(template, raw)
    # a metadata-less snapshot under a mismatched --preset must fail
    # loudly, not bake mismatched params into the artifact
    from rau_vqa_tpu.utils.checkpoint import validate_tree_shapes
    validate_tree_shapes(template, params)
    if args.eval_buckets is None:
        # kind-aware default: bucket programs are cheap for the
        # questions path but each pixels bucket file bakes the FULL
        # backbone weights (~170 MB f32 for ResNet-101)
        args.eval_buckets = "none" if args.backbone else "8,16"
    buckets = _parse_buckets(args.eval_buckets) or ()
    extra = {"source_checkpoint": os.path.abspath(args.checkpoint),
             "preset": args.preset, "step": meta.get("step"),
             "epoch": meta.get("epoch"),
             # the head's feature interface rides in BOTH artifact kinds:
             # pixels artifacts bake the RMS op into the program, but a
             # features-only artifact served next to a separate backbone
             # (--backbone at serve time) needs the bit so serve
             # featurizes the way the head was trained
             "backbone_feat_norm": bool(meta.get("backbone_feat_norm",
                                                 False))}
    if args.backbone:
        # from-pixels artifact: preprocess + backbone + RAU in ONE program
        import numpy as np

        from rau_vqa_tpu.eval.export import export_pixels_predict
        if args.backbone == "vit":
            # ViT's pos embeddings fix the input side AND the grid
            from rau_vqa_tpu.models.backbones import vit as vit_mod
            vcfg = vit_mod.VIT_L14
            if args.image_size is None:
                args.image_size = vcfg.image_size
            _validate_backbone_image_size("vit", args.image_size,
                                          "--image-size")
            if vcfg.seq != mcfg.cnn_spat:
                raise SystemExit(
                    f"ViT-L/14 yields {vcfg.grid}x{vcfg.grid}="
                    f"{vcfg.seq} tokens but the snapshot was trained "
                    f"on cnn_spat={mcfg.cnn_spat} "
                    f"({mcfg.cnn_w}x{mcfg.cnn_h})")
        else:
            if args.image_size is None:
                # the conv backbones are stride-32: the snapshot's
                # feature grid dictates the input side
                args.image_size = mcfg.cnn_w * 32
            if args.image_size % 32:
                raise SystemExit(
                    f"--image-size {args.image_size} is not a multiple "
                    f"of 32 (the conv backbones are stride-32) — use "
                    f"--image-size {mcfg.cnn_w * 32}")
            grid = args.image_size // 32
            if grid * grid != mcfg.cnn_spat:
                raise SystemExit(
                    f"--image-size {args.image_size} gives a "
                    f"{grid}x{grid}={grid * grid} feature grid but the "
                    f"snapshot was trained on cnn_spat={mcfg.cnn_spat} "
                    f"({mcfg.cnn_w}x{mcfg.cnn_h}) — use "
                    f"--image-size {mcfg.cnn_w * 32}")
        bb_params = _load_backbone_state(args.backbone, args.backbone_state)
        if args.bf16:
            import jax.numpy as jnp
            bb_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if getattr(x, "dtype", None) == np.float32 else x, bb_params)
        # the head's training interface is authoritative: a snapshot
        # fine-tuned with the RMS-normalized interface must export a
        # program that featurizes the same way
        feat_norm = bool(meta.get("backbone_feat_norm", False))
        if feat_norm:
            print("snapshot uses the RMS-normalized feature interface "
                  "(backbone_feat_norm) — baked into the artifact")
        paths = export_pixels_predict(
            params, mcfg, args.backbone, bb_params, args.out,
            image_size=args.image_size, buckets=buckets,
            feat_norm=feat_norm, extra_meta=extra)
    else:
        paths = export_predict(params, mcfg, args.out, buckets=buckets,
                               extra_meta=extra)
    for T, p in sorted(paths.items()):
        print(f"T={T:02d}: {p} ({os.path.getsize(p) / 1e6:.1f} MB)")
    print(f"exported {len(paths)} program(s) to {args.out}")
    return 0


def cmd_diagnose_snapshot(args) -> int:
    """Diagnose a reference Torch snapshot's flat-vector layout against our
    reconstructed ordering (utils.layout_diag): size segmentation, ambiguity
    classes, and — given a trusted native checkpoint via --ref-checkpoint —
    content-based order recovery with a repair diff."""
    import dataclasses as dc

    import numpy as np

    from rau_vqa_tpu.config import get_preset, ModelConfig
    from rau_vqa_tpu.utils import layout_diag as ld
    from rau_vqa_tpu.utils import torch_convert as tc

    exp = _apply_overrides(get_preset(args.preset), args)
    mcfg = dc.replace(exp.model, vocab_size=args.vocab_size,
                      answer_size=args.answer_size, seq_len=args.seq_len)
    flats = tc.snapshot_flats(args.input)
    print(ld.layout_report(mcfg))
    ok = True
    for group, flat in zip(("embed", "rnn", "mult"), flats):
        want = tc.group_size(mcfg, group)
        status = "OK" if flat.size == want else "MISMATCH"
        ok = ok and flat.size == want
        print(f"{group}: snapshot {flat.size} vs config {want} elements "
              f"[{status}]")
    if not ok:
        print("size mismatch: fix model dims before diagnosing order")
        return 1
    if args.ref_checkpoint:
        import jax
        from rau_vqa_tpu.train.trainer import init_train_state
        from rau_vqa_tpu.utils.checkpoint import load_checkpoint

        state = init_train_state(jax.random.PRNGKey(0), mcfg)
        tree, _ = load_checkpoint(args.ref_checkpoint, state._asdict())
        params = jax.tree.map(np.asarray, tree["params"])
        for group, flat in zip(("embed", "rnn", "mult"), flats):
            rec = ld.align_flat_by_content(flat, mcfg, group, params[group])
            diff = ld.layout_diff(mcfg, group, rec)
            if diff:
                print(f"{group}: ORDER MISMATCH —")
                for d in diff:
                    print(f"  {d}")
            else:
                print(f"{group}: order matches GROUP_LAYOUTS")
    return 0


def cmd_verify_released(args) -> int:
    """Released-checkpoint parity, one command (the golden-output pipeline
    of SURVEY.md §4): extract the reference tarball, convert the snapshot,
    run the eval sweep, diff against the result JSONs the tarball itself
    ships.  See eval/released.py for the pipeline; exits non-zero when any
    compared hop agrees below --min-agree."""
    import tempfile

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data.loader import load_gt_annotations, load_vqa_data
    from rau_vqa_tpu.eval.released import extract_tarball, verify_released

    exp = _apply_overrides(get_preset(args.preset), args)
    if args.model_json:
        from rau_vqa_tpu.config import ModelConfig
        with open(args.model_json) as f:
            cfg_dict = json.load(f)
        exp = exp.replace(
            model=ModelConfig(**cfg_dict.get("model", cfg_dict)))
    workdir = args.save_dir or f"save_result_verify_{exp.data.split}"
    os.makedirs(workdir, exist_ok=True)

    if args.tarball:
        root = extract_tarball(args.tarball,
                               os.path.join(workdir, "released"))
    else:
        root = args.extracted
    # adopt the snapshot's self-describing dims BEFORE building the feature
    # source — an Ours_ResNet tarball must flip cnn_dim to 2048 here, not
    # only inside verify_released (whose re-adoption is then a no-op)
    from rau_vqa_tpu.data import t7
    from rau_vqa_tpu.eval.released import adopt_snapshot_opt, pick_snapshot
    snap_epoch, snap_path = pick_snapshot(root, args.epoch)
    snap = t7.load_t7(snap_path)     # parsed ONCE; handed to the harness
    if isinstance(snap, dict) and "opt" in snap:
        exp = adopt_snapshot_opt(exp, snap["opt"])
    data = load_vqa_data(
        exp.data.vqa_dir, exp.train.batch_size, split=exp.data.split,
        test_batch_size=exp.data.resolved_test_batch_size(),
        valid_ratio=exp.data.valid_ratio, seed=exp.train.seed)
    source = _make_feature_source([exp.data.feat_dir], exp.model)
    gt = None
    if exp.data.gt_anno and os.path.exists(exp.data.gt_anno):
        gt = load_gt_annotations(exp.data.gt_anno)

    report = verify_released(root, exp, data, source, workdir,
                             epoch=args.epoch, gt_anno=gt,
                             official_anno=_checked_official_anno(exp),
                             snapshot=(snap_epoch, snap_path, snap))
    out_path = os.path.join(workdir, "verify_released_report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    if report.get("error") == "layout":
        print("LAYOUT MISMATCH — flat-vector sizes disagree with the "
              "config:")
        for g, s in report["sizes"].items():
            print(f"  {g}: snapshot {s['snapshot']} vs config {s['config']}")
        print(f"full segmentation report in {out_path}; run "
              f"`rau-vqa diagnose-snapshot` for order recovery")
        return 1
    if report.get("error") == "no_result_jsons":
        print(f"snapshot evaluated (epoch {report['epoch']}) but the "
              f"tarball ships no result JSONs to diff against")
        return 1
    for h, hr in sorted(report["hops"].items(), key=lambda kv: int(kv[0])):
        line = f"hop {int(h):02d}:"
        for task in ("oe", "mc"):
            if task in hr:
                d = hr[task]
                line += (f"  {task.upper()} agree "
                         f"{d['agree'] * 100:.3f}% ({d['n_common']} qs"
                         + (", QID SET MISMATCH" if d["qid_mismatch"]
                            else "") + ")")
                if "official_ours" in d:
                    line += (f" official {d['official_ours'] * 100:.2f}"
                             f" vs released "
                             f"{d['official_released'] * 100:.2f}")
        print(line)
    print(f"min agreement {report['min_agree'] * 100:.3f}% "
          f"(threshold {args.min_agree * 100:.1f}%); report: {out_path}")
    return 0 if report["min_agree"] >= args.min_agree else 1


def cmd_ask(args) -> int:
    """Answer one question about one image's features from a checkpoint —
    the smallest serving path (question string -> tokens via the dataset
    vocab, features via .t7/packed store, top-k answers)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rau_vqa_tpu.config import get_preset, ModelConfig
    from rau_vqa_tpu.data.loader import load_vqa_data
    from rau_vqa_tpu.eval.predict import make_predict_step
    from rau_vqa_tpu.train.trainer import Trainer, init_train_state
    from rau_vqa_tpu.utils.checkpoint import load_checkpoint

    # snapshot config first, runtime flags second (see cmd_eval)
    exp = get_preset(args.preset)
    meta = _snapshot_meta(args.checkpoint)
    if "model_config" in meta:
        exp = exp.replace(model=ModelConfig(**meta["model_config"]))
    exp = _apply_overrides(exp, args)
    data = load_vqa_data(exp.data.vqa_dir, 1, split=exp.data.split,
                         test_batch_size=1)
    mcfg = dataclasses.replace(exp.model, vocab_size=data.vocab_size,
                               answer_size=data.answer_size,
                               seq_len=data.seq_len)
    state = init_train_state(jax.random.PRNGKey(0), mcfg)
    tree, _ = load_checkpoint(args.checkpoint, state._asdict())
    params = tree["params"]

    tokens, length = data.question_to_tokens(args.question, normalize=True)
    source = _make_feature_source([exp.data.feat_dir], mcfg)
    feats = source.get_batch([args.feat_name], [1])

    predict = make_predict_step(mcfg)
    tab_pred, tab_att = predict(params, jnp.asarray(tokens[None]),
                                jnp.asarray([length], jnp.int32),
                                jnp.asarray(feats))
    final = np.asarray(tab_pred[-1, 0])      # "select" aggregate
    top = np.argsort(final)[::-1][:args.topk]
    print(f"Q: {args.question}")
    for rank, idx in enumerate(top):
        print(f"  {rank + 1}. {data.answers[int(idx)]}  "
              f"(score {final[idx]:.3f})")
    return 0


def cmd_profile(args) -> int:
    """jax.profiler trace of N synthetic train steps (the reference's only
    tracing was a per-iteration wall clock, Ours_SS/...lua:767,776)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.train.trainer import init_train_state, make_train_step

    exp = _apply_overrides(get_preset(args.preset), args)
    mcfg, tcfg = exp.model, exp.train
    state = init_train_state(jax.random.PRNGKey(tcfg.seed), mcfg)
    step = jax.jit(make_train_step(mcfg, tcfg), donate_argnums=(0,))
    rs = np.random.RandomState(0)
    B = tcfg.batch_size
    batch = (
        jnp.asarray(rs.randint(1, mcfg.vocab_size,
                               (B, mcfg.seq_len)).astype(np.int32)),
        jnp.asarray(rs.randint(1, mcfg.seq_len + 1, B).astype(np.int32)),
        jnp.asarray(rs.randn(B, mcfg.cnn_spat,
                             mcfg.cnn_dim).astype(np.float32)),
        jnp.asarray(rs.randint(0, mcfg.answer_size, B).astype(np.int32)),
    )
    hop_scale = jnp.ones((mcfg.n_hops,))
    lr, mlr = jnp.float32(tcfg.learning_rate), jnp.float32(tcfg.mult_learning_rate)
    state, m = step(state, *batch, hop_scale, lr, mlr)  # compile outside trace
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, m = step(state, *batch, hop_scale, lr, mlr)
        jax.block_until_ready(m["loss"])
    print(f"traced {args.steps} steps (loss {float(m['loss']):.4f}) -> {args.out}")
    return 0


def cmd_doctor(args) -> int:
    """Rig health: tunnel/backend probes (with timeouts — a hung tunnel
    never raises), CPU fallback, native libs, optional capability canary,
    optional data-dir layout."""
    import json as _json

    from rau_vqa_tpu.utils.doctor import format_report, run_doctor

    import time as _time

    deadline = (_time.monotonic() + args.watch_timeout
                if getattr(args, "watch", False) and args.watch_timeout > 0
                else None)
    while True:
        report = run_doctor(vqa_dir=args.vqa_dir, canary=args.canary,
                            device_timeout_s=args.device_timeout)
        if not getattr(args, "watch", False) or report["healthy"]:
            print(format_report(report), file=sys.stderr)
            print(_json.dumps(report))
            return 0 if report["healthy"] else 1
        failing = ", ".join(
            f"{k}={c.get('status')}" for k, c in report.items()
            if isinstance(c, dict) and c.get("status") not in (None, "ok"))
        print(f"doctor --watch: unhealthy ({failing or 'see report'}); "
              f"next poll in {args.watch_interval:.0f}s", file=sys.stderr)
        if deadline is not None and _time.monotonic() >= deadline:
            print("doctor --watch: timeout, giving up", file=sys.stderr)
            print(_json.dumps(report))
            return 1
        _time.sleep(args.watch_interval)


def cmd_fixture(args) -> int:
    from rau_vqa_tpu.data.fixtures import generate_fixture

    vqa_dir = generate_fixture(args.out)
    print(f"fixture written under {args.out} (vqa_dir: {vqa_dir})")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="rau-vqa",
        description="TPU-native Recurrent Answering Units VQA framework")
    parser.add_argument(
        "--platform", default=None, choices=["cpu", "tpu", "axon"],
        help="pin the JAX platform before any device use (goes BEFORE the "
             "subcommand).  '--platform cpu' keeps every subcommand usable "
             "during a TPU-tunnel outage: the env var JAX_PLATFORMS is too "
             "late on this rig because a sitecustomize re-pins the platform "
             "via jax.config at interpreter start — this flag re-pins it "
             "back (see 'rau-vqa doctor')")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train a preset experiment")
    _add_train_flags(p_train)
    _add_common_data_flags(p_train)

    p_eval = sub.add_parser("eval", help="standalone snapshot evaluation")
    p_eval.add_argument("--checkpoint", required=True)
    _add_train_flags(p_eval)
    _add_common_data_flags(p_eval)

    p_pack = sub.add_parser("pack-features",
                            help="pack per-image .t7 features into an "
                                 "mmap shard")
    p_pack.add_argument("--feat-dir", action="append", required=True)
    p_pack.add_argument("--vqa-dir", required=True)
    p_pack.add_argument("--out", required=True)
    p_pack.add_argument("--cnnout-dim", type=int, default=512)
    p_pack.add_argument("--cnnout-w", type=int, default=14)
    p_pack.add_argument("--cnnout-h", type=int, default=14)
    p_pack.add_argument("--dtype", default="float32",
                        choices=["float32", "float16", "int8"])

    p_pp = sub.add_parser(
        "prepro",
        help="build data_prepro.{json,h5} from the official VQA v1 "
             "release JSONs (the preprocessing the reference only "
             "downloads)")
    p_pp.add_argument("--train", nargs=3, action="append", required=True,
                      metavar=("SPLIT", "QUESTIONS", "ANNOTATIONS"),
                      help="a train source; repeat for mixed layouts "
                           "(order defines the 1-based datatype index), "
                           "e.g. --train train2014 q.json a.json "
                           "--train val2014 q2.json a2.json")
    p_pp.add_argument("--test", nargs=2, required=True,
                      metavar=("SPLIT", "QUESTIONS"),
                      help="the eval split, e.g. --test val2014 q.json")
    p_pp.add_argument("--test-annotations", default=None,
                      help="annotations for an annotated eval split; also "
                           "emits the comprehend-format gt_annotations.json")
    p_pp.add_argument("--test-mc", default=None,
                      help="MultipleChoice questions json for the eval "
                           "split (fills MC_ans_test)")
    p_pp.add_argument("--out", required=True)
    p_pp.add_argument("--num-answers", type=int, default=1000,
                      help="top-N answer vocabulary (train rows outside it "
                           "are dropped, like the published prepro)")
    p_pp.add_argument("--max-length", type=int, default=26)
    p_pp.add_argument("--word-threshold", type=int, default=0,
                      help="words with count <= threshold become UNK")

    p_acc = sub.add_parser(
        "vqa-accuracy",
        help="score an OE submission with the official VQA metric "
             "(10-rater consensus + official normalization) locally")
    p_acc.add_argument("--results", required=True,
                       help="OE result JSON (what train/eval write: "
                            "[{question_id, answer}, ...])")
    p_acc.add_argument("--annotations", required=True,
                       help="official VQA v1 annotations JSON for the "
                            "evaluated split")
    p_acc.add_argument("--out", default=None,
                       help="also write the full report JSON here")
    p_acc.add_argument("--precision", type=int, default=2)
    p_acc.add_argument("--question-types", action="store_true",
                       help="print the (long) per-question-type table")

    p_pre = sub.add_parser(
        "precompute-features",
        help="run a backbone over raw images on-device and write a packed "
             "feature shard (the reference's offline feature-extraction "
             "protocol, natively)")
    p_pre.add_argument("--image-root", required=True,
                       help="COCO-style image directory")
    p_pre.add_argument("--out", required=True,
                       help="output shard dir (usable as --feat-dir)")
    p_pre.add_argument("--backbone", required=True,
                       choices=["vgg16", "resnet101", "vit"])
    p_pre.add_argument("--backbone-state",
                       help="torchvision state_dict .pth for the backbone")
    p_pre.add_argument("--vqa-dir",
                       help="enumerate images from the prepro json's "
                            "unique_img lists; default: scan --image-root")
    p_pre.add_argument("--size", type=int, default=448,
                       help="input resolution (conv backbones: 448 -> "
                            "14x14 grid, 224 -> 7x7; vit requires its "
                            "config's fixed size, 224 for ViT-L/14)")
    p_pre.add_argument("--stall-timeout", type=float, default=900,
                       help="abort if no batch completes within this many "
                            "seconds (a hung TPU tunnel blocks without an "
                            "error); 0 disables")
    p_pre.add_argument("--batch", type=int, default=64,
                       help="device batch (64 is the measured sweet spot)")
    p_pre.add_argument("--dtype", default="float32",
                       choices=["float32", "float16", "int8"],
                       help="STORAGE dtype of the shard")
    p_pre.add_argument("--bf16", action="store_true",
                       help="bfloat16 backbone compute (measured serving "
                            "config); storage stays --dtype")
    p_pre.add_argument("--backend", default="native",
                       choices=["native", "pil"])
    p_pre.add_argument("--mesh-data", type=int, default=0,
                       help="shard the extraction batch over a 'data' mesh "
                            "of this many devices (-1 = all); backbone "
                            "replicated")

    sub.add_parser("bench", help="serving throughput benchmark (one JSON line)")
    sub.add_parser("bench-pixels",
                   help="from-pixels (images+questions->answers) benchmark; "
                        "flags pass through to bench_pixels.py",
                   add_help=False)

    p_prof = sub.add_parser("profile",
                            help="trace N train steps with jax.profiler")
    p_prof.add_argument("--out", required=True, help="trace output directory")
    p_prof.add_argument("--steps", type=int, default=10)
    _add_train_flags(p_prof)
    _add_common_data_flags(p_prof)

    p_doc = sub.add_parser("doctor",
                           help="rig health: backend/tunnel probes with "
                                "timeouts, CPU fallback, native libs, "
                                "optional capability canary")
    p_doc.add_argument("--vqa-dir", default=None,
                       help="also check the data bundle layout")
    p_doc.add_argument("--canary", action="store_true",
                       help="run the chained-matmul capability canary "
                            "(device must be reachable)")
    p_doc.add_argument("--device-timeout", type=float, default=180.0,
                       help="seconds before a backend probe is declared "
                            "hung (tunnel dial-retry loops never raise)")
    p_doc.add_argument("--watch", action="store_true",
                       help="poll until HEALTHY, then exit 0 — e.g. "
                            "'rau-vqa doctor --watch && bash "
                            "scripts/run_pending_measurements.sh' rides "
                            "out a tunnel outage unattended")
    p_doc.add_argument("--watch-interval", type=float, default=120.0,
                       help="seconds between --watch polls")
    p_doc.add_argument("--watch-timeout", type=float, default=0.0,
                       help="give up (exit 1) after this many seconds; "
                            "0 = wait forever")

    p_fix = sub.add_parser("fixture", help="generate the tiny test fixture")
    p_fix.add_argument("--out", required=True)

    p_conv = sub.add_parser("convert-snapshot",
                            help="Torch7 snapshot <-> native checkpoint")
    p_conv.add_argument("--input", required=True)
    p_conv.add_argument("--output", required=True)
    p_conv.add_argument("--to-torch", action="store_true")
    p_conv.add_argument("--vocab-size", type=int, required=True)
    p_conv.add_argument("--answer-size", type=int, default=1000)
    p_conv.add_argument("--seq-len", type=int, default=26)
    p_conv.add_argument("--config-json", default=None,
                        help="model config json (e.g. a run's config.json) "
                             "overriding preset dims")
    _add_train_flags(p_conv)
    _add_common_data_flags(p_conv)

    p_diag = sub.add_parser("diagnose-snapshot",
                            help="diagnose a Torch snapshot's flat-vector "
                                 "layout (sizes, ambiguity classes, order)")
    p_diag.add_argument("--input", required=True, help="snapshot .t7")
    p_diag.add_argument("--ref-checkpoint", default=None,
                        help="trusted native checkpoint for content-based "
                             "order recovery")
    p_diag.add_argument("--vocab-size", type=int, required=True)
    p_diag.add_argument("--answer-size", type=int, default=1000)
    p_diag.add_argument("--seq-len", type=int, default=26)
    _add_train_flags(p_diag)
    _add_common_data_flags(p_diag)

    p_ver = sub.add_parser("verify-released",
                           help="released-checkpoint parity: convert a "
                                "reference tarball's snapshot, eval, diff "
                                "against its own result JSONs")
    group = p_ver.add_mutually_exclusive_group(required=True)
    group.add_argument("--tarball", help="released .tar.gz "
                       "(download_trained_model.sh artifact)")
    group.add_argument("--extracted", help="already-extracted tarball root")
    p_ver.add_argument("--epoch", type=float, default=None,
                       help="snapshot epoch to verify (default: highest)")
    p_ver.add_argument("--min-agree", type=float, default=0.999,
                       help="per-hop answer agreement threshold for exit 0")
    p_ver.add_argument("--model-json", default=None,
                       help="model-config json overriding preset dims "
                            "(dims the snapshot opt table doesn't carry)")
    _add_train_flags(p_ver)
    _add_common_data_flags(p_ver)

    p_dash = sub.add_parser("dashboard",
                            help="live HTTP dashboard over a run directory")
    p_dash.add_argument("--workdir", required=True)
    p_dash.add_argument("--port", type=int, default=8000)
    p_dash.add_argument("--nhop", type=int, default=8)

    p_ask = sub.add_parser("ask", help="answer one question from a checkpoint")
    p_ask.add_argument("--checkpoint", required=True)
    p_ask.add_argument("--question", required=True)
    p_ask.add_argument("--feat-name", required=True,
                       help="feature file name, e.g. COCO_val2014_0000....t7")
    p_ask.add_argument("--topk", type=int, default=5)
    _add_train_flags(p_ask)
    _add_common_data_flags(p_ask)

    p_exp = sub.add_parser("export",
                           help="AOT-export a snapshot's predict program "
                                "to a StableHLO serving artifact")
    p_exp.add_argument("--checkpoint", required=True,
                       help="native snapshot (.msgpack)")
    p_exp.add_argument("--out", required=True, help="artifact directory")
    p_exp.add_argument("--preset", default="ours_ms",
                       help="fallback config if the snapshot lacks "
                            "model_config metadata")
    p_exp.add_argument("--eval-buckets", default=None,
                       help="token-length bucket ladder ('none' = full "
                            "seq_len only). Default: 8,16 for predict "
                            "artifacts; none for --backbone artifacts "
                            "(every bucket file bakes the full backbone "
                            "weights)")
    p_exp.add_argument("--bf16", action="store_true",
                       help="bake bf16 MXU passes into the artifact "
                            "(fast serving numerics, like bench.py)")
    p_exp.add_argument("--backbone", default=None,
                       choices=["vgg16", "resnet101", "vit"],
                       help="export the FROM-PIXELS program instead "
                            "(uint8 images + tokens -> answers; backbone "
                            "weights baked in)")
    p_exp.add_argument("--backbone-state", default=None,
                       help="torchvision state_dict .pth for --backbone")
    p_exp.add_argument("--image-size", type=int, default=None,
                       help="input image side for --backbone artifacts "
                            "(default: derived from the checkpoint's "
                            "feature grid, cnn_w * 32)")

    p_serve = sub.add_parser("serve", help="HTTP inference service")
    p_serve.add_argument("--checkpoint",
                         help="native snapshot (.msgpack); or use "
                              "--artifact")
    p_serve.add_argument("--artifact",
                         help="AOT StableHLO artifact dir from "
                              "'rau-vqa export' (params baked in)")
    p_serve.add_argument("--port", type=int, default=8080)
    p_serve.add_argument("--max-batch", type=int, default=16,
                         help="micro-batching group cap")
    p_serve.add_argument("--max-wait-ms", type=float, default=5.0,
                         help="max artificial queueing delay; 0 disables "
                              "micro-batch lingering")
    p_serve.add_argument("--feat-cache", type=int, default=256,
                         help="LRU image-feature cache entries (a ResNet "
                              "entry is ~1.6 MB); 0 effectively disables")
    p_serve.add_argument("--request-timeout", type=float, default=2600.0,
                         help="per-request wait bound in seconds (the "
                              "tunnel can hang without raising; /healthz "
                              "reports 'wedged' past this); 0 disables")
    _add_train_flags(p_serve)
    _add_common_data_flags(p_serve)

    raw = sys.argv[1:] if argv is None else list(argv)
    # honor a leading --platform before the bench-pixels passthrough too
    if len(raw) >= 2 and raw[0] == "--platform":
        _pin_platform(raw[1])
        raw = raw[2:]
        argv = raw
    elif raw and raw[0].startswith("--platform="):
        _pin_platform(raw[0].split("=", 1)[1])
        raw = raw[1:]
        argv = raw
    def _run_bench_pixels(extra):
        # passthrough: bench_pixels owns its own argparse surface.  It
        # lives at the repo root (outside the package), so resolve it from
        # this file's location — a bare import only works from the root.
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(
            __file__)))
        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        import bench_pixels
        sys.argv = ["bench_pixels"] + list(extra)
        bench_pixels.main()
        return 0

    if raw and raw[0] == "bench-pixels":
        return _run_bench_pixels(raw[1:])
    args = parser.parse_args(argv)
    if getattr(args, "platform", None):  # e.g. main(["--platform", ...])
        _pin_platform(args.platform)
    if args.command == "bench-pixels":
        # reached when the leading --platform was spelled in a form the
        # raw pre-parse does not recognize (e.g. the argparse prefix
        # abbreviation '--plat cpu bench-pixels'); bench_pixels flags
        # cannot survive parse_args, so only the bare invocation lands
        # here — still dispatch it rather than KeyError
        return _run_bench_pixels([])
    if args.command == "bench":
        # bench.py lives at the repo root, outside the package — resolve
        # like the bench-pixels passthrough (a bare import only works when
        # invoked from the repo root, not as an installed console script)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(
            __file__)))
        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        import bench as _bench
        _bench.main()
        return 0
    if args.command == "profile":
        return cmd_profile(args)
    if args.command == "dashboard":
        from rau_vqa_tpu.utils.dashboard import serve_dashboard
        serve_dashboard(args.workdir, args.port, args.nhop)
        return 0
    if args.command == "serve":
        from rau_vqa_tpu.serve import RAUService, serve
        # 'none' disables, absent (None) = the service's mode-dependent
        # default (RAUService: (8,16) live, () for a baked artifact)
        buckets = _parse_buckets(getattr(args, "eval_buckets", None))
        bb_params = None
        if args.backbone:
            art_kind = None
            if args.artifact:
                try:
                    with open(os.path.join(args.artifact,
                                           "meta.json")) as f:
                        art_kind = json.load(f).get("kind", "predict")
                except OSError:
                    pass            # RAUService gives the real error
            if art_kind == "pixels_predict":
                # the artifact bakes its own backbone: don't pay the
                # ~170 MB torch.load only for RAUService to ignore it
                # (it still warns that the flags have no effect)
                pass
            else:
                bb_params = _load_backbone_state(args.backbone,
                                                 args.backbone_state)
        svc = RAUService(args.checkpoint, args.vqa_dir,
                         args.feat_dir or [], preset=args.preset,
                         artifact=args.artifact,
                         fused=getattr(args, "fused_eval", False),
                         backbone=args.backbone, bb_params=bb_params,
                         buckets=buckets, max_batch=args.max_batch,
                         max_wait_ms=args.max_wait_ms,
                         feat_cache_size=args.feat_cache,
                         request_timeout_s=args.request_timeout)
        serve(svc, args.port).serve_forever()
        return 0
    return {"train": cmd_train, "eval": cmd_eval,
            "pack-features": cmd_pack_features,
            "prepro": cmd_prepro,
            "vqa-accuracy": cmd_vqa_accuracy,
            "precompute-features": cmd_precompute_features,
            "fixture": cmd_fixture,
            "convert-snapshot": cmd_convert_snapshot,
            "diagnose-snapshot": cmd_diagnose_snapshot,
            "verify-released": cmd_verify_released,
            "export": cmd_export,
            "doctor": cmd_doctor,
            "ask": cmd_ask}[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
