"""AOT StableHLO export (eval/export.py): roundtrip exactness, symbolic
batch, bucket dispatch, and the CLI surface.

The reference has no deployment story beyond shipping .t7 snapshots that
need the full Lua/Torch stack at serving time (Eval.lua:113-130); the
export subsystem is the TPU-native equivalent — a self-contained StableHLO
artifact any JAX runtime can call."""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from rau_vqa_tpu.config import get_preset
from rau_vqa_tpu.eval.export import export_predict, load_exported
from rau_vqa_tpu.eval.predict import predict
from rau_vqa_tpu.models.rau import init_params


def tiny_cfg(seq_len=6):
    return dataclasses.replace(
        get_preset("ours_ms").model, n_hops=2, vocab_size=50, embed_dim=8,
        rnn_size=8, multfeat_dim=8, attfeat_dim=8, att_rnn_size=8,
        cnn_dim=8, cnn_w=2, cnn_h=2, answer_size=10, seq_len=seq_len)


def make_inputs(cfg, b, max_len=None, seed=0):
    rs = np.random.RandomState(seed)
    T = cfg.seq_len
    max_len = max_len or T
    lens = rs.randint(1, max_len + 1, b).astype(np.int32)
    toks = rs.randint(1, cfg.vocab_size, (b, T)).astype(np.int32)
    # honor the ZEROPAD contract: tokens past each length are 0
    toks[np.arange(T)[None, :] >= lens[:, None]] = 0
    feats = rs.randn(b, cfg.cnn_spat, cfg.cnn_dim).astype(np.float32)
    return toks, lens, feats


@pytest.mark.slow   # fast-loop budget (VERDICT r4 #5); full suite runs it
def test_export_roundtrip_symbolic_batch(tmp_path):
    """One artifact serves any batch size, bit-identically to live
    predict."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    art = str(tmp_path / "art")
    paths = export_predict(params, cfg, art)
    assert set(paths) == {cfg.seq_len}

    run = load_exported(art)
    live = jax.jit(lambda t, l, f: predict(params, cfg, t, l, f))
    for b in (3, 8):
        toks, lens, feats = make_inputs(cfg, b, seed=b)
        tp, ta = run(toks, lens, feats)
        tp2, ta2 = live(toks, lens, feats)
        assert tp.shape == (cfg.n_hops + 2, b, cfg.answer_size)
        np.testing.assert_array_equal(np.asarray(tp), np.asarray(tp2))
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(ta2))


@pytest.mark.slow   # >5 s: fast-loop budget (CLAUDE.md)
def test_export_bucket_dispatch_exact(tmp_path):
    """A short-question batch dispatches to the small-T program and still
    equals the full-length live program exactly (the eval-ladder
    truncation-exactness argument)."""
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    art = str(tmp_path / "art")
    paths = export_predict(params, cfg, art, buckets=(4,))
    assert set(paths) == {4, cfg.seq_len}

    run = load_exported(art)
    live = jax.jit(lambda t, l, f: predict(params, cfg, t, l, f))
    toks, lens, feats = make_inputs(cfg, 5, max_len=4, seed=1)
    tp, ta = run(toks, lens, feats)
    tp2, ta2 = live(toks, lens, feats)
    np.testing.assert_array_equal(np.asarray(tp), np.asarray(tp2))
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(ta2))
    # and the dispatcher really used the T=4 program
    assert list(run._programs) == [4]


def test_export_rejects_foreign_dir(tmp_path):
    os.makedirs(tmp_path / "x")
    with open(tmp_path / "x" / "meta.json", "w") as f:
        json.dump({"format": "something_else"}, f)
    with pytest.raises(ValueError, match="not a rau_vqa_tpu export"):
        load_exported(str(tmp_path / "x"))


def test_cli_export_from_snapshot(tmp_path):
    """rau-vqa export: snapshot (self-describing model_config) -> artifact
    dir -> answers match a live model built from the same params."""
    from rau_vqa_tpu.cli import main
    from rau_vqa_tpu.utils.checkpoint import save_checkpoint

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(7), cfg)
    ckpt_dir = str(tmp_path / "ckpt")
    path = save_checkpoint(
        ckpt_dir, 3, 1.0, {"params": params},
        extra={"model_config": dataclasses.asdict(cfg)})
    art = str(tmp_path / "art")
    rc = main(["export", "--checkpoint", path, "--out", art,
               "--eval-buckets", "4"])
    assert rc == 0
    with open(os.path.join(art, "meta.json")) as f:
        meta = json.load(f)
    assert meta["ladder"] == [4, cfg.seq_len]
    assert meta["step"] == 3

    run = load_exported(art)
    live = jax.jit(lambda t, l, f: predict(params, cfg, t, l, f))
    toks, lens, feats = make_inputs(cfg, 4, seed=2)
    tp, _ = run(toks, lens, feats)
    tp2, _ = live(toks, lens, feats)
    np.testing.assert_array_equal(np.asarray(tp), np.asarray(tp2))


def test_pick_bucket_overflow_raises(tmp_path):
    """Lengths exceeding the ladder top must fail loudly in BOTH the live
    ladder and the artifact runner — not silently truncate real tokens."""
    from rau_vqa_tpu.eval.predict import bucket_ladder, pick_bucket

    cfg = tiny_cfg()
    ladder = bucket_ladder(cfg.seq_len, (4,))
    assert ladder == [4, cfg.seq_len]
    assert pick_bucket(ladder, 3) == 4
    assert pick_bucket(ladder, 4) == 4
    assert pick_bucket(ladder, 5) == cfg.seq_len
    with pytest.raises(ValueError, match="exceeds the ladder top"):
        pick_bucket(ladder, cfg.seq_len + 1)

    params = init_params(jax.random.PRNGKey(0), cfg)
    art = str(tmp_path / "art")
    export_predict(params, cfg, art)
    run = load_exported(art)
    toks, lens, feats = make_inputs(cfg, 3)
    lens = lens.copy()
    lens[0] = cfg.seq_len + 5   # inconsistent with the h5 contract
    with pytest.raises(ValueError, match="exceeds the ladder top"):
        run(toks, lens, feats)


def test_cli_export_shape_mismatch_fails_loudly(tmp_path):
    """A metadata-less snapshot exported under a mismatched --preset must
    raise the checkpoint shape error, not bake mismatched params."""
    from flax import serialization

    from rau_vqa_tpu.cli import main

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "snap.msgpack")
    with open(path, "wb") as f:  # raw msgpack, no .json sidecar
        f.write(serialization.to_bytes({"params": params}))
    with pytest.raises(ValueError, match="shape mismatch"):
        # default preset = ours_ms paper dims != tiny_cfg dims
        main(["export", "--checkpoint", path,
              "--out", str(tmp_path / "art")])


@pytest.mark.slow   # >5 s: fast-loop budget (CLAUDE.md)
def test_cli_export_pixels_vit(tmp_path, monkeypatch):
    """export --backbone vit derives the ViT config's fixed input size
    (not the stride-32 rule) and validates size/grid up front."""
    from rau_vqa_tpu import cli
    from rau_vqa_tpu.models.backbones import vit as vit_mod
    from rau_vqa_tpu.utils.checkpoint import save_checkpoint

    vcfg = vit_mod.ViTConfig(image_size=16, patch=4, dim=32, depth=1,
                             heads=4, mlp_ratio=2.0)
    monkeypatch.setattr(vit_mod, "VIT_L14", vcfg)
    bb = vit_mod.vit_init(jax.random.PRNGKey(1), vcfg)
    monkeypatch.setattr(cli, "_load_backbone_state", lambda b, s: bb)

    cfg = dataclasses.replace(tiny_cfg(), cnn_dim=32, cnn_w=4, cnn_h=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    path = save_checkpoint(
        str(tmp_path / "ckpt"), 1, 1.0, {"params": params},
        extra={"model_config": dataclasses.asdict(cfg)})
    art = str(tmp_path / "art")
    rc = cli.main(["export", "--checkpoint", path, "--out", art,
                   "--backbone", "vit", "--backbone-state", "x"])
    assert rc == 0
    with open(os.path.join(art, "meta.json")) as f:
        meta = json.load(f)
    assert meta["kind"] == "pixels_predict"
    assert meta["image_size"] == 16   # vcfg.image_size, NOT cnn_w * 32

    with pytest.raises(SystemExit):   # wrong explicit size -> upfront error
        cli.main(["export", "--checkpoint", path,
                  "--out", str(tmp_path / "a2"), "--backbone", "vit",
                  "--backbone-state", "x", "--image-size", "448"])

    cfg2 = dataclasses.replace(tiny_cfg(), cnn_dim=32, cnn_w=2, cnn_h=2)
    p2 = save_checkpoint(
        str(tmp_path / "c2"), 1, 1.0,
        {"params": init_params(jax.random.PRNGKey(0), cfg2)},
        extra={"model_config": dataclasses.asdict(cfg2)})
    with pytest.raises(SystemExit):   # snapshot grid != vit token grid
        cli.main(["export", "--checkpoint", p2,
                  "--out", str(tmp_path / "a3"), "--backbone", "vit",
                  "--backbone-state", "x"])


@pytest.mark.slow   # fast-loop budget (VERDICT r4 #5); full suite runs it
def test_export_pixels_roundtrip(tmp_path):
    """The from-pixels artifact (uint8 images + tokens -> answers, backbone
    baked in) reproduces the live pixels_forward path bit-identically, with
    a symbolic batch and bucket dispatch."""
    from rau_vqa_tpu.eval.export import export_pixels_predict
    from rau_vqa_tpu.models.backbones.vit import ViTConfig, vit_init
    from rau_vqa_tpu.models.pipeline import extract_features

    vcfg = ViTConfig(image_size=16, patch=4, dim=32, depth=2, heads=4,
                     mlp_ratio=2.0)
    cfg = dataclasses.replace(tiny_cfg(seq_len=6), cnn_dim=32, cnn_w=4,
                              cnn_h=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    bb = vit_init(jax.random.PRNGKey(1), vcfg)

    art = str(tmp_path / "pix_art")
    paths = export_pixels_predict(params, cfg, "vit", bb, art,
                                  image_size=16, buckets=(4,),
                                  vit_cfg=vcfg)
    assert set(paths) == {4, cfg.seq_len}
    assert all(os.path.basename(p).startswith("pixels_T")
               for p in paths.values())
    with open(os.path.join(art, "meta.json")) as f:
        meta = json.load(f)
    assert meta["kind"] == "pixels_predict" and meta["backbone"] == "vit"

    run = load_exported(art)
    live = jax.jit(lambda i, t, l: predict(
        params, cfg, t, l,
        extract_features("vit", bb, i, vit_cfg=vcfg).astype(np.float32)))
    rs = np.random.RandomState(7)
    for b, max_len in ((3, 4), (8, 6)):   # exercises BOTH buckets
        images = rs.randint(0, 255, (b, 16, 16, 3)).astype(np.uint8)
        toks, lens, _ = make_inputs(cfg, b, max_len=max_len, seed=b)
        tp, ta = run(images, toks, lens)
        tp2, ta2 = live(images, toks, lens)
        assert tp.shape == (cfg.n_hops + 2, b, cfg.answer_size)
        np.testing.assert_array_equal(np.asarray(tp), np.asarray(tp2))
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(ta2))


def test_export_serve_chain_roundtrip(tmp_path):
    """The bench-chain artifact (kind serve_chain, params as OPERANDS)
    reproduces the live jitted chain bit-for-bit — the exactness claim
    behind `bench.py --artifact` (VERDICT r3 #6)."""
    from rau_vqa_tpu.eval.chain import make_serve_chain
    from rau_vqa_tpu.eval.export import export_serve_chain

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, K = 4, 3
    art = str(tmp_path / "chain")
    export_serve_chain(params, cfg, art, batch=B, chain=K, n_acc=2)
    with open(os.path.join(art, "meta.json")) as f:
        meta = json.load(f)
    assert meta["kind"] == "serve_chain"
    assert (meta["batch"], meta["chain"]) == (B, K)

    toks, lens, feats = make_inputs(cfg, B, seed=2)
    run = load_exported(art)
    salt_a, acc_a = run(params, toks, lens, feats, np.int32(7))
    live = jax.jit(make_serve_chain(cfg, K, 2))
    salt_b, acc_b = live(params, toks, lens, feats, np.int32(7))
    assert np.asarray(acc_a).shape == (cfg.n_hops + 2, 2)
    np.testing.assert_array_equal(np.asarray(acc_a), np.asarray(acc_b))
    assert int(salt_a) == int(salt_b)


@pytest.mark.slow   # fast-loop budget (VERDICT r4 #5); full suite runs it
def test_export_pixels_chain_roundtrip(tmp_path):
    """Same for the from-pixels chain (kind pixels_chain, BOTH weight
    trees as operands, variant pinned by tree structure)."""
    from rau_vqa_tpu.eval.chain import make_pixels_chain
    from rau_vqa_tpu.eval.export import export_pixels_chain
    from rau_vqa_tpu.models.backbones.resnet import (
        fold_batchnorm,
        resnet101_init,
    )

    size, B, K, Q = 64, 2, 2, 2
    cfg = dataclasses.replace(tiny_cfg(), cnn_dim=2048,
                              cnn_w=size // 32, cnn_h=size // 32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    bb = fold_batchnorm(resnet101_init(jax.random.PRNGKey(1)))
    art = str(tmp_path / "pchain")
    export_pixels_chain(bb, params, cfg, "resnet101", art, batch=B,
                        chain=K, qpi=Q, image_size=size, n_acc=2)

    rs = np.random.RandomState(3)
    images = rs.randint(0, 256, (B, size, size, 3)).astype(np.uint8)
    toks, lens, _ = make_inputs(cfg, B * Q, seed=3)
    run = load_exported(art)
    salt_a, acc_a = run(bb, params, images, toks, lens, np.int32(5))
    live = jax.jit(make_pixels_chain(cfg, "resnet101", K, Q, 2))
    salt_b, acc_b = live(bb, params, images, toks, lens, np.int32(5))
    np.testing.assert_array_equal(np.asarray(acc_a), np.asarray(acc_b))
    assert int(salt_a) == int(salt_b)


@pytest.mark.slow   # traces full-size programs (~1 min)
def test_sweep_programs_tpu_lowering_no_hardware():
    """TPU-platform-lower (jax.export, no device needed) the EXACT
    programs scripts/run_pending_measurements.sh will compile on the rig:
    the questions chain at B=2048/K=30, the from-pixels chain over the
    folded ResNet-101 at 448/B=64, and the ViT-L chain at B=32.  The
    round-3 jit-args regression shipped because nothing exercised these
    paths during the outage; CPU smokes catch trace bugs, this also
    catches TPU-only lowering failures."""
    import jax.numpy as jnp
    from jax import export as jexport

    from rau_vqa_tpu.eval.chain import make_pixels_chain, make_serve_chain
    from rau_vqa_tpu.models.backbones.resnet import (
        fold_batchnorm,
        resnet101_init,
    )
    from rau_vqa_tpu.models.rau import init_params

    def sds(tree):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree)

    # questions path: flagship ours_ms at the bench protocol dims
    cfg = dataclasses.replace(get_preset("ours_ms").model,
                              matmul_precision="default",
                              compute_dtype="bfloat16")
    params_s = sds(jax.eval_shape(lambda k: init_params(k, cfg),
                                  jax.random.PRNGKey(0)))
    B = 2048
    jexport.export(jax.jit(make_serve_chain(cfg, 30)), platforms=("tpu",))(
        params_s,
        jax.ShapeDtypeStruct((B, cfg.seq_len), jnp.int32),
        jax.ShapeDtypeStruct((B,), jnp.int32),
        jax.ShapeDtypeStruct((B, cfg.cnn_spat, cfg.cnn_dim), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32))

    # from-pixels: folded bf16 ResNet-101 at 448, B=64, qpi=3 (headline)
    rcfg = dataclasses.replace(get_preset("ours_resnet").model,
                               cnn_w=14, cnn_h=14,
                               matmul_precision="default",
                               compute_dtype="bfloat16")
    rparams_s = sds(jax.eval_shape(lambda k: init_params(k, rcfg),
                                   jax.random.PRNGKey(0)))
    # fold_batchnorm is numpy-eager (host math) — build the tree for real
    bb_s = sds(fold_batchnorm(resnet101_init(jax.random.PRNGKey(1),
                                             dtype=jnp.bfloat16)))
    Bi = 64
    jexport.export(jax.jit(make_pixels_chain(rcfg, "resnet101", 10, 3, 4)),
                   platforms=("tpu",))(
        bb_s, rparams_s,
        jax.ShapeDtypeStruct((Bi, 448, 448, 3), jnp.uint8),
        jax.ShapeDtypeStruct((Bi * 3, rcfg.seq_len), jnp.int32),
        jax.ShapeDtypeStruct((Bi * 3,), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32))

    # ViT-L stretch config (BASELINE.json configs[4]) at B=32
    from rau_vqa_tpu.models.backbones.vit import VIT_L14, vit_init
    vcfg = dataclasses.replace(get_preset("ours_vit").model,
                               cnn_w=VIT_L14.grid, cnn_h=VIT_L14.grid,
                               matmul_precision="default",
                               compute_dtype="bfloat16")
    vparams_s = sds(jax.eval_shape(lambda k: init_params(k, vcfg),
                                   jax.random.PRNGKey(0)))
    vbb_s = sds(jax.eval_shape(
        lambda k: vit_init(k, VIT_L14, dtype=jnp.bfloat16),
        jax.random.PRNGKey(1)))
    Bv, s = 32, VIT_L14.image_size
    jexport.export(jax.jit(make_pixels_chain(vcfg, "vit", 10, 3, 4)),
                   platforms=("tpu",))(
        vbb_s, vparams_s,
        jax.ShapeDtypeStruct((Bv, s, s, 3), jnp.uint8),
        jax.ShapeDtypeStruct((Bv * 3, vcfg.seq_len), jnp.int32),
        jax.ShapeDtypeStruct((Bv * 3,), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32))


def test_serve_chain_accepts_python_int_salt(tmp_path):
    """A plain-int salt0 must trace: the init carry was weak-typed while
    the body returned strong int32 — fori_loop rejected the mismatch
    (the pixels chain always had the jnp.int32 guard; the serve chain
    lacked it and worked only because bench.py passes jnp.int32(0))."""
    from rau_vqa_tpu.eval.chain import make_serve_chain

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    toks, lens, feats = make_inputs(cfg, 4, seed=5)
    salt, acc = jax.jit(make_serve_chain(cfg, 2, 2))(
        params, toks, lens, feats, 0)          # python int, not jnp.int32
    assert np.asarray(acc).shape == (cfg.n_hops + 2, 2)
    assert int(salt) > 0


def test_export_serve_chain_meta_clamps_n_acc(tmp_path):
    """meta.json must document the program's ACTUAL acc shape: the traced
    chain clamps n_acc to the batch (shrunk CPU smokes), so an unclamped
    meta would shape-mismatch any consumer sizing from it."""
    from rau_vqa_tpu.eval.export import export_serve_chain

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    art = str(tmp_path / "clamp")
    export_serve_chain(params, cfg, art, batch=2, chain=1, n_acc=8)
    with open(os.path.join(art, "meta.json")) as f:
        meta = json.load(f)
    assert meta["n_acc"] == 2
    assert meta["outputs"]["acc"] == [cfg.n_hops + 2, 2]
    toks, lens, feats = make_inputs(cfg, 2, seed=1)
    salt, acc = load_exported(art)(params, toks, lens, feats, np.int32(0))
    assert list(np.asarray(acc).shape) == meta["outputs"]["acc"]


def test_chain_artifact_unknown_code_rev_not_stale(tmp_path):
    """An artifact built off-checkout records code_rev='unknown'; loading
    it inside a checkout must NOT rebuild forever — the rev pin applies
    only when both sides know their revision."""
    import dataclasses as dc

    from rau_vqa_tpu.eval.export import (
        export_serve_chain,
        load_or_build_chain_artifact,
    )

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    art = str(tmp_path / "rev")
    expect = {"kind": "serve_chain", "batch": 2, "chain": 1,
              "model_config": dc.asdict(cfg)}
    builds = []

    def build():
        builds.append(1)
        export_serve_chain(params, cfg, art, batch=2, chain=1, n_acc=2)

    load_or_build_chain_artifact(art, build, expect, log=lambda *_: None)
    assert len(builds) == 1
    # simulate the off-checkout build: strip the recorded revision
    mp = os.path.join(art, "meta.json")
    with open(mp) as f:
        meta = json.load(f)
    meta["code_rev"] = "unknown"
    with open(mp, "w") as f:
        json.dump(meta, f)
    load_or_build_chain_artifact(art, build, expect, log=lambda *_: None)
    assert len(builds) == 1     # no spurious rebuild
    # a REAL protocol change still rebuilds
    load_or_build_chain_artifact(art, build, dict(expect, chain=2),
                                 log=lambda *_: None)
    assert len(builds) == 2
