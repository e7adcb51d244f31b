"""Backbone fine-tuning: blockwise remat parity and the trainable-backbone
train step (the capability the reference fundamentally lacks — its features
are precomputed by a frozen Caffe/Torch extractor, data/get_*.sh; here the
backbone is a 4th parameter group and gradients flow through the pixels).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rau_vqa_tpu.models.pipeline import extract_features


def _u8(B, H, W, seed=0):
    return jnp.asarray(np.random.RandomState(seed)
                       .randint(0, 256, (B, H, W, 3)).astype(np.uint8))


def _loss(backbone, bb, imgs, remat):
    return jnp.sum(extract_features(backbone, bb, imgs, remat=remat) ** 2)


@pytest.mark.slow
@pytest.mark.parametrize("backbone", ["vgg16", "resnet101"])
def test_remat_matches_plain_values_and_grads(backbone):
    if backbone == "resnet101":
        from rau_vqa_tpu.models.backbones.resnet import resnet101_init
        bb = resnet101_init(jax.random.PRNGKey(0))
    else:
        from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
        bb = vgg16_pool5_init(jax.random.PRNGKey(0))
    imgs = _u8(2, 64, 64)
    y0 = extract_features(backbone, bb, imgs, remat=False)
    y1 = extract_features(backbone, bb, imgs, remat=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-6, atol=1e-6)
    g0 = jax.grad(lambda p: _loss(backbone, p, imgs, False))(bb)
    g1 = jax.grad(lambda p: _loss(backbone, p, imgs, True))(bb)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4), g0, g1)


@pytest.mark.slow
def test_remat_matches_plain_vit():
    from rau_vqa_tpu.models.backbones.vit import ViTConfig, vit_apply, vit_init

    cfg = ViTConfig(image_size=28, patch=14, dim=32, depth=2, heads=2)
    bb = vit_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(1)
                    .randn(2, 28, 28, 3).astype(np.float32))
    y0 = vit_apply(bb, cfg, x, remat=False)
    y1 = vit_apply(bb, cfg, x, remat=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-6, atol=1e-6)
    g0 = jax.grad(lambda p: jnp.sum(vit_apply(p, cfg, x, False) ** 2))(bb)
    g1 = jax.grad(lambda p: jnp.sum(vit_apply(p, cfg, x, True) ** 2))(bb)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4), g0, g1)


def _tiny_mcfg(**kw):
    from rau_vqa_tpu.config import ModelConfig
    base = dict(vocab_size=40, answer_size=9, seq_len=7, embed_dim=8,
                rnn_size=16, rnn_layers=2, cnn_dim=32, cnn_w=2, cnn_h=2,
                multfeat_dim=16, attfeat_dim=8, att_rnn_size=16, n_hops=2,
                embed_dropout=0.0, rnn_dropout=0.0, mult_dropout=0.0)
    base.update(kw)
    return ModelConfig(**base)


def _tiny_vit():
    from rau_vqa_tpu.models.backbones.vit import ViTConfig
    return ViTConfig(image_size=28, patch=14, dim=32, depth=2, heads=2)


def _ft_state_and_batch(B=8):
    from rau_vqa_tpu.models.backbones.vit import vit_init
    from rau_vqa_tpu.train.trainer import init_train_state
    mcfg = _tiny_mcfg()
    state = init_train_state(jax.random.PRNGKey(0), mcfg,
                             bb_params=vit_init(jax.random.PRNGKey(1),
                                                _tiny_vit()))
    rs = np.random.RandomState(0)
    batch = (
        jnp.asarray(rs.randint(1, mcfg.vocab_size, (B, mcfg.seq_len)),
                    jnp.int32),
        jnp.asarray(rs.randint(1, mcfg.seq_len + 1, B), jnp.int32),
        jnp.asarray(rs.randint(0, 256, (B, 28, 28, 3)).astype(np.uint8)),
        jnp.asarray(rs.randint(0, mcfg.answer_size, B), jnp.int32),
    )
    return mcfg, state, batch


@pytest.mark.slow
def test_train_backbone_step_updates_all_four_groups():
    """One fine-tuning step moves every group INCLUDING the backbone:
    gradients flow through the pixels (the reference's features come from
    a frozen extractor — it cannot express this)."""
    from rau_vqa_tpu.config import TrainConfig
    from rau_vqa_tpu.train.trainer import make_train_step

    mcfg, state, (tokens, lengths, images, labels) = _ft_state_and_batch()
    tcfg = TrainConfig(train_backbone=True)
    step = jax.jit(make_train_step(mcfg, tcfg, backbone="vit",
                                   vit_cfg=_tiny_vit()))
    hop_scale = jnp.ones((mcfg.n_hops,), jnp.float32)
    before = jax.tree.map(np.asarray, state.params)
    new_state, metrics = step(state, tokens, lengths, images, labels,
                              hop_scale, jnp.float32(1e-3),
                              jnp.float32(1e-4))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm_backbone"]))
    for g in ("embed", "rnn", "mult", "backbone"):
        changed = any(
            not np.array_equal(np.asarray(a), b)
            for a, b in zip(jax.tree.leaves(new_state.params[g]),
                            jax.tree.leaves(before[g])))
        assert changed, f"group {g!r} did not update"


@pytest.mark.slow
def test_train_backbone_grad_accum_matches_plain():
    """Gradient accumulation stays exact through the backbone: k=2
    microbatch passes produce the same update as one full-batch pass
    (both paths featurize inside the differentiated program)."""
    import dataclasses

    from rau_vqa_tpu.config import TrainConfig
    from rau_vqa_tpu.train.trainer import make_train_step

    mcfg, state, (tokens, lengths, images, labels) = _ft_state_and_batch()
    tcfg = TrainConfig(train_backbone=True, noisy_eta=0.0)
    hop_scale = jnp.ones((mcfg.n_hops,), jnp.float32)

    def run(t):
        step = jax.jit(make_train_step(mcfg, t, backbone="vit",
                                       vit_cfg=_tiny_vit()))
        s, m = step(state, tokens, lengths, images, labels, hop_scale,
                    jnp.float32(1e-3), jnp.float32(1e-4))
        return s, float(m["loss"])

    s1, loss1 = run(tcfg)
    s2, loss2 = run(dataclasses.replace(tcfg, grad_accum=2))
    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s1.params, s2.params)


@pytest.mark.slow
def test_train_backbone_sharded_matches_single():
    """The fine-tuning step composes with the device mesh: uint8 images
    shard on 'data', the backbone group replicates, GSPMD all-reduces its
    gradient — same update as single-device."""
    from rau_vqa_tpu.config import TrainConfig
    from rau_vqa_tpu.parallel.mesh import (
        make_mesh,
        make_sharded_train_step,
        place_state,
        shard_batch,
    )
    from rau_vqa_tpu.train.trainer import make_train_step

    mcfg, state, (tokens, lengths, images, labels) = _ft_state_and_batch()
    tcfg = TrainConfig(train_backbone=True)
    hop_scale = jnp.ones((mcfg.n_hops,), jnp.float32)

    plain = jax.jit(make_train_step(mcfg, tcfg, backbone="vit",
                                    vit_cfg=_tiny_vit()))
    s_ref, m_ref = plain(state, tokens, lengths, images, labels, hop_scale,
                         jnp.float32(1e-3), jnp.float32(1e-4))

    mesh = make_mesh(n_data=4, n_model=2)
    mcfg2, state2, _ = _ft_state_and_batch()
    placed = place_state(mesh, state2, tp=True)
    step = make_sharded_train_step(mcfg2, tcfg, mesh, placed, tp=True,
                                   backbone="vit", vit_cfg=_tiny_vit())
    st, sl, si, sy = shard_batch(mesh, np.asarray(tokens),
                                 np.asarray(lengths), np.asarray(images),
                                 np.asarray(labels))
    s_mesh, m_mesh = step(placed, st, sl, si, sy, hop_scale,
                          jnp.float32(1e-3), jnp.float32(1e-4))
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_mesh["loss"]),
                               rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        s_ref.params, s_mesh.params)


@pytest.mark.slow
def test_img_repeat_grouped_matches_duplicated():
    """Image-grouped fine-tuning (img_repeat=k: unique images through the
    backbone once, features repeated to the k grouped questions) produces
    the same update as running the duplicated images — grads are linear
    over the repeat; only float reassociation differs."""
    from rau_vqa_tpu.config import TrainConfig
    from rau_vqa_tpu.train.trainer import make_train_step

    k = 2
    mcfg, state, (tokens, lengths, images, labels) = _ft_state_and_batch(B=8)
    uniq = images[::k]                      # 4 unique images
    dup = jnp.repeat(uniq, k, axis=0)       # questions grouped per image
    tcfg = TrainConfig(train_backbone=True)
    hop_scale = jnp.ones((mcfg.n_hops,), jnp.float32)
    step_dup = jax.jit(make_train_step(mcfg, tcfg, backbone="vit",
                                       vit_cfg=_tiny_vit()))
    step_grp = jax.jit(make_train_step(mcfg, tcfg, backbone="vit",
                                       vit_cfg=_tiny_vit(), img_repeat=k))
    s1, m1 = step_dup(state, tokens, lengths, dup, labels, hop_scale,
                      jnp.float32(1e-3), jnp.float32(1e-4))
    s2, m2 = step_grp(state, tokens, lengths, uniq, labels, hop_scale,
                      jnp.float32(1e-3), jnp.float32(1e-4))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        s1.params, s2.params)


def test_trust_ratio_cap():
    """Per-leaf update cap: oversized steps scale to tau*(||w||+1e-3),
    small steps pass untouched, zero-norm leaves stay put."""
    from rau_vqa_tpu.train.optim import trust_ratio_cap

    old = {"w": jnp.ones((4,)) * 2.0,          # ||w|| = 4
           "b": jnp.zeros((3,)),               # ||w|| = 0 (floor 1e-3)
           "s": jnp.ones((2,))}
    new = {"w": old["w"] + jnp.ones((4,)),     # ||u|| = 2  (huge)
           "b": old["b"] + 1e-2,               # ||u|| = 0.017 (huge vs floor)
           "s": old["s"] + 1e-6}               # tiny — untouched
    out = trust_ratio_cap(new, old, tau=0.01)
    # w: cap = 0.01*(4+1e-3) ~ 0.04 -> scale 0.02
    u = np.asarray(out["w"] - old["w"])
    np.testing.assert_allclose(np.linalg.norm(u), 0.01 * (4 + 1e-3),
                               rtol=1e-5)
    # b: zero-norm leaf still moves, bounded by the 1e-3 floor
    ub = np.asarray(out["b"] - old["b"])
    np.testing.assert_allclose(np.linalg.norm(ub), 0.01 * 1e-3, rtol=1e-5)
    assert np.linalg.norm(ub) > 0
    # s: small update passes through exactly
    np.testing.assert_allclose(np.asarray(out["s"]),
                               np.asarray(new["s"]), rtol=0, atol=0)


def test_resnet_ft_preset():
    """ours_resnet_ft packages the measured-best fine-tune config
    (BASELINE.md): trainable backbone, grouped batches, no remat, bf16."""
    from rau_vqa_tpu.config import get_preset

    exp = get_preset("ours_resnet_ft")
    assert exp.train.train_backbone
    assert not exp.train.backbone_remat
    assert exp.train.batch_size == 288
    assert exp.data.batch_order == "imggroup"
    assert exp.model.compute_dtype == "bfloat16"
    assert exp.model.cnn_dim == 2048


def test_imggroup_batch_order():
    """'imggroup' keeps each image's questions consecutive, shuffles group
    order per epoch, covers every question exactly once, and rejects
    non-uniform groups loudly."""
    from rau_vqa_tpu.data.loader import SplitData

    n, g = 24, 3
    qs = np.ones((n, 5), np.int32)
    lens = np.full(n, 3, np.int32)
    names = [f"img{i // g}" for i in range(n)]

    def mk(nm):
        return SplitData("t", qs, lens, nm, np.zeros(n, np.int32),
                         np.arange(n), batch_size=6,
                         answers=np.zeros(n, np.int32))

    sd = mk(names)
    sd.set_batch_order_option("imggroup")
    assert sd.uniform_image_group_size() == g
    sd.reorder()
    order = sd.batch_order
    assert sorted(order.tolist()) == list(range(n))
    arr = np.asarray(names, dtype=object)[order]
    for i in range(0, n, g):
        assert len(set(arr[i:i + g])) == 1, "group split across positions"
    o1 = order.copy()
    sd.reorder()
    assert sorted(sd.batch_order.tolist()) == list(range(n))
    assert not np.array_equal(o1, sd.batch_order), "epochs must reshuffle"

    bad = mk(["odd"] + names[1:])
    with pytest.raises(ValueError, match="not uniform"):
        bad.set_batch_order_option("imggroup")


def test_image_dedup_get_batch(tmp_path):
    """get_batch decodes each DISTINCT path once and replicates rows —
    byte-identical output to the naive per-row decode."""
    from PIL import Image

    from rau_vqa_tpu.data.images import ImageDirSource

    rs = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rs.randint(0, 255, (40, 40, 3), np.uint8)).save(
            str(tmp_path / f"i{i}.jpg"))
    src = ImageDirSource(str(tmp_path), size=32)
    batch = src.get_batch(["i0.jpg", "i0.jpg", "i1.jpg", "i0.jpg"])
    assert batch.shape == (4, 32, 32, 3)
    np.testing.assert_array_equal(batch[0], batch[1])
    np.testing.assert_array_equal(batch[0], batch[3])
    assert not np.array_equal(batch[0], batch[2])
    ref = src.get_batch(["i0.jpg"])[0]
    np.testing.assert_array_equal(batch[0], ref)


@pytest.mark.slow
def test_trainer_grouped_finetune_end_to_end(tmp_path):
    """The Trainer composes 'imggroup' order with fine-tuning: batches
    ship B//g unique images, the step repeats features, training and the
    eval sweep run end-to-end."""
    import dataclasses as dc
    import os

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture
    from rau_vqa_tpu.data.images import ImageDirSource
    from rau_vqa_tpu.data.loader import load_gt_annotations, load_vqa_data
    from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
    from rau_vqa_tpu.train.trainer import Trainer

    spec = FixtureSpec()
    root = str(tmp_path / "fix")
    vqa_dir = generate_fixture(root, spec, images=True, image_size=64,
                               uniform_img_assign=True)
    exp = get_preset("ours_ms")
    exp = exp.replace(
        model=dc.replace(
            exp.model, n_hops=2, cnn_dim=512, cnn_w=2, cnn_h=2,
            embed_dim=16, rnn_size=16, multfeat_dim=16, attfeat_dim=8,
            att_rnn_size=16, embed_dropout=0.0, rnn_dropout=0.0,
            mult_dropout=0.1),
        train=dc.replace(
            exp.train, batch_size=16, noisy_eta=0.0, grad_clip=10.0,
            length_buckets=(), train_backbone=True),
        data=dc.replace(exp.data, split="val2014",
                        batch_order="imggroup"))
    gt = load_gt_annotations(os.path.join(vqa_dir, "gt_annotations.json"))
    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                         test_batch_size=8)
    src = ImageDirSource(os.path.join(root, "images"), size=64)
    bb = vgg16_pool5_init(jax.random.PRNGKey(3))
    trainer = Trainer(exp, data, src, str(tmp_path / "run"), gt_anno=gt,
                      backbone="vgg16", bb_params=bb)
    assert trainer.img_repeat == 4   # 160 questions / 40 images
    bb_init = np.asarray(bb["convs"][0]["w"])
    rec = trainer.train_epoch()
    assert np.isfinite(rec["loss"])
    assert not np.array_equal(
        np.asarray(trainer.state.params["backbone"]["convs"][0]["w"]),
        bb_init)
    res = trainer.evaluate(write_submissions=False)
    assert len(res["testOEacc"]) == exp.model.n_hops + 2


def test_train_backbone_requires_backbone():
    from rau_vqa_tpu.config import TrainConfig
    from rau_vqa_tpu.train.trainer import make_train_step

    with pytest.raises(ValueError, match="train_backbone"):
        make_train_step(_tiny_mcfg(), TrainConfig(train_backbone=True))


@pytest.mark.slow
def test_trainer_finetune_end_to_end(tmp_path):
    """The Trainer drives fine-tuning end-to-end on the image fixture: the
    train step consumes raw uint8 batches, the backbone group updates, and
    the eval sweep featurizes with the CURRENT trained backbone (not the
    init weights).  Also covers the warm-start restore: a head-only
    snapshot from a frozen-backbone run restores the three head groups
    while the backbone keeps its pretrained init."""
    import dataclasses as dc
    import os

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture
    from rau_vqa_tpu.data.images import ImageDirSource
    from rau_vqa_tpu.data.loader import load_gt_annotations, load_vqa_data
    from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
    from rau_vqa_tpu.train.trainer import Trainer

    spec = FixtureSpec()
    root = str(tmp_path / "fix")
    vqa_dir = generate_fixture(root, spec, images=True, image_size=64)
    exp = get_preset("ours_ms")
    exp = exp.replace(
        model=dc.replace(
            exp.model, n_hops=2, cnn_dim=512, cnn_w=2, cnn_h=2,
            embed_dim=16, rnn_size=16, multfeat_dim=16, attfeat_dim=8,
            att_rnn_size=16, embed_dropout=0.0, rnn_dropout=0.0,
            mult_dropout=0.1),
        train=dc.replace(
            exp.train, batch_size=16, noisy_eta=0.0, grad_clip=10.0,
            length_buckets=(), train_backbone=True, backbone_lr_scale=0.5),
        data=dc.replace(exp.data, split="val2014"))
    gt = load_gt_annotations(os.path.join(vqa_dir, "gt_annotations.json"))
    bb = vgg16_pool5_init(jax.random.PRNGKey(3))

    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                         test_batch_size=8)
    src = ImageDirSource(os.path.join(root, "images"), size=64,
                         backend="native")
    trainer = Trainer(exp, data, src, str(tmp_path / "run"), gt_anno=gt,
                      backbone="vgg16", bb_params=bb)
    bb_init = jax.tree.map(np.asarray, trainer.state.params["backbone"])
    rec = trainer.train_epoch()
    assert np.isfinite(rec["loss"])
    assert "grad_norm_backbone" in rec
    changed = any(
        not np.array_equal(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(trainer.state.params["backbone"]),
                        jax.tree.leaves(bb_init)))
    assert changed, "fine-tuning did not move the backbone group"
    # eval featurizes with the LIVE backbone group (values moved off init)
    assert not np.array_equal(
        np.asarray(trainer._bb_tree()["convs"][0]["w"]),
        bb_init["convs"][0]["w"])
    res = trainer.evaluate(write_submissions=False)
    assert len(res["testOEacc"]) == exp.model.n_hops + 2

    # 4-group checkpoint round-trips
    path = trainer.save()

    # serve adopts the fine-tuned backbone from the snapshot (not the
    # original torchvision weights the operator would otherwise pass)
    from rau_vqa_tpu.serve import RAUService
    svc = RAUService(path, vqa_dir, [os.path.join(root, "feat")],
                     preset="ours_ms")
    assert svc.backbone == "vgg16"
    np.testing.assert_array_equal(
        np.asarray(svc.bb_params["convs"][0]["w"]),
        np.asarray(trainer.state.params["backbone"]["convs"][0]["w"]))
    data2 = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                          test_batch_size=8)
    t2 = Trainer(exp, data2, src, str(tmp_path / "run2"), gt_anno=gt,
                 backbone="vgg16", bb_params=bb)
    t2.restore(path)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        t2.state.params, trainer.state.params)

    # warm start: a head-only snapshot restores the head, keeps the bb init
    frozen_exp = exp.replace(train=dc.replace(exp.train,
                                              train_backbone=False))
    data3 = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                          test_batch_size=8)
    frozen = Trainer(frozen_exp, data3, src, str(tmp_path / "frozen"),
                     gt_anno=gt, backbone="vgg16", bb_params=bb)
    frozen.train_epoch()
    head_path = frozen.save()
    data4 = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                          test_batch_size=8)
    warm = Trainer(exp, data4, src, str(tmp_path / "warm"), gt_anno=gt,
                   backbone="vgg16", bb_params=bb)
    warm.restore(head_path)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        {g: warm.state.params[g] for g in ("embed", "rnn", "mult")},
        {g: frozen.state.params[g] for g in ("embed", "rnn", "mult")})
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        warm.state.params["backbone"], bb_init)


@pytest.mark.slow
def test_cli_fixture_finetune_smoke(tmp_path):
    """`rau-vqa train --fixture --train-backbone` is a zero-asset e2e
    fine-tune: image fixture generated, random-init vgg16, one epoch +
    eval sweep, snapshot carries the 4th group."""
    import glob

    from rau_vqa_tpu.cli import main
    from rau_vqa_tpu.utils.checkpoint import load_backbone_group

    wd = str(tmp_path / "run")
    rc = main(["train", "--preset", "ours_ms", "--fixture",
               "--train-backbone", "--nhop", "2", "--epochs", "1",
               "--save-dir", wd])
    assert rc == 0
    snaps = sorted(glob.glob(wd + "/snapshot/*.msgpack"))
    assert snaps, "no snapshot written"
    bb = load_backbone_group(snaps[-1], "vgg16")
    assert "convs" in bb

    # the sidecar records the RMS feature interface the smoke trains on
    # (cli.py _fixture_setup enables backbone_feat_norm for the zero-asset
    # recipe) ...
    import json

    from rau_vqa_tpu.cli import _snapshot_meta
    meta = _snapshot_meta(snaps[-1])
    assert meta.get("backbone_feat_norm") is True
    assert meta.get("train_backbone") is True

    # ... and standalone eval ADOPTS it from the snapshot (cmd_eval meta
    # adoption; the Trainer featurize gate honors it with
    # train_backbone=False) — a mismatch would evaluate on raw,
    # off-distribution features.  No --backbone/--backbone-state here:
    # a fine-tuned snapshot carries its trained backbone group, and
    # cmd_eval adopts it for from-pixels eval the way serve does
    ewd = str(tmp_path / "evalrun")
    rc = main(["eval", "--preset", "ours_ms", "--fixture",
               "--checkpoint", snaps[-1],
               "--image-root", os.path.join(wd, "fixture", "images"),
               "--image-size", "64",
               "--save-dir", ewd])
    assert rc == 0
    results = glob.glob(ewd + "/results/hop_*/*_results.json")
    assert results, "eval wrote no result files"


@pytest.mark.slow   # full-ResNet host tree + ~170 MB msgpack round trip
def test_load_backbone_group_roundtrip(tmp_path):
    """A fine-tuned snapshot's 4th param group extracts standalone (host
    structure templates, folded/plain resnet auto-detected) — the path
    serve/eval/precompute/export use to consume TRAINED backbones via
    `--backbone-state snapshot.msgpack`."""
    from rau_vqa_tpu.cli import _load_backbone_state
    from rau_vqa_tpu.models.backbones.resnet import (
        fold_batchnorm,
        resnet101_init,
    )
    from rau_vqa_tpu.utils.benchparams import np_params_like
    from rau_vqa_tpu.utils.checkpoint import (
        load_backbone_group,
        save_checkpoint,
    )

    folded = fold_batchnorm(np_params_like(resnet101_init, 0, jnp.float32))
    tree = {"params": {"embed": {"x": np.zeros(3)}, "backbone": folded},
            "step": np.int32(1)}
    path = save_checkpoint(str(tmp_path / "ft"), 1, 1.0, tree)
    got = load_backbone_group(path, "resnet101")
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), got, folded)
    # the CLI flag routes .msgpack to the same loader
    got2 = _load_backbone_state("resnet101", path)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), got2, folded)

    head_only = {"params": {"embed": {"x": np.zeros(3)}},
                 "step": np.int32(1)}
    p2 = save_checkpoint(str(tmp_path / "head"), 2, 1.0, head_only)
    with pytest.raises(ValueError, match="backbone"):
        load_backbone_group(p2, "resnet101")


@pytest.mark.slow   # traces full-size fwd+bwd programs (~minutes)
def test_finetune_step_tpu_lowering_no_hardware():
    """TPU-platform-lower (jax.export, no device needed) the EXACT
    fine-tuning train-step programs the rig sweep will compile: backward
    through bf16 ResNet-101 at 448 px B=48 and through ViT-L at B=32 —
    conv wgrads and blockwise-remat transposes have TPU-only lowering
    paths a CPU smoke never exercises (CLAUDE.md: lower offline BEFORE
    burning a rig compile)."""
    import dataclasses

    from jax import export as jexport

    from rau_vqa_tpu.config import TrainConfig, get_preset
    from rau_vqa_tpu.models.backbones.resnet import resnet101_init
    from rau_vqa_tpu.models.backbones.vit import VIT_L14, vit_init
    from rau_vqa_tpu.train.trainer import init_train_state, make_train_step

    def sds(tree):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree)

    def state_sds(mcfg, bb_s):
        return jax.eval_shape(
            lambda k, bb: init_train_state(k, mcfg, bb_params=bb),
            sds(jax.random.PRNGKey(0)), bb_s)

    tcfg = TrainConfig(train_backbone=True)
    for preset, backbone, init_bb, B, px in (
            ("ours_resnet", "resnet101",
             lambda k: resnet101_init(k, dtype=jnp.bfloat16), 48, 448),
            ("ours_vit", "vit",
             lambda k: vit_init(k, VIT_L14, dtype=jnp.bfloat16), 32,
             VIT_L14.image_size)):
        mcfg = dataclasses.replace(get_preset(preset).model,
                                   matmul_precision="default",
                                   compute_dtype="bfloat16")
        bb_s = sds(jax.eval_shape(init_bb, jax.random.PRNGKey(1)))
        st_s = state_sds(mcfg, bb_s)
        step = make_train_step(mcfg, tcfg, backbone=backbone)
        jexport.export(jax.jit(step), platforms=("tpu",))(
            st_s,
            jax.ShapeDtypeStruct((B, mcfg.seq_len), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B, px, px, 3), jnp.uint8),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((mcfg.n_hops,), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32))


def test_remat_excludes_fused_stages():
    from rau_vqa_tpu.models.backbones.resnet import (
        fold_batchnorm,
        resnet101_apply,
        resnet101_init,
    )
    from rau_vqa_tpu.utils.benchparams import np_params_like

    # host-side param fill (np_params_like): the real resnet101_init
    # compiles ~16 s of device programs on CPU for a trace-time-only check
    bb = fold_batchnorm(np_params_like(resnet101_init, 0, jnp.float32))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match="exclusive"):
        resnet101_apply(bb, x, fused_stages=(2,), remat=True)


# ---------------------------------------------------------------------------
# RMS feature interface (TrainConfig.backbone_feat_norm) threading
# ---------------------------------------------------------------------------


def test_extract_feat_norm_rms_interface():
    """feat_norm=True RMS-normalizes each [b, s] cell over D — the
    scale-invariant backbone/head interface fine-tuned snapshots record
    (config.py backbone_feat_norm) — and is a real change vs raw."""
    from rau_vqa_tpu.models.backbones.vit import vit_init

    vcfg = _tiny_vit()
    bb = vit_init(jax.random.PRNGKey(1), vcfg)
    # ViT's ln_final already leaves features near RMS 1 at init — scale it
    # up so the drifting-backbone case (the one the interface guards) is
    # actually represented
    bb["ln_final"]["scale"] = bb["ln_final"]["scale"] * 3.0
    imgs = _u8(3, 28, 28)
    raw = np.asarray(extract_features("vit", bb, imgs, vit_cfg=vcfg))
    normed = np.asarray(extract_features("vit", bb, imgs, vit_cfg=vcfg,
                                         feat_norm=True))
    assert np.mean(raw.astype(np.float32) ** 2) > 4.0   # drifted interface
    ms = np.mean(normed.astype(np.float32) ** 2, axis=-1)
    np.testing.assert_allclose(ms, 1.0, atol=1e-2)
    assert not np.allclose(raw, normed)


@pytest.mark.slow
def test_feat_norm_threads_every_serving_path(tmp_path):
    """Every featurize entry point honors feat_norm identically: the
    sharded pixels program, the bench chain program, the AOT pixels
    artifact, and precomputed shards all match predict() on
    RMS-normalized features.  Guards the interface contract of
    RMS-fine-tuned snapshots — a path that forgets feat_norm serves
    off-distribution features silently."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from PIL import Image

    from rau_vqa_tpu.eval.chain import make_pixels_chain
    from rau_vqa_tpu.eval.export import export_pixels_predict, load_exported
    from rau_vqa_tpu.eval.predict import predict
    from rau_vqa_tpu.models.backbones.vit import vit_init
    from rau_vqa_tpu.models.rau import init_params
    from rau_vqa_tpu.parallel.mesh import (
        make_mesh,
        make_sharded_pixels_predict,
        param_pspecs,
        shard_batch,
    )
    from rau_vqa_tpu.precompute import precompute_features, scan_image_dir

    mcfg = _tiny_mcfg(cnn_w=2, cnn_h=2)
    vcfg = _tiny_vit()          # 28 px, 2x2 grid, dim 32 = mcfg.cnn_dim
    params = init_params(jax.random.PRNGKey(0), mcfg)
    bb = vit_init(jax.random.PRNGKey(1), vcfg)
    B = 8
    rs = np.random.RandomState(3)
    images = rs.randint(0, 255, (B, 28, 28, 3)).astype(np.uint8)
    tokens = rs.randint(1, mcfg.vocab_size, (B, mcfg.seq_len)).astype(np.int32)
    lengths = rs.randint(1, mcfg.seq_len + 1, B).astype(np.int32)
    tokens[np.arange(mcfg.seq_len)[None] >= lengths[:, None]] = 0

    feats = extract_features("vit", bb, jnp.asarray(images), vit_cfg=vcfg,
                             feat_norm=True)
    ref_tab, ref_att = predict(params, mcfg, jnp.asarray(tokens),
                               jnp.asarray(lengths), feats)

    # 1. the sharded from-pixels program
    mesh = make_mesh(n_data=4, n_model=1)
    fn = make_sharded_pixels_predict(mcfg, mesh, params, "vit",
                                     vit_cfg=vcfg, feat_norm=True)
    pspecs = param_pspecs(params, tp=False, mesh=mesh)
    p_placed = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, pspecs)
    bb_placed = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), bb)
    tab, att = fn(p_placed, bb_placed,
                  *shard_batch(mesh, jnp.asarray(images),
                               jnp.asarray(tokens), jnp.asarray(lengths)))
    np.testing.assert_allclose(np.asarray(tab), np.asarray(ref_tab),
                               rtol=2e-4, atol=2e-5)

    # 2. the bench chain program (K=1, salt0=0 leaves inputs unchanged,
    #    so acc IS the argmax table)
    chain = make_pixels_chain(mcfg, "vit", 1, 1, B, vit_cfg=vcfg,
                              feat_norm=True)
    _, acc = jax.jit(chain)(bb, params, jnp.asarray(images),
                            jnp.asarray(tokens), jnp.asarray(lengths),
                            jnp.int32(0))
    np.testing.assert_array_equal(
        np.asarray(acc), np.argmax(np.asarray(ref_tab), axis=-1))

    # 3. the AOT pixels artifact (feat_norm baked in + recorded in meta)
    art = str(tmp_path / "pix_art")
    export_pixels_predict(params, mcfg, "vit", bb, art, image_size=28,
                          vit_cfg=vcfg, feat_norm=True)
    import json as _json
    with open(os.path.join(art, "meta.json")) as f:
        assert _json.load(f)["backbone_feat_norm"] is True
    run = load_exported(art)
    atab, _ = run(images, tokens, lengths)
    np.testing.assert_allclose(np.asarray(atab), np.asarray(ref_tab),
                               rtol=2e-4, atol=2e-5)

    # 4. precomputed shards are RMS-normed rows
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):
        Image.fromarray(rs.randint(0, 255, (28, 28, 3)).astype(np.uint8)
                        ).save(img_dir / f"im{i}.jpg", quality=95)
    rel = scan_image_dir(str(img_dir))
    store = precompute_features(str(img_dir), rel, str(tmp_path / "shard"),
                                "vit", bb, size=28, batch_size=2,
                                dtype="float32", backend="pil",
                                vit_cfg=vcfg, feat_norm=True)
    ms = np.mean(np.asarray(store.mmap, np.float32) ** 2, axis=-1)
    np.testing.assert_allclose(ms, 1.0, atol=1e-2)
    # ... and the shard self-describes as RMS (index.json marker) so a
    # raw-trained head refuses it (data/features.check_feat_interface)
    assert store.feat_norm is True


@pytest.mark.slow
def test_trainer_featurize_gate_honors_feat_norm_without_training(tmp_path):
    """The Trainer featurize gate applies backbone_feat_norm even with
    train_backbone=False — the standalone-eval case (cmd_eval adopts the
    bit from a fine-tuned snapshot's meta but never turns training on).
    The original gate keyed on train_backbone and silently served RAW
    features to an RMS-trained head."""
    import dataclasses as dc

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture
    from rau_vqa_tpu.data.images import ImageDirSource
    from rau_vqa_tpu.data.loader import load_vqa_data
    from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
    from rau_vqa_tpu.train.trainer import Trainer

    root = str(tmp_path / "fix")
    vqa_dir = generate_fixture(root, FixtureSpec(), images=True,
                               image_size=64)
    exp = get_preset("ours_ms")
    exp = exp.replace(
        model=dc.replace(
            exp.model, n_hops=2, cnn_dim=512, cnn_w=2, cnn_h=2,
            embed_dim=16, rnn_size=16, multfeat_dim=16, attfeat_dim=8,
            att_rnn_size=16, embed_dropout=0.0, rnn_dropout=0.0),
        train=dc.replace(exp.train, batch_size=16, length_buckets=(),
                         train_backbone=False, backbone_feat_norm=True),
        data=dc.replace(exp.data, split="val2014"))
    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                         test_batch_size=8)
    src = ImageDirSource(os.path.join(root, "images"), size=64,
                         backend="pil")
    trainer = Trainer(exp, data, src, str(tmp_path / "run"),
                      backbone="vgg16",
                      bb_params=vgg16_pool5_init(jax.random.PRNGKey(3)))
    batch = data.train_data.next_batch(src)
    out = trainer._put_batch(batch)
    ms = np.mean(np.asarray(out["feats"], np.float32) ** 2, axis=-1)
    np.testing.assert_allclose(ms, 1.0, atol=1e-2)


def test_trainer_rejects_mismatched_shard_interface(tmp_path):
    """A packed shard that records the RMS interface (or raw) must match
    the head's backbone_feat_norm, or Trainer refuses at init — feeding
    the other interface passes every shape check and silently scores
    near-garbage (the one artifact kind where the mismatch was
    invisible; snapshots and export artifacts both carry the bit)."""
    import dataclasses as dc

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data.features import PackedShardWriter
    from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture
    from rau_vqa_tpu.data.loader import load_vqa_data
    from rau_vqa_tpu.train.trainer import Trainer

    spec = FixtureSpec()
    vqa_dir = generate_fixture(str(tmp_path / "fix"), spec)
    w = PackedShardWriter(str(tmp_path / "shard"), n=1,
                          spat=spec.feat_w * spec.feat_h, dim=spec.feat_dim,
                          feat_norm=True)
    w.write(0, np.zeros((1, spec.feat_w * spec.feat_h, spec.feat_dim),
                        np.float32))
    store = w.finish(["a.t7"])
    exp = get_preset("ours_ms")
    exp = exp.replace(
        model=dc.replace(
            exp.model, n_hops=2, cnn_dim=spec.feat_dim, cnn_w=spec.feat_w,
            cnn_h=spec.feat_h, embed_dim=16, rnn_size=16, multfeat_dim=16,
            attfeat_dim=8, att_rnn_size=16),
        train=dc.replace(exp.train, batch_size=16, length_buckets=()),
        data=dc.replace(exp.data, split="val2014"))
    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                         test_batch_size=8)
    with pytest.raises(ValueError, match="feat_norm"):   # RMS rows, raw head
        Trainer(exp, data, store, str(tmp_path / "run"))
    exp_rms = exp.replace(train=dc.replace(exp.train,
                                           backbone_feat_norm=True))
    Trainer(exp_rms, data, store, str(tmp_path / "run2"))  # match: fine


def test_snapshot_records_feat_norm_without_train_backbone(tmp_path):
    """save() records the interface the head actually trained on: a
    head-only run on a frozen RMS backbone (train_backbone=False,
    backbone_feat_norm=True) must self-describe as RMS — the old meta
    gated the bit on train_backbone, so standalone eval/serve adopted
    False and featurized raw."""
    import dataclasses as dc

    from rau_vqa_tpu.cli import _snapshot_meta
    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture
    from rau_vqa_tpu.data.images import ImageDirSource
    from rau_vqa_tpu.data.loader import load_vqa_data
    from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
    from rau_vqa_tpu.train.trainer import Trainer

    root = str(tmp_path / "fix")
    vqa_dir = generate_fixture(root, FixtureSpec(), images=True,
                               image_size=64)
    exp = get_preset("ours_ms")
    exp = exp.replace(
        model=dc.replace(
            exp.model, n_hops=2, cnn_dim=512, cnn_w=2, cnn_h=2,
            embed_dim=16, rnn_size=16, multfeat_dim=16, attfeat_dim=8,
            att_rnn_size=16, embed_dropout=0.0, rnn_dropout=0.0),
        train=dc.replace(exp.train, batch_size=16, length_buckets=(),
                         train_backbone=False, backbone_feat_norm=True),
        data=dc.replace(exp.data, split="val2014"))
    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                         test_batch_size=8)
    src = ImageDirSource(os.path.join(root, "images"), size=64,
                         backend="pil")
    trainer = Trainer(exp, data, src, str(tmp_path / "run"),
                      backbone="vgg16",
                      bb_params=vgg16_pool5_init(jax.random.PRNGKey(3)))
    path = trainer.save(background=False)
    meta = _snapshot_meta(path)
    assert meta["backbone_feat_norm"] is True
    assert meta["train_backbone"] is False


def test_train_adopts_feat_norm_from_backbone_sidecar(tmp_path, monkeypatch):
    """cmd_train's source helper adopts the RMS interface recorded in a
    fine-tuned --backbone-state sidecar when the user didn't pin
    --backbone-feat-norm themselves — a fresh head must train on the
    interface its frozen backbone produces (the old code only WARNED and
    trained on raw features)."""
    import argparse

    from PIL import Image

    import rau_vqa_tpu.cli as cli
    from rau_vqa_tpu.config import get_preset

    img_root = tmp_path / "imgs"
    img_root.mkdir()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(
        img_root / "a.jpg", quality=92)
    monkeypatch.setattr(cli, "_load_backbone_state",
                        lambda b, s: {"w": np.zeros(1, np.float32)})
    monkeypatch.setattr(cli, "_snapshot_meta",
                        lambda p: {"backbone_feat_norm": True,
                                   "train_backbone": True,
                                   "backbone": "vgg16"})
    import dataclasses as dc
    exp = get_preset("ours_ms")
    exp = exp.replace(model=dc.replace(exp.model, cnn_dim=512,
                                       cnn_w=2, cnn_h=2))
    args = argparse.Namespace(image_root=str(img_root), backbone="vgg16",
                              backbone_state="ft.msgpack", image_size=64,
                              fixture=False)
    _, _, _, exp2 = cli._make_source_and_backbone(args, exp,
                                                  adopt_feat_norm=True)
    assert exp2.train.backbone_feat_norm is True
    # explicit flag (adopt off): config wins, sidecar only warns
    _, _, _, exp3 = cli._make_source_and_backbone(args, exp,
                                                  adopt_feat_norm=False)
    assert exp3.train.backbone_feat_norm is False


@pytest.mark.slow
def test_zero_signal_freeze_ignores_injected_noise():
    """The freeze keys on the PRE-noise backbone gradient: with
    backbone_grad_noise=True the injected noise keeps the post-noise norm
    > 0 every step, which previously defeated the freeze entirely (Adam
    integrated pure noise + stale momentum — the measured 57 -> 12M std
    coasting pathology the freeze exists to stop)."""
    from rau_vqa_tpu.config import TrainConfig
    from rau_vqa_tpu.train.trainer import make_train_step

    mcfg, state, (tokens, lengths, images, labels) = _ft_state_and_batch()
    tcfg = TrainConfig(train_backbone=True, backbone_grad_noise=True,
                       noisy_eta=0.3, noisy_gamma=0.55)
    step = jax.jit(make_train_step(mcfg, tcfg, backbone="vit",
                                   vit_cfg=_tiny_vit()))
    # hop_scale = 0 zeroes the differentiable loss exactly: every gradient
    # is exactly zero, only the injected noise reaches Adam
    hop_scale = jnp.zeros((mcfg.n_hops,), jnp.float32)
    new_state, metrics = step(state, tokens, lengths, images, labels,
                              hop_scale, jnp.float32(1e-3),
                              jnp.float32(1e-4))
    # post-noise norm is > 0 (what the old freeze keyed on)...
    assert float(metrics["grad_norm_backbone"]) > 0
    # ...but the backbone must NOT move (no true signal)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        new_state.params["backbone"], state.params["backbone"])
    # the head groups DO integrate the noise (reference semantics:
    # NoiseGrad applies to the head; the freeze is backbone-only)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(new_state.params["embed"]),
                        jax.tree.leaves(state.params["embed"])))
    assert moved


def test_trainer_vit_cfg_threads_featurize(tmp_path):
    """A non-default ViT config rides Trainer(vit_cfg=...) through the
    featurize path — previously the kwarg existed on make_train_step but
    the Trainer never passed it, pinning every path to ViT-L/14."""
    import dataclasses as dc

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture
    from rau_vqa_tpu.data.images import ImageDirSource
    from rau_vqa_tpu.data.loader import load_vqa_data
    from rau_vqa_tpu.models.backbones.vit import vit_init
    from rau_vqa_tpu.train.trainer import Trainer

    root = str(tmp_path / "fix")
    vqa_dir = generate_fixture(root, FixtureSpec(), images=True,
                               image_size=64)
    vcfg = _tiny_vit()          # 28 px, 2x2 grid, dim 32
    exp = get_preset("ours_ms")
    exp = exp.replace(
        model=dc.replace(
            exp.model, n_hops=2, cnn_dim=vcfg.dim, cnn_w=2, cnn_h=2,
            embed_dim=16, rnn_size=16, multfeat_dim=16, attfeat_dim=8,
            att_rnn_size=16, embed_dropout=0.0, rnn_dropout=0.0),
        train=dc.replace(exp.train, batch_size=16, length_buckets=(),
                         train_backbone=False),
        data=dc.replace(exp.data, split="val2014"))
    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                         test_batch_size=8)
    src = ImageDirSource(os.path.join(root, "images"),
                         size=vcfg.image_size, backend="pil")
    trainer = Trainer(exp, data, src, str(tmp_path / "run"),
                      backbone="vit", vit_cfg=vcfg,
                      bb_params=vit_init(jax.random.PRNGKey(3), vcfg))
    batch = data.train_data.next_batch(src)
    out = trainer._put_batch(batch)
    assert tuple(out["feats"].shape) == (16, 4, vcfg.dim)
