"""precompute-features: raw images -> on-device backbone -> packed shard.

The reference's production protocol consumes PREcomputed per-image CNN
features (data/get_vgg16_pool5_448.sh downloads them; the extractor lives
outside the reference repo).  These tests pin the native replacement: the
shard `rau-vqa precompute-features` writes is numerically the backbone's
output and is directly consumable by PackedFeatureStore / the Trainer.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rau_vqa_tpu.data.features import PackedFeatureStore, coco_feat_name
from rau_vqa_tpu.data.images import ImageDirSource
from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
from rau_vqa_tpu.models.pipeline import extract_features
from rau_vqa_tpu.precompute import (
    precompute_features,
    scan_image_dir,
    unique_by_feat_name,
)


def _make_images(root, n=5, seed=0, split="val2014"):
    from PIL import Image

    rs = np.random.RandomState(seed)
    rel = []
    os.makedirs(os.path.join(root, split), exist_ok=True)
    for i in range(n):
        w, h = int(rs.randint(40, 90)), int(rs.randint(40, 90))
        arr = rs.randint(0, 255, (h, w, 3), np.uint8)
        p = f"{split}/COCO_{split}_{i:012d}.jpg"
        Image.fromarray(arr).save(os.path.join(root, p))
        rel.append(p)
    return rel


def test_scan_and_unique(tmp_path):
    from PIL import Image

    rel = _make_images(str(tmp_path), n=3)
    # a duplicate basename in another dir collapses to ONE feature row —
    # the store is keyed by coco_feat_name, one file per COCO image
    os.makedirs(str(tmp_path / "train2014"))
    Image.new("RGB", (50, 50)).save(
        str(tmp_path / "train2014" / "COCO_val2014_000000000000.jpg"))
    found = scan_image_dir(str(tmp_path))
    assert len(found) == 4
    names, paths = unique_by_feat_name(found)
    assert len(names) == len(paths) == 3
    assert all(n.endswith(".t7") for n in names)
    assert len(set(names)) == 3


@pytest.mark.slow   # fast-loop budget (VERDICT r4 #5); full suite runs it
def test_precompute_matches_direct(tmp_path):
    """Batched+padded precompute == one direct extract_features call, and
    the shard round-trips through PackedFeatureStore by feature name."""
    root, out = str(tmp_path / "imgs"), str(tmp_path / "shard")
    rel = _make_images(root, n=5)   # 5 images, batch 2 -> padded last batch
    bb = vgg16_pool5_init(jax.random.PRNGKey(0))
    calls = []
    store = precompute_features(
        root, rel, out, "vgg16", bb, size=32, batch_size=2,
        dtype="float32", backend="pil",
        progress=lambda done, total: calls.append((done, total)))
    assert store.spat == 1 and store.dim == 512   # 32px -> 1x1 pool5 grid
    assert calls[-1] == (5, 5)

    imgs = ImageDirSource(root, size=32).get_batch(rel)
    want = np.asarray(extract_features("vgg16", bb, jnp.asarray(imgs)))
    names = [coco_feat_name(p) for p in rel]
    got = store.get_batch(names, [1] * len(names))
    # batch-2 vs batch-5 conv reductions reassociate (~5e-5 abs on CPU)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-4)


@pytest.mark.slow   # >5 s: fast-loop budget (CLAUDE.md)
def test_precompute_int8_shard(tmp_path):
    """int8 storage: per-image symmetric scales, dequantized read within
    half a quantization step of the float features."""
    root, out = str(tmp_path / "imgs"), str(tmp_path / "shard8")
    rel = _make_images(root, n=3, seed=1)
    bb = vgg16_pool5_init(jax.random.PRNGKey(0))
    store = precompute_features(root, rel, out, "vgg16", bb, size=32,
                                batch_size=2, dtype="int8", backend="pil")
    imgs = ImageDirSource(root, size=32).get_batch(rel)
    want = np.asarray(extract_features("vgg16", bb, jnp.asarray(imgs)))
    names = [coco_feat_name(p) for p in rel]
    got = store.get_batch(names, [1] * len(names))
    step = np.abs(want).reshape(len(rel), -1).max(axis=1) / 127.0
    assert np.all(np.abs(got - want)
                  <= step[:, None, None] * 0.5 + 1e-7)


def test_shard_writer_validation(tmp_path):
    from rau_vqa_tpu.data.features import PackedShardWriter

    w = PackedShardWriter(str(tmp_path / "s"), n=2, spat=3, dim=4)
    with pytest.raises(ValueError):      # wrong [S, D]
        w.write(0, np.zeros((1, 3, 5), np.float32))
    w.write(0, np.zeros((2, 3, 4), np.float32))
    with pytest.raises(ValueError):      # names/rows mismatch
        w.finish(["a.t7"])
    store = w.finish(["a.t7", "b.t7"])
    assert store.get_batch(["b.t7"], [1]).shape == (1, 3, 4)


def test_shard_feat_norm_marker(tmp_path):
    """Packed shards record their feature interface (raw vs RMS-normalized
    backbone_feat_norm rows) so a consumer can refuse a mismatch — without
    the marker, an RMS shard feeding a raw-trained head passed every
    shape/dtype validation and silently scored near-garbage."""
    import json

    from rau_vqa_tpu.data.features import (
        PackedFeatureStore,
        PackedShardWriter,
        check_feat_interface,
    )

    w = PackedShardWriter(str(tmp_path / "rms"), n=1, spat=2, dim=3,
                          feat_norm=True)
    w.write(0, np.zeros((1, 2, 3), np.float32))
    store = w.finish(["a.t7"])
    assert store.feat_norm is True
    check_feat_interface(store, True, "t")            # match: fine
    with pytest.raises(ValueError, match="feat_norm"):
        check_feat_interface(store, False, "t")       # RMS rows, raw head

    w2 = PackedShardWriter(str(tmp_path / "raw"), n=1, spat=2, dim=3)
    w2.write(0, np.zeros((1, 2, 3), np.float32))
    assert w2.finish(["a.t7"]).feat_norm is False     # default: raw

    # legacy shard (index.json predates the marker): unknown, no check
    idx = tmp_path / "raw" / "index.json"
    meta = json.loads(idx.read_text())
    meta.pop("feat_norm")
    idx.write_text(json.dumps(meta))
    legacy = PackedFeatureStore(str(tmp_path / "raw"))
    assert legacy.feat_norm is None
    check_feat_interface(legacy, True, "t")           # no raise
    check_feat_interface(object(), True, "t")         # unmarked source types


@pytest.mark.slow   # fast-loop budget (VERDICT r4 #5); full suite runs it
def test_precompute_on_mesh_matches_single(tmp_path):
    """Mesh-sharded extraction (images on 'data', replicated backbone)
    writes the same shard as single-device precompute."""
    from rau_vqa_tpu.parallel.mesh import make_mesh

    root = str(tmp_path / "imgs")
    rel = _make_images(root, n=6, seed=2)
    bb = vgg16_pool5_init(jax.random.PRNGKey(0))
    single = precompute_features(root, rel, str(tmp_path / "s1"), "vgg16",
                                 bb, size=32, batch_size=4, backend="pil")
    mesh = make_mesh(n_data=4, n_model=1)
    sharded = precompute_features(root, rel, str(tmp_path / "s4"), "vgg16",
                                  bb, size=32, batch_size=4, backend="pil",
                                  mesh=mesh)
    names = [coco_feat_name(p) for p in rel]
    np.testing.assert_allclose(sharded.get_batch(names, [1] * 6),
                               single.get_batch(names, [1] * 6),
                               rtol=1e-5, atol=2e-4)
    with pytest.raises(ValueError):
        precompute_features(root, rel, str(tmp_path / "bad"), "vgg16", bb,
                            size=32, batch_size=3, backend="pil", mesh=mesh)


def test_cli_precompute_features(tmp_path, monkeypatch):
    from rau_vqa_tpu import cli

    root = str(tmp_path / "imgs")
    rel = _make_images(root, n=3)
    bb = vgg16_pool5_init(jax.random.PRNGKey(1))
    monkeypatch.setattr(cli, "_load_backbone_state", lambda b, s: bb)

    out = str(tmp_path / "shard")
    rc = cli.main(["precompute-features", "--image-root", root,
                   "--out", out, "--backbone", "vgg16",
                   "--size", "32", "--batch", "2", "--backend", "pil"])
    assert rc == 0
    store = PackedFeatureStore(out)
    assert len(store.index) == 3 and store.dim == 512

    # --vqa-dir enumeration: only the json's unique_img lists are computed
    import json as _json
    vqa_dir = str(tmp_path / "vqa")
    os.makedirs(vqa_dir)
    with open(os.path.join(vqa_dir, "data_prepro.json"), "w") as f:
        _json.dump({"unique_img_train": rel[:2], "unique_img_test": []}, f)
    out2 = str(tmp_path / "shard2")
    rc = cli.main(["precompute-features", "--image-root", root,
                   "--out", out2, "--backbone", "vgg16",
                   "--vqa-dir", vqa_dir,
                   "--size", "32", "--batch", "2", "--backend", "pil"])
    assert rc == 0
    assert len(PackedFeatureStore(out2).index) == 2


def test_precompute_dir_reuse_clears_stale_scales(tmp_path):
    """Re-running with a float dtype into a dir that previously held an
    int8 shard must remove scales.npy — a stale one would silently rescale
    every float read."""
    root, out = str(tmp_path / "imgs"), str(tmp_path / "shard")
    rel = _make_images(root, n=3, seed=3)
    bb = vgg16_pool5_init(jax.random.PRNGKey(0))
    precompute_features(root, rel, out, "vgg16", bb, size=32,
                        batch_size=2, dtype="int8", backend="pil")
    assert os.path.exists(os.path.join(out, "scales.npy"))
    store = precompute_features(root, rel, out, "vgg16", bb, size=32,
                                batch_size=2, dtype="float32",
                                backend="pil")
    assert not os.path.exists(os.path.join(out, "scales.npy"))
    assert store.scales is None
    imgs = ImageDirSource(root, size=32).get_batch(rel)
    want = np.asarray(extract_features("vgg16", bb, jnp.asarray(imgs)))
    names = [coco_feat_name(p) for p in rel]
    np.testing.assert_allclose(store.get_batch(names, [1] * 3), want,
                               rtol=1e-5, atol=2e-4)


def test_stall_watchdog_lifecycle():
    from rau_vqa_tpu.utils.rigcheck import StallWatchdog

    w = StallWatchdog("test", timeout_s=60)
    w.poke()
    w.cancel()
    assert w._timer is None
    off = StallWatchdog("test", timeout_s=0)   # disabled: no timer armed
    off.poke()
    assert off._timer is None
    off.cancel()


def test_cli_precompute_vit_backbone(tmp_path, monkeypatch):
    """--backbone vit loads a timm-format state dict through
    _load_backbone_state and precomputes [grid*grid, dim] features."""
    import torch

    from rau_vqa_tpu.models.backbones import vit as vit_mod

    cfg = vit_mod.ViTConfig(image_size=16, patch=4, dim=32, depth=1,
                            heads=4, mlp_ratio=2.0)
    monkeypatch.setattr(vit_mod, "VIT_L14", cfg)
    rs = np.random.RandomState(0)

    def t(*shape):
        return torch.tensor(rs.randn(*shape).astype(np.float32) * 0.05)

    state = {
        "pos_embed": t(1, cfg.seq + 1, 32),
        "patch_embed.proj.weight": t(32, 3, 4, 4),
        "patch_embed.proj.bias": t(32),
        "norm.weight": torch.ones(32), "norm.bias": torch.zeros(32),
        "blocks.0.norm1.weight": torch.ones(32),
        "blocks.0.norm1.bias": torch.zeros(32),
        "blocks.0.norm2.weight": torch.ones(32),
        "blocks.0.norm2.bias": torch.zeros(32),
        "blocks.0.attn.qkv.weight": t(96, 32),
        "blocks.0.attn.qkv.bias": t(96),
        "blocks.0.attn.proj.weight": t(32, 32),
        "blocks.0.attn.proj.bias": t(32),
        "blocks.0.mlp.fc1.weight": t(64, 32),
        "blocks.0.mlp.fc1.bias": t(64),
        "blocks.0.mlp.fc2.weight": t(32, 64),
        "blocks.0.mlp.fc2.bias": t(32),
    }
    pth = str(tmp_path / "vit.pth")
    torch.save(state, pth)

    root = str(tmp_path / "imgs")
    _make_images(root, n=3)
    from rau_vqa_tpu import cli
    out = str(tmp_path / "shard")
    rc = cli.main(["precompute-features", "--image-root", root,
                   "--out", out, "--backbone", "vit",
                   "--backbone-state", pth,
                   "--size", "16", "--batch", "2", "--backend", "pil"])
    assert rc == 0
    store = PackedFeatureStore(out)
    assert len(store.index) == 3
    assert (store.spat, store.dim) == (cfg.seq, cfg.dim)
    feats = store.get_batch(list(store.index), [1] * 3)
    assert np.isfinite(feats).all()

    with pytest.raises(SystemExit):   # vit input side is fixed by pos embed
        cli.main(["precompute-features", "--image-root", root,
                  "--out", str(tmp_path / "bad"), "--backbone", "vit",
                  "--backbone-state", pth,
                  "--size", "448", "--batch", "2", "--backend", "pil"])


@pytest.mark.slow
def test_trainer_from_precomputed_shard(tmp_path):
    """The full loop the reference's protocol implies: raw fixture JPEGs ->
    precompute-features -> train + eval from the packed shard (--feat-dir),
    and the features the Trainer consumes equal the from-pixels path's."""
    import dataclasses

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture
    from rau_vqa_tpu.data.loader import load_gt_annotations, load_vqa_data
    from rau_vqa_tpu.train.trainer import Trainer

    spec = FixtureSpec()
    root = str(tmp_path / "fix")
    vqa_dir = generate_fixture(root, spec, images=True, image_size=64)
    image_root = os.path.join(root, "images")

    bb = vgg16_pool5_init(jax.random.PRNGKey(3))
    store = precompute_features(
        image_root, scan_image_dir(image_root), str(tmp_path / "shard"),
        "vgg16", bb, size=64, batch_size=16, backend="pil")
    assert (store.spat, store.dim) == (4, 512)   # 64px -> 2x2 pool5 grid

    exp = get_preset("ours_ms")
    exp = exp.replace(
        model=dataclasses.replace(
            exp.model, n_hops=2, cnn_dim=512, cnn_w=2, cnn_h=2,
            embed_dim=16, rnn_size=16, multfeat_dim=16, attfeat_dim=8,
            att_rnn_size=16, embed_dropout=0.0, rnn_dropout=0.0,
            mult_dropout=0.1),
        train=dataclasses.replace(
            exp.train, batch_size=16, noisy_eta=0.0, grad_clip=10.0,
            length_buckets=()),
        data=dataclasses.replace(exp.data, split="val2014"))
    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                         test_batch_size=8)
    gt = load_gt_annotations(os.path.join(vqa_dir, "gt_annotations.json"))
    trainer = Trainer(exp, data, store, str(tmp_path / "run"), gt_anno=gt)
    rec = trainer.train_epoch()
    assert np.isfinite(rec["loss"])
    res = trainer.evaluate(write_submissions=False)
    assert len(res["testOEacc"]) == exp.model.n_hops + 2
    assert all(np.isfinite(a) for a in res["testOEacc"])


@pytest.mark.slow
def test_precompute_folded_resnet_tree(tmp_path):
    """precompute-features with the FOLDED resnet tree — the exact shape
    the CLI builds (cli._load_backbone_state folds for serving speed).
    The extract fn takes the tree as a jit ARGUMENT; a flag leaf in the
    fold output used to crash tracing (TracerBoolConversionError)."""
    import jax.numpy as jnp

    from rau_vqa_tpu.models.backbones.resnet import (
        fold_batchnorm,
        resnet101_init,
    )
    from rau_vqa_tpu.models.pipeline import extract_features
    from rau_vqa_tpu.precompute import precompute_features

    root = str(tmp_path / "imgs")
    rel = _make_images(root, n=3)
    bb = fold_batchnorm(resnet101_init(jax.random.PRNGKey(0)))
    store = precompute_features(root, rel, str(tmp_path / "out"),
                                "resnet101", bb, size=64, batch_size=2,
                                backend="pil")
    from rau_vqa_tpu.data.images import ImageDirSource

    imgs = ImageDirSource(root, size=64, backend="pil").get_batch(rel)
    want = np.asarray(extract_features("resnet101", bb, jnp.asarray(imgs)))
    from rau_vqa_tpu.data.features import coco_feat_name

    got = store.get_batch([coco_feat_name(p) for p in rel], [1, 1, 1])
    # random-init resnet activations reach ~1e5 here; batch-split vs
    # one-shot reassociation leaves tiny absolute residue near zeros
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1.0)


def test_device_int8_quantization_bit_identical_to_writer(tmp_path):
    """precompute's on-device int8 quantization (quantize_feats_device)
    must produce EXACTLY the bytes + scales PackedShardWriter.write's
    host math produces — it exists so only int8 crosses the device->host
    link, and any drift would silently change every int8 shard."""
    import jax.numpy as jnp

    from rau_vqa_tpu.data.features import PackedShardWriter
    from rau_vqa_tpu.precompute import quantize_feats_device

    rs = np.random.RandomState(7)
    feats = (rs.randn(6, 9, 16) *
             rs.uniform(0.05, 40.0, (6, 1, 1))).astype(np.float32)
    feats[3] = 0.0                       # absmax==0 -> scale-1.0 branch
    feats[4, 0, 0] = np.float32(127.5)   # a rint tie at the clip edge
    feats[4, 0, 1] = -np.float32(126.5)  # ties-to-even on both signs

    w = PackedShardWriter(str(tmp_path / "host"), 6, 9, 16, dtype="int8")
    w.write(0, feats)
    host_q = np.array(w.arr)
    host_s = np.array(w.scales)

    q, s = quantize_feats_device(jnp.asarray(feats))
    np.testing.assert_array_equal(np.asarray(q), host_q)
    np.testing.assert_array_equal(np.asarray(s), host_s)


def test_precompute_int8_end_to_end(tmp_path):
    """int8 precompute (device-quantized path) round-trips: the store
    dequantizes to within one quantization step of the backbone's f32
    features, and scales.npy exists."""
    import os

    import jax

    from rau_vqa_tpu.data.features import coco_feat_name
    from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
    from rau_vqa_tpu.precompute import precompute_features

    root = str(tmp_path / "imgs")
    rel = _make_images(root, n=3)
    bb = vgg16_pool5_init(jax.random.PRNGKey(0))
    out = str(tmp_path / "out_i8")
    store = precompute_features(root, rel, out, "vgg16", bb, size=64,
                                batch_size=2, dtype="int8", backend="pil")
    assert os.path.exists(os.path.join(out, "scales.npy"))
    got = store.get_batch([coco_feat_name(p) for p in rel], [1, 1, 1])
    from rau_vqa_tpu.data.features import QuantFeats
    if isinstance(got, QuantFeats):
        got = got.dequantize()
    got = np.asarray(got)
    import jax.numpy as jnp

    from rau_vqa_tpu.data.images import ImageDirSource
    from rau_vqa_tpu.models.pipeline import extract_features
    imgs = ImageDirSource(root, size=64, backend="pil").get_batch(rel)
    want = np.asarray(extract_features("vgg16", bb, jnp.asarray(imgs)))
    # within one int8 quantization step per image
    step = np.abs(want).reshape(len(rel), -1).max(axis=1) / 127.0
    assert np.all(np.abs(got - want) <= step[:, None, None] * 0.51 + 1e-7)
