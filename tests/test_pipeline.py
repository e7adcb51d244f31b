"""From-pixels pipeline: decode -> on-device preprocess -> backbone -> RAU."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rau_vqa_tpu.config import ModelConfig
from rau_vqa_tpu.data.images import ImageDirSource
from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
from rau_vqa_tpu.models.pipeline import answer_pixels, extract_features
from rau_vqa_tpu.models.rau import init_params


def test_image_dir_source(tmp_path):
    from PIL import Image

    rs = np.random.RandomState(0)
    for i, (w, h) in enumerate([(80, 60), (50, 90), (64, 64)]):
        arr = rs.randint(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"img{i}.jpg"))
    src = ImageDirSource(str(tmp_path), size=32)
    batch = src.get_batch(["img0.jpg", "img1.jpg", "img2.jpg"])
    assert batch.shape == (3, 32, 32, 3)
    assert batch.dtype == np.uint8


@pytest.mark.slow
def test_pixels_to_answers(tmp_path):
    cfg = ModelConfig(
        vocab_size=40, answer_size=9, seq_len=7, embed_dim=8, rnn_size=16,
        rnn_layers=2, cnn_dim=512, cnn_w=2, cnn_h=2, multfeat_dim=16,
        attfeat_dim=8, att_rnn_size=16, n_hops=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    bb = vgg16_pool5_init(jax.random.PRNGKey(1))
    rs = np.random.RandomState(0)
    B = 2
    images = jnp.asarray(rs.randint(0, 255, (B, 64, 64, 3), np.uint8))
    tokens = jnp.asarray(rs.randint(1, cfg.vocab_size, (B, cfg.seq_len)),
                         jnp.int32)
    lengths = jnp.asarray([3, 7], jnp.int32)

    feats = extract_features("vgg16", bb, images)
    assert feats.shape == (B, 4, 512)   # 64/32 = 2x2 grid

    ans, att = answer_pixels(params, bb, cfg, "vgg16", images, tokens, lengths)
    assert ans.shape == (cfg.n_hops + 2, B)
    assert att.shape == (cfg.n_hops + 2, B, 4)
    assert np.all(np.asarray(ans) >= 0) and np.all(np.asarray(ans) < 9)
    np.testing.assert_allclose(np.asarray(att[0]).sum(-1), np.ones(B),
                               rtol=1e-5)


@pytest.mark.slow
def test_trainer_from_pixels_end_to_end(tmp_path):
    """The Trainer drives training AND the eval sweep from raw JPEGs: the
    loader's image-source path decodes in the prefetch worker (native
    backend), the frozen on-device backbone computes features inline, and
    the train step consumes them — the capability behind the reference's
    unused next_batch_image path (vqa_prepro_loader.lua:1012-1068)."""
    import dataclasses

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture
    from rau_vqa_tpu.data.loader import load_gt_annotations, load_vqa_data
    from rau_vqa_tpu.train.trainer import Trainer

    spec = FixtureSpec()
    root = str(tmp_path / "fix")
    vqa_dir = generate_fixture(root, spec, images=True, image_size=64)

    exp = get_preset("ours_ms")
    exp = exp.replace(
        model=dataclasses.replace(
            # vgg16 at 64px input -> 2x2x512 pool5 grid
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
    src = ImageDirSource(os.path.join(root, "images"), size=64,
                         backend="native")
    gt = load_gt_annotations(os.path.join(vqa_dir, "gt_annotations.json"))
    bb = vgg16_pool5_init(jax.random.PRNGKey(3))
    trainer = Trainer(exp, data, src, str(tmp_path / "run"), gt_anno=gt,
                      backbone="vgg16", bb_params=bb)
    rec = trainer.train_epoch()
    assert np.isfinite(rec["loss"])
    res = trainer.evaluate(write_submissions=False)
    assert len(res["testOEacc"]) == exp.model.n_hops + 2
    assert all(np.isfinite(a) for a in res["testOEacc"])


@pytest.mark.slow
def test_trainer_from_pixels_on_mesh_matches_single(tmp_path):
    """From-pixels training/eval composes with the device mesh: uint8
    image batches shard on 'data', the inline backbone featurize runs on
    the sharded array (GSPMD), and one epoch + the eval sweep match the
    single-device run."""
    import dataclasses

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture
    from rau_vqa_tpu.data.loader import load_gt_annotations, load_vqa_data
    from rau_vqa_tpu.parallel.mesh import make_mesh
    from rau_vqa_tpu.train.trainer import Trainer

    spec = FixtureSpec()
    root = str(tmp_path / "fix")
    vqa_dir = generate_fixture(root, spec, images=True, image_size=64)

    exp = get_preset("ours_ms")
    exp = exp.replace(
        model=dataclasses.replace(
            exp.model, n_hops=2, cnn_dim=512, cnn_w=2, cnn_h=2,
            embed_dim=16, rnn_size=16, multfeat_dim=16, attfeat_dim=8,
            att_rnn_size=16, embed_dropout=0.0, rnn_dropout=0.0,
            mult_dropout=0.0),
        train=dataclasses.replace(
            exp.train, batch_size=16, noisy_eta=0.0, grad_clip=10.0,
            length_buckets=()),
        data=dataclasses.replace(exp.data, split="val2014"))
    gt = load_gt_annotations(os.path.join(vqa_dir, "gt_annotations.json"))
    bb = vgg16_pool5_init(jax.random.PRNGKey(3))

    def run(mesh, workdir):
        data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                             test_batch_size=8)
        src = ImageDirSource(os.path.join(root, "images"), size=64)
        trainer = Trainer(exp, data, src, workdir, gt_anno=gt,
                          backbone="vgg16", bb_params=bb, mesh=mesh)
        # eval FIRST (identical init params): the sharded pixels forward
        # must agree tightly — forward-only reassociation is ~1e-7
        res = trainer.evaluate(write_submissions=False)
        rec = trainer.train_epoch()
        return res["testOEacc"], rec["loss"]

    acc_ref, loss_ref = run(None, str(tmp_path / "single"))
    acc_mesh, loss_mesh = run(make_mesh(n_data=8), str(tmp_path / "mesh"))
    np.testing.assert_allclose(acc_mesh, acc_ref, rtol=1e-6, atol=1e-9)
    # an epoch of training amplifies the grad all-reduce's reassociation
    # (~1e-7/step) through adam; measured ~6e-4 after 13 steps
    np.testing.assert_allclose(loss_mesh, loss_ref, rtol=5e-3)


def test_benchparams_np_params_like_fills_structure():
    """utils/benchparams.np_params_like must reproduce the init fn's exact
    tree structure/shapes/dtypes WITHOUT running device programs, with
    BN-safe fills (var > 0) so fold_batchnorm stays finite — the benches
    (bench_pixels, bench_train pixels variant) depend on this contract."""
    import jax
    import jax.numpy as jnp

    from rau_vqa_tpu.utils.benchparams import np_params_like

    def init_fn(key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return {
            "conv": {"w": jax.random.normal(k1, (3, 3, 4, 8), dtype),
                     "b": jnp.zeros((8,), dtype)},
            "bn": {"var": jnp.ones((8,), jnp.float32),
                   "mean": jnp.zeros((8,), jnp.float32),
                   "scale": jnp.ones((8,), jnp.float32)},
            "proj": jax.random.normal(k2, (8, 2), dtype),
        }

    got = np_params_like(init_fn, 0, jnp.bfloat16)
    want = jax.eval_shape(lambda k: init_fn(k, dtype=jnp.bfloat16),
                          jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(got) == \
        jax.tree_util.tree_structure(want)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        assert g.shape == w.shape and g.dtype == w.dtype
        assert np.all(np.isfinite(np.asarray(g, np.float32)))
    assert np.all(np.asarray(got["bn"]["var"]) > 0)      # BN-fold safe
    assert abs(float(np.mean(np.asarray(got["bn"]["scale"]))) - 1.0) < 0.2
