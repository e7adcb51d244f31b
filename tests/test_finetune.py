"""Backbone fine-tuning: blockwise remat parity and the trainable-backbone
train step (the capability the reference fundamentally lacks — its features
are precomputed by a frozen Caffe/Torch extractor, data/get_*.sh; here the
backbone is a 4th parameter group and gradients flow through the pixels).
"""

import dataclasses

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


def test_remat_excludes_fused_stages():
    from rau_vqa_tpu.models.backbones.resnet import (
        fold_batchnorm,
        resnet101_apply,
        resnet101_init,
    )
    bb = fold_batchnorm(resnet101_init(jax.random.PRNGKey(0)))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match="exclusive"):
        resnet101_apply(bb, x, fused_stages=(2,), remat=True)
