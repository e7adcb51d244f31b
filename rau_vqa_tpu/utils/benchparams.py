"""Host-side random parameter trees for throughput benches.

``jax.random`` initialization of a full backbone runs ~60 tiny device
programs through the TPU tunnel (~5 min of remote compiles measured —
BASELINE.md).  Throughput does not depend on weight VALUES, so the
benches fill the init fn's exact structure with numpy and ship the tree
once with ``jax.device_put``.  BN-ish leaves get well-conditioned values
(var > 0, scale ~ 1) so folded/quantized transforms stay finite.

Shared by bench_pixels.py and scripts/bench_train.py (the from-pixels
training variant) so the two benches measure the identical tree shape.
"""

from __future__ import annotations

import numpy as np


def np_params_like(init_fn, seed: int, dtype):
    """Random host params with ``init_fn(key, dtype=dtype)``'s structure.

    ``init_fn`` is only traced (``jax.eval_shape``) — no device program
    runs.  Leaves named ``var``/``scale``/``mean``/``offset``/``b`` get
    BN-safe fills; everything else is small gaussian.
    """
    import jax

    shapes = jax.eval_shape(lambda k: init_fn(k, dtype=dtype),
                            jax.random.PRNGKey(seed))
    rs = np.random.RandomState(seed)

    def fill(path, s):
        name = getattr(path[-1], "key", None)
        if name == "var":
            arr = rs.uniform(0.5, 1.5, s.shape)
        elif name == "scale":
            arr = 1.0 + 0.1 * rs.standard_normal(s.shape)
        elif name in ("mean", "offset", "b"):
            arr = 0.1 * rs.standard_normal(s.shape)
        else:
            arr = 0.05 * rs.standard_normal(s.shape)
        return arr.astype(np.dtype(s.dtype))

    return jax.tree_util.tree_map_with_path(fill, shapes)


def random_backbone(backbone: str, seed: int, dtype, fold_bn: bool = True):
    """(host_params, image_size) for a named backbone at bench dtype.

    resnet101 is returned BN-FOLDED by default (the production serving
    tree — models/backbones/resnet.fold_batchnorm); note fold_batchnorm
    returns device arrays, vgg/vit trees stay host-side until the caller
    ``device_put``s them.
    """
    if backbone == "resnet101":
        from rau_vqa_tpu.models.backbones.resnet import (
            fold_batchnorm,
            resnet101_init,
        )
        bb = np_params_like(resnet101_init, seed, dtype)
        if fold_bn:
            bb = fold_batchnorm(bb)
        return bb, 448
    if backbone == "vgg16":
        from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
        return np_params_like(vgg16_pool5_init, seed, dtype), 448
    if backbone == "vit":
        from rau_vqa_tpu.models.backbones.vit import VIT_L14, vit_init
        bb = np_params_like(
            lambda k, dtype: vit_init(k, VIT_L14, dtype=dtype), seed, dtype)
        return bb, VIT_L14.image_size
    raise ValueError(f"unknown backbone {backbone!r}")
