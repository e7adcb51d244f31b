"""On-TPU CNN-feature precomputation: raw images -> packed feature shards.

The reference's production protocol trains and evaluates from PREcomputed
per-image CNN features: data/get_vgg16_pool5_448.sh and
data/get_resnet_101_448.sh download feature tarballs extracted offline
(the extraction code lives outside the reference repo entirely), and
vqa_prepro_loader.lua:874-958 then reads one .t7 file per image.  This
module closes that loop natively: decode JPEGs on the host (the C++
libjpeg pool), run the backbone batched on the TPU, and stream the
[S, D] feature maps straight into the packed mmap shard format that
``PackedFeatureStore``/``rau-vqa train --feat-dir`` consume — so a user
with only raw COCO images can produce the feature store the whole
question-path stack (measured ~145k q/s serving) is built on.

Overlap structure: a one-ahead decode prefetch (host) runs concurrently
with the backbone dispatch (device); the final partial batch is padded to
the static batch size so ONE compiled program serves the whole sweep.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from rau_vqa_tpu.data.features import (
    PackedFeatureStore,
    PackedShardWriter,
    coco_feat_name,
)
from rau_vqa_tpu.data.images import ImageDirSource

IMAGE_EXTS = (".jpg", ".jpeg", ".png")


def quantize_feats_device(feats):
    """Device-side mirror of ``PackedShardWriter.write``'s int8 math:
    per-image symmetric absmax -> divide -> rint (ties-to-even) -> clip.
    Bit-identical to the host path (max is exact; the divide and rint are
    the same IEEE ops) — pinned by tests/test_precompute.py — so only
    int8 bytes + one f32 scale per image cross the device->host link."""
    import jax.numpy as jnp

    feats = feats.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(feats.reshape(feats.shape[0], -1)), axis=1)
    s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.rint(feats / s[:, None, None]),
                 -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def scan_image_dir(root: str) -> List[str]:
    """All image files under ``root`` as sorted root-relative paths."""
    rel = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn.lower().endswith(IMAGE_EXTS):
                rel.append(os.path.relpath(os.path.join(dirpath, fn), root))
    return sorted(rel)


def unique_by_feat_name(rel_paths: Sequence[str]
                        ) -> Tuple[List[str], List[str]]:
    """(feature names, image rel paths), first occurrence per name.

    The store is keyed by ``coco_feat_name`` (basename + .t7) because that
    is the name the h5/json contract derives for every question
    (vqa_prepro_loader.lua:866-871) — duplicate basenames across
    subdirectories collapse to one row, matching the reference's one
    feature file per COCO image."""
    names, paths, seen = [], [], set()
    for p in rel_paths:
        name = coco_feat_name(p)
        if name not in seen:
            seen.add(name)
            names.append(name)
            paths.append(p)
    return names, paths


def precompute_features(image_root: str, rel_paths: Sequence[str],
                        out_dir: str, backbone: str, bb_params: Dict, *,
                        size: int = 448, batch_size: int = 64,
                        dtype: str = "float32", backend: str = "native",
                        compute_dtype: Optional[str] = None,
                        vit_cfg=None, mesh=None, feat_norm: bool = False,
                        progress: Optional[Callable[[int, int], None]] = None,
                        ) -> PackedFeatureStore:
    """Run ``backbone`` over every unique image and write a packed shard.

    ``dtype`` is the STORAGE dtype (float32/float16/int8 — int8 gets
    per-image symmetric scales, exactly like ``pack_feature_dir``);
    ``compute_dtype`` optionally casts the backbone params (e.g.
    'bfloat16', the measured serving configuration) while the stored
    features stay float32-accumulated.  With a ``mesh``, the image batch
    shards over the 'data' axis (replicated backbone — the same layout as
    sharded from-pixels serving), so extraction scales across chips;
    ``batch_size`` must divide by the data-axis size."""
    import jax
    import jax.numpy as jnp

    from rau_vqa_tpu.models.pipeline import extract_features

    names, paths = unique_by_feat_name(rel_paths)
    if not names:
        raise ValueError("no images to precompute features for")
    src = ImageDirSource(image_root, size=size, backend=backend)
    if compute_dtype is not None:
        cdt = jnp.dtype(compute_dtype)
        bb_params = jax.tree.map(
            lambda a: a.astype(cdt)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            bb_params)

    # Storage-dtype conversion happens ON DEVICE: the [B, S, D] feature
    # download is the dominant traffic of this sweep ([64, 196, 2048] f32
    # ≈ 103 MB/batch device->host; ~0.8 GB for 512 images on this rig's
    # tunnel).  f32->f16 is the same IEEE round-to-nearest either side of
    # the link (measured 15.1 vs 4.8-6.6 img/s); int8 mirrors
    # PackedShardWriter.write's host math exactly (absmax max is exact,
    # divide + rint ties-to-even are the same IEEE ops — bit-identity
    # pinned by tests/test_precompute.py) for a 4x smaller download.
    out_dt = jnp.float16 if dtype == "float16" else jnp.float32
    quant8 = dtype == "int8"

    def _extract(bb, images_u8):
        # feat_norm: the RMS-normalized interface of a fine-tuned snapshot
        # (TrainConfig.backbone_feat_norm) — shards must match the head
        feats = extract_features(backbone, bb, images_u8, vit_cfg=vit_cfg,
                                 feat_norm=feat_norm)
        if quant8:
            return quantize_feats_device(feats)
        return feats.astype(jnp.float32).astype(out_dt)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = mesh.shape["data"]
        if batch_size % n_data:
            raise ValueError(
                f"batch_size {batch_size} must divide by the mesh's "
                f"data axis ({n_data})")
        # stage the backbone ONCE (replicated): numpy jit args re-upload
        # through the tunnel on EVERY dispatch (the serve/bench lesson,
        # CLAUDE.md dtype discipline)
        bb_params = jax.device_put(bb_params, NamedSharding(mesh, P()))
        out_sh = ((NamedSharding(mesh, P("data", None, None)),
                   NamedSharding(mesh, P("data"))) if quant8 else
                  NamedSharding(mesh, P("data", None, None)))
        extract = jax.jit(
            _extract,
            in_shardings=(NamedSharding(mesh, P()),
                          NamedSharding(mesh, P("data", None, None, None))),
            out_shardings=out_sh)
    else:
        bb_params = jax.device_put(bb_params)   # once, not per dispatch
        extract = jax.jit(_extract)

    chunks = [paths[i:i + batch_size] for i in range(0, len(paths),
                                                     batch_size)]

    def load(chunk: List[str]) -> np.ndarray:
        # pad to the static batch so one compiled program serves every step
        return src.get_batch(chunk + [chunk[-1]] * (batch_size - len(chunk)))

    pool = ThreadPoolExecutor(max_workers=1)
    try:
        fut = pool.submit(load, chunks[0])
        writer = None
        row = 0
        for ci, chunk in enumerate(chunks):
            images = fut.result()
            if ci + 1 < len(chunks):
                fut = pool.submit(load, chunks[ci + 1])
            out = extract(bb_params, jnp.asarray(images))
            if quant8:
                feats = np.asarray(out[0])[:len(chunk)]
                scales = np.asarray(out[1])[:len(chunk)]
            else:
                feats = np.asarray(out)[:len(chunk)]
            if writer is None:
                writer = PackedShardWriter(out_dir, len(paths),
                                           feats.shape[1], feats.shape[2],
                                           dtype=dtype,
                                           feat_norm=feat_norm)
            if quant8:
                writer.write_quantized(row, feats, scales)
            else:
                writer.write(row, feats)
            row += len(chunk)
            if progress is not None:
                progress(row, len(paths))
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
    return writer.finish(names)
