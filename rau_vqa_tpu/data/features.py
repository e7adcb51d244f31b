"""Image-feature storage for precomputed CNN features.

The reference loads one Torch ``.t7`` file per image per batch inside a
prefetch thread (utils/vqa_prepro_loader.lua:874-958) — thousands of small
file opens + deserializations per epoch, SURVEY.md hot-loop #3.  The TPU-first
replacement is a *packed* store: all features of a split in one contiguous
mmap-able array plus a name index, so a batch fetch is a single vectorized
gather from the OS page cache.

Feature layout is ``[S, D]`` per image (spatial-major, feature dim in lanes)
— the transpose of the reference's ``[D, w, h]`` — so every 1x1-conv in the
model is a lane-aligned MXU matmul.

Two sources, one interface:
- ``T7DirFeatureSource``  — parity path, reads the reference's per-image .t7
  files (dir layout from data/get_vgg16_pool5_448.sh).
- ``PackedFeatureStore``  — production path over packed shards written by
  ``pack_feature_dir``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Sequence

import numpy as np

from rau_vqa_tpu.data import t7


def coco_feat_name(img_path: str) -> str:
    """'val2014/COCO_val2014_000000533942.jpg' -> 'COCO_val2014_000000533942.t7'

    (name derivation at vqa_prepro_loader.lua:866-871; COCO_%s_%012d format
    documented at utils/qa_utils.lua:8-16)."""
    base = os.path.basename(img_path)
    stem, _ = os.path.splitext(base)
    return stem + ".t7"


class FeatureSource:
    """Interface: fetch a batch of per-image features as [B, S, D]."""

    dim: int
    spat: int

    def get_batch(self, names: Sequence[str], datatypes: Sequence[int]) -> np.ndarray:
        raise NotImplementedError


class T7DirFeatureSource(FeatureSource):
    """Reads per-image .t7 feature files (reference parity path).

    ``dirs`` maps the 1-based ``datatype`` index from the h5 to a feature
    directory (the reference indexes tab_featpaths by datatype,
    vqa_prepro_loader.lua:876)."""

    def __init__(self, dirs: Sequence[str], dim: int, w: int, h: int):
        self.dirs = list(dirs)
        self.dim = dim
        self.w = w
        self.h = h
        self.spat = w * h

    def _load_one(self, path: str) -> np.ndarray:
        feat = t7.load_t7(path)
        if not isinstance(feat, np.ndarray):
            raise ValueError(f"{path}: expected a tensor, got {type(feat)}")
        if self.spat > 1:
            if feat.shape != (self.dim, self.w, self.h):
                raise ValueError(
                    f"{path}: feature shape {feat.shape} != "
                    f"({self.dim}, {self.w}, {self.h})")
            # [D, w, h] -> [S, D] with s = w_idx * h + h_idx (row-major,
            # matching the reference's Reshape(D, S))
            return feat.reshape(self.dim, self.spat).T.astype(np.float32)
        if feat.size != self.dim:
            raise ValueError(f"{path}: flat feature size {feat.size} != {self.dim}")
        return feat.reshape(1, self.dim).astype(np.float32)

    def get_batch(self, names: Sequence[str], datatypes: Sequence[int]) -> np.ndarray:
        out = np.empty((len(names), self.spat, self.dim), np.float32)
        for i, (name, dt) in enumerate(zip(names, datatypes)):
            if not 1 <= dt <= len(self.dirs):
                # the h5 contract is 1-based (reference tab_featpaths
                # indexing, :876); dt=0 would silently wrap to dirs[-1]
                raise ValueError(
                    f"datatype {dt} out of range for {len(self.dirs)} "
                    f"feature dir(s) — datatypes are 1-based")
            out[i] = self._load_one(os.path.join(self.dirs[dt - 1], name))
        return out


class QuantFeats:
    """A quantized feature batch kept in its storage dtype: ``values``
    int8 [B, S, D] plus per-image ``scales`` [B].  Shipping this to the
    device and dequantizing there cuts host->device feature bytes 4x vs
    f32 (2x vs bf16) — the dominant per-step cost on PCIe-light hosts
    (BASELINE.md tunnel-bound observation).

    Deliberately NOT a NamedTuple: ``get_batch(...)[0]`` on a raw_int8
    store must raise, not silently hand back int8 values without their
    scales (a consumer that wants floats calls :meth:`dequantize`)."""

    __slots__ = ("values", "scales")

    def __init__(self, values: np.ndarray, scales: np.ndarray):
        self.values = values
        self.scales = scales

    def dequantize(self) -> np.ndarray:
        return (self.values.astype(np.float32)
                * self.scales[:, None, None].astype(np.float32))


class PackedFeatureStore(FeatureSource):
    """mmap-backed packed feature shard: `features.npy` [N, S, D] +
    `index.json` mapping feature-file name -> row.  int8 shards carry a
    per-image `scales.npy` (symmetric absmax quantization, 4x less feature
    bandwidth); reads return dequantized float32 by default, or the raw
    ``QuantFeats`` when ``raw_int8=True`` (device-side dequantization)."""

    def __init__(self, shard_dir: str, *, raw_int8: bool = False):
        self.shard_dir = shard_dir
        with open(os.path.join(shard_dir, "index.json")) as f:
            meta = json.load(f)
        self.index: Dict[str, int] = meta["index"]
        self.dim = int(meta["dim"])
        self.spat = int(meta["spat"])
        self._store_dtype = np.dtype(meta.get("dtype", "float32"))
        # feature-interface marker (see PackedShardWriter): True/False for
        # shards written since the marker existed, None for legacy shards
        # (unknown — consumers skip the mismatch check)
        fn = meta.get("feat_norm")
        self.feat_norm = None if fn is None else bool(fn)
        self.mmap = np.lib.format.open_memmap(
            os.path.join(shard_dir, "features.npy"), mode="r")
        n = len(self.index)
        if self.mmap.shape != (n, self.spat, self.dim):
            raise ValueError(
                f"packed shard shape {self.mmap.shape} != ({n}, {self.spat}, {self.dim})")
        if self.mmap.dtype != self._store_dtype:
            # a half-repacked dir (index says int8, features.npy float32)
            # would otherwise dequantize already-float values silently
            raise ValueError(
                f"packed shard dtype mismatch: index.json says "
                f"{self._store_dtype}, features.npy is {self.mmap.dtype}")
        self.scales = None
        scales_path = os.path.join(shard_dir, "scales.npy")
        if os.path.exists(scales_path):
            self.scales = np.load(scales_path)
        if raw_int8 and self.scales is None:
            # the user asked for 4x-smaller host->device transfers; on this
            # tunnel-bound rig silently shipping full-width floats instead
            # would be a large invisible perf regression
            import warnings
            warnings.warn(
                f"raw_int8 requested but {shard_dir} has no scales.npy "
                f"(dtype {self._store_dtype}): shipping "
                f"{self._store_dtype} features instead — repack with "
                f"--dtype int8 to get int8 shipping", stacklevel=2)
        self.raw_int8 = bool(raw_int8 and self.scales is not None)

    def get_batch(self, names: Sequence[str], datatypes: Sequence[int]):
        rows = np.fromiter((self.index[n] for n in names), np.int64, len(names))
        if self.raw_int8:
            return QuantFeats(values=np.asarray(self.mmap[rows]),
                              scales=np.asarray(self.scales[rows],
                                                np.float32))
        out = np.asarray(self.mmap[rows], np.float32)
        if self.scales is not None:
            out *= self.scales[rows][:, None, None]
        return out


class PackedShardWriter:
    """Streams float32 feature blocks into a packed shard dir.

    One quantization/layout definition shared by every shard producer
    (``pack_feature_dir`` repacking .t7 files, ``precompute.py`` running a
    backbone on-TPU): ``write`` takes float32 ``[b, S, D]`` blocks at a row
    offset, ``finish`` flushes + writes ``index.json`` (and ``scales.npy``
    for int8 shards) and returns the readable store."""

    def __init__(self, out_dir: str, n: int, spat: int, dim: int,
                 dtype: str = "float32", feat_norm: bool = False):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        # feature-interface marker: True when the rows were extracted
        # through the RMS-normalized interface (TrainConfig
        # .backbone_feat_norm).  Recorded in index.json so a consumer can
        # refuse to feed RMS rows to a raw-trained head (or vice versa) —
        # snapshots and export artifacts both carry this bit; without it
        # shards were the one artifact where the mismatch was invisible.
        self.feat_norm = bool(feat_norm)
        self.dtype = str(np.dtype(dtype))
        self.quantize = self.dtype == "int8"
        self.n, self.spat, self.dim = int(n), int(spat), int(dim)
        self.arr = np.lib.format.open_memmap(
            os.path.join(out_dir, "features.npy"), mode="w+",
            dtype=np.dtype(dtype), shape=(self.n, self.spat, self.dim))
        self.scales = (np.ones((self.n,), np.float32)
                       if self.quantize else None)

    def write(self, start: int, block: np.ndarray) -> None:
        if block.shape[1:] != (self.spat, self.dim):
            raise ValueError(
                f"feature block shape {block.shape[1:]} != "
                f"({self.spat}, {self.dim})")
        if self.quantize:
            # symmetric per-image absmax quantization
            absmax = np.abs(block).reshape(block.shape[0], -1).max(axis=1)
            s = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
            self.scales[start:start + len(block)] = s
            block = np.clip(np.rint(block / s[:, None, None]), -127, 127)
        self.arr[start:start + len(block)] = block

    def write_quantized(self, start: int, block_i8: np.ndarray,
                        scales: np.ndarray) -> None:
        """Pre-quantized int8 blocks + per-image scales — the device-side
        mirror of ``write``'s quantization (precompute.py runs absmax /
        divide / rint / clip ON DEVICE so only int8 bytes cross the link;
        max is exact and the divide + rint ties-to-even are the same IEEE
        ops, so the two paths are bit-identical — pinned by test)."""
        if not self.quantize:
            raise ValueError("write_quantized needs an int8 shard writer")
        if block_i8.dtype != np.int8:
            raise ValueError(f"expected int8 block, got {block_i8.dtype}")
        if block_i8.shape[1:] != (self.spat, self.dim):
            raise ValueError(
                f"feature block shape {block_i8.shape[1:]} != "
                f"({self.spat}, {self.dim})")
        if len(scales) != len(block_i8):
            raise ValueError(f"{len(scales)} scales for {len(block_i8)} rows")
        self.scales[start:start + len(block_i8)] = scales
        self.arr[start:start + len(block_i8)] = block_i8

    def finish(self, names: Sequence[str]) -> "PackedFeatureStore":
        if len(names) != self.n:
            raise ValueError(f"{len(names)} names for {self.n} rows")
        self.arr.flush()
        scales_path = os.path.join(self.out_dir, "scales.npy")
        if self.quantize:
            np.save(scales_path, self.scales)
        elif os.path.exists(scales_path):
            # reused output dir from an earlier int8 run: a stale
            # scales.npy would silently rescale every float read
            os.unlink(scales_path)
        with open(os.path.join(self.out_dir, "index.json"), "w") as f:
            json.dump({"index": {n: i for i, n in enumerate(names)},
                       "dim": self.dim, "spat": self.spat,
                       "dtype": self.dtype,
                       "feat_norm": self.feat_norm}, f)
        return PackedFeatureStore(self.out_dir)


def check_feat_interface(source, expected: bool, where: str) -> None:
    """Refuse an RMS-normalized feature source feeding a raw-trained head
    (or the reverse) — the features would be off-distribution and score
    near-garbage while passing every shape/dtype validation.

    ``source.feat_norm`` is True/False for marker-carrying packed shards
    (PackedShardWriter records it), and None/absent for legacy shards and
    .t7 sources (raw by construction but unmarked — no check possible)."""
    marker = getattr(source, "feat_norm", None)
    if marker is None or bool(marker) == bool(expected):
        return
    loc = getattr(source, "shard_dir", source.__class__.__name__)
    raise ValueError(
        f"{where}: feature source {loc} records "
        f"feat_norm={bool(marker)} but the head expects the "
        f"{'RMS-normalized' if expected else 'raw'} feature interface "
        f"(backbone_feat_norm={bool(expected)}) — re-run "
        f"`rau-vqa precompute-features` with the matching backbone "
        f"snapshot, or evaluate a head trained on this interface")


def pack_feature_dir(src_dirs: Sequence[str], img_paths: Sequence[str],
                     datatypes_by_img: Sequence[int], out_dir: str,
                     dim: int, w: int, h: int,
                     dtype: str = "float32") -> PackedFeatureStore:
    """Convert per-image .t7 features into one packed mmap shard.

    ``img_paths``/``datatypes_by_img`` enumerate the unique images of a split
    (json ``unique_img_*`` lists) with their source-directory index."""
    src = T7DirFeatureSource(src_dirs, dim, w, h)
    names, dts, seen = [], [], set()
    for p, dt in zip(img_paths, datatypes_by_img):
        name = coco_feat_name(p)
        if name not in seen:
            seen.add(name)
            names.append(name)
            dts.append(dt)
    writer = PackedShardWriter(out_dir, len(names), w * h, dim, dtype=dtype)
    chunk = 256
    for i in range(0, len(names), chunk):
        writer.write(i, src.get_batch(names[i:i + chunk], dts[i:i + chunk]))
    return writer.finish(names)
