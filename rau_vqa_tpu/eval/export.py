"""AOT serving artifacts: the predict program as serialized StableHLO.

The reference "deploys" by shipping Torch snapshot .t7 files that need the
entire Lua/Torch stack (plus the model-definition source) at serving time
(reference Eval.lua:113-130 rebuilds the graph, then loads flat vectors).
The TPU-native equivalent is ahead-of-time export via ``jax.export``: the
jitted nHop+2 predict step is serialized to StableHLO with the trained
parameters baked in as constants, producing a self-contained artifact
directory.  Any JAX runtime — CPU or TPU, with no model code, no config
system, not even this package — can ``jax.export.deserialize`` and call
it.  This is the XLA-idiomatic deployment story: the compiler contract
(StableHLO) is the interchange format, not the framework's object graph.

Layout of an artifact directory:

    meta.json                 version, ladder, shapes, dtype contract,
                              model_config (provenance), extra metadata
    predict_T{T:02d}.shlo     one program per token-length bucket

The batch axis is SYMBOLIC (one program serves any batch size >= 1); the
token axis is concrete per bucket because the encoder's ``lax.scan``
length must be static.  Bucket dispatch at call time mirrors the eval
path: truncating the token axis to any T >= the batch's max length is
exact (models/rau.py encode_question last-token gather), so artifacts
reproduce the full-length program's answers bit-for-bit on each bucket's
own domain.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

EXPORT_VERSION = 3      # this runtime understands versions <= 3
# per-kind artifact versions: questions-path artifacts keep version 1 so
# pre-'kind' runtimes still load them; pixels artifacts write 2 so such a
# runtime REJECTS them with its 'artifact newer than runtime' error
# instead of calling a 3-operand program with the wrong convention; the
# bench-chain kinds (params as OPERANDS, not baked) are version 3
_KIND_VERSION = {"predict": 1, "pixels_predict": 2,
                 "serve_chain": 3, "pixels_chain": 3}
_META = "meta.json"


def _code_rev() -> str:
    """Repo git revision (or "unknown" outside a checkout).  Chain
    artifacts pin this: shapes/model_config can't see a SOURCE change to
    the traced program (the round-4 ViT attention fix changed the math
    with identical config), and artifact dirs persist across commits."""
    import subprocess
    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or "unknown"
    except Exception:  # noqa: BLE001 — no git / not a checkout
        return "unknown"


def export_predict(params, cfg, out_dir: str, *,
                   buckets: Sequence[int] = (),
                   platforms: Sequence[str] = ("cpu", "tpu"),
                   extra_meta: Optional[Dict] = None) -> Dict[str, str]:
    """Export the predict program (params baked in) to ``out_dir``.

    Returns {bucket_T: artifact_path}.  ``buckets`` follows the eval
    ladder semantics (eval/predict.py make_predict_step); the full
    ``cfg.seq_len`` program is always included.  ``platforms`` defaults to
    cpu+tpu so one artifact serves either runtime.
    """
    import jax
    from jax import export as jexport

    from rau_vqa_tpu.eval.predict import bucket_ladder, predict

    os.makedirs(out_dir, exist_ok=True)
    ladder = bucket_ladder(cfg.seq_len, buckets)
    B = jexport.symbolic_shape("b")[0]
    paths = {}
    for T in ladder:
        fn = jax.jit(lambda t, l, f: predict(params, cfg, t, l, f))
        exp = jexport.export(fn, platforms=tuple(platforms))(
            jax.ShapeDtypeStruct((B, T), jax.numpy.int32),
            jax.ShapeDtypeStruct((B,), jax.numpy.int32),
            jax.ShapeDtypeStruct((B, cfg.cnn_spat, cfg.cnn_dim),
                                 jax.numpy.float32))
        path = os.path.join(out_dir, f"predict_T{T:02d}.shlo")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        paths[T] = path
    meta = {
        "format": "rau_vqa_tpu.export", "version": _KIND_VERSION["predict"],
        "kind": "predict",
        "ladder": ladder, "platforms": list(platforms),
        "inputs": {
            "tokens": ["b", "T"], "lengths": ["b"],
            "feats": ["b", int(cfg.cnn_spat), int(cfg.cnn_dim)],
        },
        "outputs": {
            "tab_pred": [int(cfg.n_hops) + 2, "b", int(cfg.answer_size)],
            "tab_att": [int(cfg.n_hops) + 2, "b", int(cfg.cnn_spat)],
        },
        "token_contract": "0 = ZEROPAD, answers 0-based (data/loader.py)",
        "model_config": dataclasses.asdict(cfg),
        **(extra_meta or {}),
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return paths


def export_pixels_predict(params, cfg, backbone: str, bb_params,
                          out_dir: str, *, image_size: int = 448,
                          buckets: Sequence[int] = (),
                          platforms: Sequence[str] = ("cpu", "tpu"),
                          vit_cfg=None, feat_norm: bool = False,
                          extra_meta: Optional[Dict] = None
                          ) -> Dict[int, str]:
    """Export the FULL from-pixels program: uint8 images + tokens ->
    answers, preprocess + backbone + RAU in one StableHLO artifact with
    both parameter sets baked in (the deployment form of
    models/pipeline.py pixels_forward — BASELINE.json configs[3]).

    Backbone weights are constants in EVERY bucket program (ResNet-101
    ≈ 170 MB f32 / 85 MB bf16 per file), so the default is a single
    full-length program; pass ``buckets`` only when artifact size is
    cheaper than the encoder steps it saves.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from rau_vqa_tpu.eval.predict import bucket_ladder, predict
    from rau_vqa_tpu.models.pipeline import extract_features

    os.makedirs(out_dir, exist_ok=True)
    ladder = bucket_ladder(cfg.seq_len, buckets)
    B = jexport.symbolic_shape("b")[0]
    paths = {}
    for T in ladder:
        def fn(images_u8, tokens, lengths):
            # feat_norm must match the interface the head was trained on
            # (snapshots fine-tuned with TrainConfig.backbone_feat_norm)
            feats = extract_features(backbone, bb_params, images_u8,
                                     vit_cfg=vit_cfg, feat_norm=feat_norm)
            return predict(params, cfg, tokens, lengths,
                           feats.astype(jnp.float32))
        exp = jexport.export(jax.jit(fn), platforms=tuple(platforms))(
            jax.ShapeDtypeStruct((B, image_size, image_size, 3), jnp.uint8),
            jax.ShapeDtypeStruct((B, T), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32))
        path = os.path.join(out_dir, f"pixels_T{T:02d}.shlo")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        paths[T] = path
    meta = {
        "format": "rau_vqa_tpu.export",
        "version": _KIND_VERSION["pixels_predict"],
        "kind": "pixels_predict",
        "ladder": ladder, "platforms": list(platforms),
        "backbone": backbone, "image_size": int(image_size),
        "backbone_feat_norm": bool(feat_norm),
        "inputs": {
            "images_u8": ["b", int(image_size), int(image_size), 3],
            "tokens": ["b", "T"], "lengths": ["b"],
        },
        "outputs": {
            "tab_pred": [int(cfg.n_hops) + 2, "b", int(cfg.answer_size)],
            "tab_att": [int(cfg.n_hops) + 2, "b", int(cfg.cnn_spat)],
        },
        "token_contract": "0 = ZEROPAD, answers 0-based (data/loader.py)",
        "model_config": dataclasses.asdict(cfg),
        **(extra_meta or {}),
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return paths


def _sds_tree(tree):
    """A pytree of ShapeDtypeStructs mirroring ``tree`` (operand specs)."""
    import jax
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def export_serve_chain(params, cfg, out_dir: str, *, batch: int,
                       chain: int, n_acc: int = 8,
                       platforms: Sequence[str] = ("cpu", "tpu"),
                       extra_meta: Optional[Dict] = None) -> str:
    """Export bench.py's K-chained measurement program (eval/chain.py).

    Unlike the serving kinds, PARAMS ARE CALL OPERANDS (tiny artifact, one
    weight upload at call time — the round-3 jit-args lesson); ``params``
    here only supplies the operand tree's shapes/dtypes.  Batch and chain
    length are concrete: the artifact IS the measurement protocol.  Export
    only traces+lowers (no backend compile), so artifacts can be built on
    a CPU-pinned host while the TPU tunnel is down and consumed later.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from rau_vqa_tpu.eval.chain import make_serve_chain

    os.makedirs(out_dir, exist_ok=True)
    # mirror make_serve_chain's trace-time clamp so meta documents the
    # program's ACTUAL acc shape (n_acc > batch happens on shrunk smokes)
    n_acc = min(int(n_acc), int(batch))
    fn = make_serve_chain(cfg, chain, n_acc)
    exp = jexport.export(jax.jit(fn), platforms=tuple(platforms))(
        _sds_tree(params),
        jax.ShapeDtypeStruct((batch, cfg.seq_len), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((batch, cfg.cnn_spat, cfg.cnn_dim),
                             jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32))
    path = os.path.join(out_dir, "chain.shlo")
    with open(path, "wb") as f:
        f.write(exp.serialize())
    meta = {
        "format": "rau_vqa_tpu.export",
        "version": _KIND_VERSION["serve_chain"], "kind": "serve_chain",
        "platforms": list(platforms),
        "batch": int(batch), "chain": int(chain), "n_acc": int(n_acc),
        "inputs": {
            "params": "operand pytree (shapes in model_config)",
            "tokens": [int(batch), int(cfg.seq_len)], "lengths": [int(batch)],
            "feats": [int(batch), int(cfg.cnn_spat), int(cfg.cnn_dim)],
            "salt0": [],
        },
        "outputs": {"salt": [], "acc": [int(cfg.n_hops) + 2, int(n_acc)]},
        "model_config": dataclasses.asdict(cfg),
        "code_rev": _code_rev(),
        **(extra_meta or {}),
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return path


def export_pixels_chain(bb_params, params, cfg, backbone: str,
                        out_dir: str, *, batch: int, chain: int, qpi: int,
                        image_size: int, n_acc: int,
                        platforms: Sequence[str] = ("cpu", "tpu"),
                        vit_cfg=None, fused_stages=(),
                        fused_block_b: int = 0, feat_norm: bool = False,
                        extra_meta: Optional[Dict] = None) -> str:
    """Export bench_pixels.py's chained from-pixels measurement program.

    Both weight trees (backbone + RAU) are call operands; backbone
    variants (BN-folded, s2d) are encoded in ``bb_params``'s tree
    STRUCTURE, so the artifact pins the exact variant it was built from.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from rau_vqa_tpu.eval.chain import make_pixels_chain

    os.makedirs(out_dir, exist_ok=True)
    fn = make_pixels_chain(cfg, backbone, chain, qpi, n_acc,
                           vit_cfg=vit_cfg, fused_stages=tuple(fused_stages),
                           fused_block_b=fused_block_b, feat_norm=feat_norm)
    exp = jexport.export(jax.jit(fn), platforms=tuple(platforms))(
        _sds_tree(bb_params), _sds_tree(params),
        jax.ShapeDtypeStruct((batch, image_size, image_size, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch * qpi, cfg.seq_len), jnp.int32),
        jax.ShapeDtypeStruct((batch * qpi,), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32))
    path = os.path.join(out_dir, "chain.shlo")
    with open(path, "wb") as f:
        f.write(exp.serialize())
    meta = {
        "format": "rau_vqa_tpu.export",
        "version": _KIND_VERSION["pixels_chain"], "kind": "pixels_chain",
        "platforms": list(platforms),
        "backbone": backbone, "image_size": int(image_size),
        "batch": int(batch), "chain": int(chain), "qpi": int(qpi),
        "n_acc": int(n_acc), "backbone_feat_norm": bool(feat_norm),
        "inputs": {
            "bb_params": "operand pytree (variant pinned by tree structure)",
            "params": "operand pytree",
            "images_u8": [int(batch), int(image_size), int(image_size), 3],
            "tokens": [int(batch * qpi), int(cfg.seq_len)],
            "lengths": [int(batch * qpi)], "salt0": [],
        },
        "outputs": {"salt": [], "acc": [int(cfg.n_hops) + 2, int(n_acc)]},
        "model_config": dataclasses.asdict(cfg),
        "code_rev": _code_rev(),
        **(extra_meta or {}),
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return path


class ExportedPredict:
    """Callable wrapper over an exported artifact directory.

    Deserializes lazily (one program per bucket, cached) and dispatches
    each batch to the smallest bucket covering its max length — the same
    exactness argument as the live eval ladder.
    """

    def __init__(self, art_dir: str):
        with open(os.path.join(art_dir, _META)) as f:
            self.meta = json.load(f)
        if self.meta.get("format") != "rau_vqa_tpu.export":
            raise ValueError(f"{art_dir!r} is not a rau_vqa_tpu export")
        if self.meta["version"] > EXPORT_VERSION:
            raise ValueError(
                f"artifact version {self.meta['version']} is newer than "
                f"this runtime ({EXPORT_VERSION})")
        self.art_dir = art_dir
        # pre-"kind" artifacts are all questions-path predicts
        self.kind = self.meta.get("kind", "predict")
        if self.kind not in ("predict", "pixels_predict",
                             "serve_chain", "pixels_chain"):
            # unknown kinds must not fall through to some prefix guess and
            # a wrong operand convention (the version gate above should
            # already have caught this for well-formed artifacts)
            raise ValueError(f"unknown artifact kind {self.kind!r}")
        self._chain = self.kind in ("serve_chain", "pixels_chain")
        self.ladder = ([] if self._chain
                       else [int(t) for t in self.meta["ladder"]])
        self._prefix = ("predict" if self.kind == "predict" else "pixels")
        self._programs: Dict[int, object] = {}

    def _program(self, T: int):
        if T not in self._programs:
            from jax import export as jexport
            path = (os.path.join(self.art_dir, "chain.shlo") if self._chain
                    else os.path.join(self.art_dir,
                                      f"{self._prefix}_T{T:02d}.shlo"))
            with open(path, "rb") as f:
                self._programs[T] = jexport.deserialize(f.read())
        return self._programs[T]

    def _bucket_tokens(self, tokens, lengths):
        from rau_vqa_tpu.eval.predict import pick_bucket
        max_len = int(lengths.max()) if lengths.size else 1
        T = pick_bucket(self.ladder, max_len)
        toks = tokens[:, :T]
        if toks.shape[1] < T:  # right-pad with ZEROPAD to the bucket width
            toks = np.concatenate(
                [toks, np.zeros((toks.shape[0], T - toks.shape[1]),
                                np.int32)], axis=1)
        return T, toks

    def __call__(self, *operands) -> Tuple:
        """kind 'predict': (tokens [B,<=seq_len] i32, lengths [B] i32,
        feats [B,S,D] f32); kind 'pixels_predict': (images [B,H,W,3] u8,
        tokens, lengths).  Returns (tab_pred [H+2,B,A], tab_att
        [H+2,B,S])."""
        if self._chain:
            # bench-chain kinds: operands pass through verbatim (the exact
            # trees/arrays the live bench would hand the jitted program —
            # shapes are pinned by the export, mismatches abort loudly in
            # the StableHLO shape check)
            return self._program(0).call(*operands)
        if self.kind == "pixels_predict":
            images, tokens, lengths = operands
            images = np.asarray(images, np.uint8)
            s = int(self.meta["image_size"])
            if images.ndim != 4 or images.shape[1:] != (s, s, 3):
                # fail loudly HERE — the deserialized program would only
                # produce an opaque StableHLO shape abort
                raise ValueError(
                    f"this artifact expects images [b, {s}, {s}, 3] "
                    f"uint8; got {images.shape}")
            tokens = np.asarray(tokens, np.int32)
            lengths = np.asarray(lengths, np.int32)
            T, toks = self._bucket_tokens(tokens, lengths)
            return self._program(T).call(images, toks, lengths)
        tokens, lengths, feats = operands
        tokens = np.asarray(tokens, np.int32)
        lengths = np.asarray(lengths, np.int32)
        feats = np.asarray(feats, np.float32)
        T, toks = self._bucket_tokens(tokens, lengths)
        return self._program(T).call(toks, lengths, feats)


def load_exported(art_dir: str) -> ExportedPredict:
    return ExportedPredict(art_dir)


def load_or_build_chain_artifact(art_dir: str, build, expect_meta: Dict,
                                 log=print) -> ExportedPredict:
    """--artifact plumbing shared by the benches: load the chained
    measurement program from ``art_dir``, (re)building via ``build()``
    when the directory is missing or its meta does not match
    ``expect_meta`` (the artifact is a cache of the protocol, not a
    contract — a changed flag rebuilds rather than errors).

    Callers MUST include "model_config" in expect_meta: artifact dirs
    persist across commits, and without it a stale chain.shlo with
    matching shapes would silently measure an old program.  Values are
    normalized through JSON so dataclass tuples compare equal to the
    lists meta.json stores."""
    import time

    expect = json.loads(json.dumps(expect_meta))
    if "model_config" not in expect:
        raise ValueError("expect_meta must pin model_config "
                         "(stale-artifact guard)")
    # shapes/model_config cannot see SOURCE changes to the traced program
    # (e.g. the round-4 vit attention fix) — pin the git revision too,
    # unless it is unknown on either side (no false rebuilds off-checkout)
    rev = _code_rev()
    meta_path = os.path.join(art_dir, _META)
    why = None
    if not os.path.exists(meta_path):
        why = "missing"
    else:
        with open(meta_path) as f:
            meta = json.load(f)
        if rev != "unknown" and meta.get("code_rev", "unknown") != "unknown":
            # pin only when BOTH sides know their revision — an artifact
            # built off-checkout (code_rev 'unknown') must not rebuild
            # forever inside one
            expect["code_rev"] = rev
        stale = [k for k, v in expect.items() if meta.get(k) != v]
        if stale:
            why = "protocol/model mismatch: " + ", ".join(stale)
    if why is not None:
        log(f"bench: building chain artifact at {art_dir} ({why})")
        t0 = time.perf_counter()
        build()
        log(f"bench: artifact built in {time.perf_counter() - t0:.1f}s "
            f"(trace+lower only — no backend compile)")
    return load_exported(art_dir)
