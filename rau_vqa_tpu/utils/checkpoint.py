"""Checkpoint save/restore with optimizer state.

The reference snapshots only the three flat parameter vectors —
``{it, opt, epoch, params={embed, rnn, mult}}`` via torch.save
(Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:1188-1197) — and its training
scripts never actually restore (``-init_from`` merely skips random init,
:349-355; only Eval.lua loads).  Here checkpoints carry params, Adam moments,
step counter, RNG key and learning rates, so training is truly resumable
(SURVEY.md §5 Checkpoint/resume).

Format: one msgpack blob (flax.serialization) + a small JSON sidecar with
bookkeeping, named ``snapshot_iter{it:06d}_epoch{epoch:.2f}`` like the
reference's files.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def checkpoint_name(step: int, epoch: float) -> str:
    return f"snapshot_iter{step:06d}_epoch{epoch:.2f}"


# Background writer: ONE thread so successive saves serialize in order
# (LATEST always names a fully written snapshot; keep_last pruning never
# races a write).  ThreadPoolExecutor threads are non-daemon, so pending
# writes complete even if the interpreter exits without a flush.
_writer = None
_pending = []


def _get_writer():
    global _writer
    if _writer is None:
        from concurrent.futures import ThreadPoolExecutor
        _writer = ThreadPoolExecutor(max_workers=1,
                                     thread_name_prefix="ckpt-writer")
    return _writer


def _failed_future(err: BaseException):
    """An already-resolved future carrying ``err`` — used to re-queue a
    collected-but-not-yet-raised write error when a flush is interrupted."""
    from concurrent.futures import Future
    fut: "Future[None]" = Future()
    fut.set_exception(err)
    return fut


def flush_checkpoint_writes() -> None:
    """Block until every background checkpoint write has landed; then
    re-raise the first write error (all futures are WAITED before any
    raise, so no write is abandoned mid-flight).  Call before reading
    ``latest_checkpoint`` in the saving process, and before treating
    training artifacts as durable."""
    global _pending
    pending, _pending = _pending, []
    first_err = None
    i = 0   # the handler below slices pending[i:]; an interrupt landing
    try:    # before the first loop binding must re-queue EVERYTHING
        for i, fut in enumerate(pending):
            try:
                fut.result()
            except Exception as e:    # wait all, raise first; Exception
                if first_err is None:  # (not BaseException) so a Ctrl-C
                    first_err = e      # delivered HERE still aborts...
    except BaseException:
        # ...but an abort must not ABANDON the rest: push un-waited
        # futures back so a later flush (e.g. a harness flushing on
        # KeyboardInterrupt before exit) still waits them and still
        # sees first_err rather than reporting a clean state
        _pending = pending[i:] + _pending
        if first_err is not None:
            _pending.insert(0, _failed_future(first_err))
        raise
    if first_err is not None:
        raise first_err


def _write(ckpt_dir: str, name: str, path: str, host_tree: Any,
           meta: Dict, keep_last: Optional[int]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host_tree))
    os.replace(tmp, path)
    with open(os.path.join(ckpt_dir, name + ".json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(ckpt_dir, "LATEST"), "w") as f:
        f.write(name)
    if keep_last is not None and keep_last > 0:
        # sort by the PARSED step: lexicographic order misranks steps past
        # the 6-digit zero-padding (iter1000000 < iter999999 as strings),
        # which would prune the newest snapshot and keep stale ones
        def step_of(fname: str) -> int:
            m = re.search(r"iter(\d+)", fname)
            return int(m.group(1)) if m else -1

        snaps = sorted((f for f in os.listdir(ckpt_dir)
                        if f.startswith("snapshot_")
                        and f.endswith(".msgpack")), key=step_of)
        for old in snaps[:-keep_last]:
            for suffix in (".msgpack", ".json"):
                stale = os.path.join(ckpt_dir,
                                     old.replace(".msgpack", suffix))
                if os.path.exists(stale):
                    os.remove(stale)


def save_checkpoint(ckpt_dir: str, step: int, epoch: float, tree: Any,
                    extra: Optional[Dict] = None,
                    keep_last: Optional[int] = None,
                    background: bool = False) -> str:
    """Serialize an arbitrary pytree of arrays/scalars. Returns the path.
    With ``keep_last`` only the newest N snapshots are retained.

    ``background=True`` moves serialization + disk IO to a single writer
    thread (Orbax-style async save) and returns immediately.  The
    device→host gather still happens HERE, synchronously: the caller's
    train step donates its state buffers, so the values must be pinned
    before the next dispatch.  Use :func:`flush_checkpoint_writes` before
    reading the snapshot back in the same process.

    Every save first drains pending background writes.  For sync saves
    this prevents a writer-thread/_caller-thread race on LATEST and
    keep_last pruning; for background saves it bounds in-flight host
    copies to ONE (each queued save pins a full host copy of
    params + optimizer state — an unbounded queue would grow host RAM
    with every epoch whenever the writer is slower than the cadence)."""
    flush_checkpoint_writes()
    os.makedirs(ckpt_dir, exist_ok=True)
    name = checkpoint_name(step, epoch)
    path = os.path.join(ckpt_dir, name + ".msgpack")
    host_tree = jax.tree.map(np.asarray, tree)
    meta = {"step": step, "epoch": epoch, **(extra or {})}
    if background:
        _pending.append(_get_writer().submit(
            _write, ckpt_dir, name, path, host_tree, meta, keep_last))
    else:
        _write(ckpt_dir, name, path, host_tree, meta, keep_last)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest fully-written snapshot path, or None.

    Flushes this process's pending background writes first, so a caller
    that just issued an async save always sees it."""
    flush_checkpoint_writes()
    marker = os.path.join(ckpt_dir, "LATEST")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        name = f.read().strip()
    path = os.path.join(ckpt_dir, name + ".msgpack")
    return path if os.path.exists(path) else None


def validate_tree_shapes(template: Any, tree: Any) -> None:
    """Raise loudly when ``tree``'s leaf shapes differ from ``template``'s.

    flax's from_bytes/from_state_dict substitute stored arrays without
    shape validation; a config/snapshot mismatch must fail here, not
    evaluate garbage (shared by load_checkpoint and cli cmd_export)."""
    t_leaves = jax.tree_util.tree_leaves_with_path(template)
    r_leaves = jax.tree.leaves(tree)
    for (kp, t_leaf), r_leaf in zip(t_leaves, r_leaves):
        t_shape = getattr(t_leaf, "shape", None)
        r_shape = getattr(r_leaf, "shape", None)
        if t_shape is not None and r_shape is not None and t_shape != r_shape:
            raise ValueError(
                f"checkpoint shape mismatch at {jax.tree_util.keystr(kp)}: "
                f"expected {t_shape} from config, snapshot has {r_shape} — "
                f"rebuild the model with the snapshot's config")


def load_backbone_group(path: str, kind: str, *, fold: bool = True):
    """Extract the fine-tuned ``backbone`` parameter group from a 4-group
    snapshot (TrainConfig.train_backbone) as a host tree.

    ``kind`` names the backbone family ('vgg16'/'resnet101'/'vit' — stored
    in the snapshot's meta as 'backbone').  ResNet trees are BN-folded by
    default (the serving-optimized form; exact for inference).  This is
    how `serve`/`export`/`precompute-features` consume a FINE-TUNED
    backbone instead of the original torchvision weights."""
    import jax.numpy as jnp
    from flax import serialization

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    bb_raw = raw.get("params", {}).get("backbone")
    if bb_raw is None:
        raise ValueError(
            f"{path} has no 'backbone' parameter group — not a fine-tuned "
            f"snapshot (train with --train-backbone to produce one)")
    # a structure template turns msgpack's {'0': ...} dicts back into the
    # lists the apply fns expect; leaf values come from the snapshot
    # (validate_tree_shapes catches kind mismatches loudly)
    key_s = jax.ShapeDtypeStruct((2,), jnp.uint32)
    if kind == "resnet101":
        from rau_vqa_tpu.models.backbones.resnet import (
            fold_batchnorm,
            resnet101_init,
        )
        # CLI fine-tuning (`--backbone-state *.pth --train-backbone`)
        # trains the FOLDED tree (BN-frozen fine-tuning — the loader folds
        # for serving); a Trainer(bb_params=resnet101_init(...)) run saves
        # the plain conv+BN structure.  The snapshot's own structure
        # decides (folding drops the bn keys structurally).
        saved_folded = "bn1" not in bb_raw
        plain = jax.eval_shape(resnet101_init, key_s)   # SDS tree, no device
        if saved_folded:
            # STRUCTURAL fold (shapes only): running fold_batchnorm on a
            # materialized tree would push ~178 MB of garbage template
            # values through the device just to be discarded — ~12 s on
            # the rig tunnel, and a hang when the tunnel is down
            def fold_s(conv):
                co = conv["w"].shape[-1]
                return {"w": jax.ShapeDtypeStruct(conv["w"].shape,
                                                  jnp.float32),
                        "b": jax.ShapeDtypeStruct((co,), jnp.float32)}

            template = {
                "conv1": fold_s(plain["conv1"]),
                "stages": [[
                    {**{k: fold_s(blk[k])
                        for k in ("conv1", "conv2", "conv3")},
                     **({"down": fold_s(blk["down"])}
                        if "down" in blk else {})}
                    for blk in blocks] for blocks in plain["stages"]],
            }
            fold = False   # already folded
        else:
            template = plain
    elif kind == "vgg16":
        from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
        template = jax.eval_shape(vgg16_pool5_init, key_s)
    elif kind == "vit":
        from rau_vqa_tpu.models.backbones.vit import VIT_L14, vit_init
        template = jax.eval_shape(lambda k: vit_init(k, VIT_L14), key_s)
    else:
        raise ValueError(f"unknown backbone kind {kind!r}")
    bb = serialization.from_state_dict(template, bb_raw)
    validate_tree_shapes(template, bb)
    if kind == "resnet101" and fold:
        bb = fold_batchnorm(bb)
    return bb


def checkpoint_meta(path: str) -> Dict:
    """The sidecar meta dict for a snapshot (empty if absent)."""
    meta_path = path.replace(".msgpack", ".json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def load_checkpoint(path: str, template: Any) -> Tuple[Any, Dict]:
    """Restore a pytree saved by save_checkpoint; ``template`` provides the
    structure (e.g. a freshly initialized state)."""
    with open(path, "rb") as f:
        tree = serialization.from_bytes(template, f.read())
    validate_tree_shapes(template, tree)
    return tree, checkpoint_meta(path)
