"""Device mesh + sharding rules (the layer the reference doesn't have).

The reference runs on exactly one GPU with zero collectives (SURVEY.md §2d:
`cutorch.setDevice` at Ours_SS/...lua:135 is its entire "distribution"
story).  Scaling here is expressed the TPU way: a `jax.sharding.Mesh` with a
``data`` axis (DP, primary — the model is ~11M params) and a ``model`` axis
(optional TP for the wide output projections), sharding annotations on the
train-step's inputs/outputs, and XLA/GSPMD inserting the all-reduces over
ICI.  No hand-written collectives are needed for training: gradient
all-reduce falls out of jit-ing the batch-sharded loss.

TP rules (enabled via MeshConfig.shard_params_tp): the 1000-way classifier
and the 4R-wide LSTM gate projections are sharded on their output dim; bias
vectors follow; everything else is replicated.  Sequence/context parallelism
is deliberately absent — questions are <= 26 tokens and attention spans
49-196 spatial cells (SURVEY.md §2d: "keep the seq axis replicated").
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rau_vqa_tpu.config import ModelConfig, TrainConfig
from rau_vqa_tpu.train.trainer import TrainState, make_train_step


def make_mesh(n_data: int = -1, n_model: int = 1,
              devices=None) -> Mesh:
    """('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data < 0:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        # a real raise, not assert: python -O strips asserts and the
        # failure would resurface as numpy's opaque reshape error below
        raise ValueError(
            f"need {n_data * n_model} devices, have {len(devices)}")
    grid = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def mesh_from_config(mc) -> Mesh:
    """Construct the Trainer's mesh from a MeshConfig (CLI --mesh-data /
    --mesh-model / --tp).  Multi-process runs get the process-major
    multihost layout automatically."""
    if jax.process_count() > 1:
        mesh = make_multihost_mesh(n_model=mc.model_axis)
        if mc.data_axis > 0 and mc.data_axis != mesh.shape["data"]:
            # the multihost layout spans ALL devices (holding chips back
            # would strand them mid-collective); silently dropping an
            # explicit --mesh-data would change per-shard batch sizes
            # behind the user's back — fail with the real geometry
            raise ValueError(
                f"--mesh-data {mc.data_axis} conflicts with the "
                f"multihost layout: {jax.device_count()} devices / "
                f"model_axis {mc.model_axis} gives data={mesh.shape['data']} "
                f"(multi-process meshes always use every device; omit "
                f"--mesh-data or set it to {mesh.shape['data']})")
        return mesh
    return make_mesh(n_data=mc.data_axis, n_model=mc.model_axis)


def make_multihost_mesh(n_model: int = 1) -> Mesh:
    """Multi-host ('data', 'model') mesh with devices ordered process-major.

    Initialize the runtime first (``jax.distributed.initialize()``).  Keeping
    each process's chips contiguous along 'data' makes the gradient
    all-reduce hierarchical automatically — GSPMD rides ICI within a slice
    and crosses DCN only for the inter-host combine (device placement, not
    axis naming, decides the network).  TP ('model') must stay within a
    host's chips: n_model must divide the per-host chip count.  Each process
    feeds its own shard of the global batch (host-sharded input pipeline,
    SURVEY.md §5)."""
    devices = jax.devices()          # already process-major in JAX
    local = len(devices) // jax.process_count()
    if local % n_model:
        raise ValueError(
            f"{local} chips/host not divisible by model axis {n_model}")
    return make_mesh(n_data=len(devices) // n_model, n_model=n_model,
                     devices=devices)


# ---------------------------------------------------------------------------
# Sharding rules
# ---------------------------------------------------------------------------

def _tp_rule(path: Tuple, leaf, n_model: int = 0) -> P:
    """Tensor-parallel PartitionSpec for one parameter leaf, keyed by its
    tree path.  Output-dim sharding on 'model' for the wide projections.
    Leaves whose sharded dim is not divisible by the model-axis size fall
    back to replication (device_put rejects uneven shardings)."""
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    name = keys[-1]          # 'w'/'b' or 'wi'/'bi'/'wh'/'bh' or 'lookup'
    parent = next((k for k in reversed(keys[:-1]) if isinstance(k, str)), None)

    # LSTM gate projections: [in, 4R] / [4R]
    if name in ("wi", "wh"):
        spec = P(None, "model")
    elif name in ("bi", "bh"):
        spec = P("model")
    # classifier [M, A] — the widest matmul in the model
    elif parent == "cls":
        spec = P(None, "model") if name == "w" else P("model")
    else:
        # everything else (embeddings, small projections) replicated
        return P()
    if n_model > 1:
        shape = getattr(leaf, "shape", ())
        for i, axis in enumerate(spec):
            if axis == "model" and shape[i] % n_model != 0:
                return P()
    return spec


def param_pspecs(params: Any, *, tp: bool, mesh: Optional[Mesh] = None) -> Any:
    """PartitionSpec pytree matching ``params``."""
    if not tp:
        return jax.tree.map(lambda _: P(), params)
    n_model = int(mesh.shape.get("model", 0)) if mesh is not None else 0
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _tp_rule(path, leaf, n_model), params)


def state_shardings(mesh: Mesh, state: TrainState, *, tp: bool) -> TrainState:
    """NamedSharding pytree for the full TrainState: Adam moments mirror
    their parameters; scalars/rng replicated."""
    pspecs = param_pspecs(state.params, tp=tp, mesh=mesh)
    def ns(spec):
        return NamedSharding(mesh, spec)
    params_sh = jax.tree.map(ns, pspecs)
    opt_sh = {}
    for g, gstate in state.opt.items():
        opt_sh[g] = {
            "m": jax.tree.map(ns, pspecs[g]),
            "v": jax.tree.map(ns, pspecs[g]),
            "t": ns(P()),
        }
    return TrainState(params=params_sh, opt=opt_sh,
                      step=ns(P()), rng=ns(P()))


def batch_pspec() -> P:
    return P("data")


def shard_batch(mesh: Mesh, *arrays):
    """Place each array with its leading dim split over 'data'.

    Single-process: a plain device_put of the global batch.  Multi-process
    (``jax.process_count() > 1``): each process passes only its LOCAL shard
    and the global array is assembled via
    ``jax.make_array_from_process_local_data`` — the host-sharded input
    pipeline the multi-host mesh requires (no process ever materializes the
    global batch)."""
    multiproc = jax.process_count() > 1
    n_data = int(mesh.shape.get("data", 1))
    pc = jax.process_count()
    # multi-process: arrays are per-process LOCAL shards, so the
    # divisibility requirement is against this process's share of the
    # 'data' axis, NOT the global axis size (a 2-host global batch of 24
    # over n_data=8 is a valid 3-per-device sharding with local dim 12)
    local_div = n_data
    if multiproc:
        if n_data % pc:
            raise ValueError(
                f"'data' axis ({n_data}) must divide by the process "
                f"count ({pc}) for host-sharded input")
        local_div = n_data // pc
    out = []
    for a in arrays:
        if a.shape[0] % local_div:
            raise ValueError(
                f"leading dim {a.shape[0]} "
                f"{'(per-process local shard) ' if multiproc else ''}not "
                f"divisible by {'its share of ' if multiproc else ''}the "
                f"'data' axis ({local_div}) — this JAX build rejects "
                f"uneven shardings; pad the batch "
                f"(Trainer._pad_batch_for_mesh) or pick a divisible "
                f"batch size")
        spec = P("data", *([None] * (a.ndim - 1)))
        sh = NamedSharding(mesh, spec)
        if multiproc:
            out.append(jax.make_array_from_process_local_data(
                sh, np.asarray(a)))
        else:
            out.append(jax.device_put(a, sh))
    return tuple(out) if len(out) > 1 else out[0]


# ---------------------------------------------------------------------------
# Sharded train step
# ---------------------------------------------------------------------------

def make_sharded_train_step(mcfg: ModelConfig, tcfg: TrainConfig, mesh: Mesh,
                            state: TrainState, *, tp: bool = False,
                            backbone: Optional[str] = None, vit_cfg=None,
                            img_repeat: int = 1):
    """jit the train step with explicit input/output shardings over ``mesh``.

    Batch tensors are sharded on 'data'; the TrainState follows
    ``state_shardings``.  Scalar step inputs (hop scale, learning rates) are
    replicated.  Gradients of replicated params over the sharded batch are
    all-reduced by GSPMD automatically — the collective set the reference
    never had (SURVEY.md §2d).

    Fine-tuning (``tcfg.train_backbone`` + ``backbone``): the feats input
    is a uint8 image batch [B, H, W, 3] sharded on 'data'; the backbone
    group's replicated weights get their gradient all-reduced by GSPMD
    exactly like the head's."""
    step_fn = make_train_step(mcfg, tcfg, backbone=backbone, vit_cfg=vit_cfg,
                              img_repeat=img_repeat)
    st_sh = state_shardings(mesh, state, tp=tp)
    rep = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    feats_sh = (NamedSharding(mesh, P("data", None, None, None))
                if getattr(tcfg, "train_backbone", False)
                else NamedSharding(mesh, P("data", None, None)))

    in_sh = (
        st_sh,
        NamedSharding(mesh, P("data", None)),   # tokens [B, T]
        data_sh,                                 # lengths [B]
        feats_sh,                  # feats [B, S, D] / images u8 [B, H, W, 3]
        data_sh,                                 # labels [B]
        rep,                                     # hop_scale [H]
        rep, rep,                                # lr, mult_lr
    )
    metric_sh = None  # let the compiler place reduced metrics
    return jax.jit(step_fn, in_shardings=in_sh,
                   out_shardings=(st_sh, metric_sh),
                   donate_argnums=(0,))


def place_tree(tree, shardings):
    """Place a host tree onto per-leaf NamedShardings.

    Multi-process: every process holds the same full host values, and each
    contributes its addressable shards via ``make_array_from_callback`` —
    device_put cannot target a sharding that spans processes."""
    if jax.process_count() > 1:
        def place(x, s):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, s, lambda idx, x=x: x[idx])
        return jax.tree.map(place, tree, shardings)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)


def replicate_tree(mesh: Mesh, tree):
    """Replicate a host tree across the whole mesh (empty PartitionSpec),
    multi-process-safe — the frozen-backbone placement in Trainer and any
    other broadcast-everywhere weight tree share this one mechanism."""
    rep = NamedSharding(mesh, P())
    return place_tree(tree, jax.tree.map(lambda _: rep, tree))


def place_state(mesh: Mesh, state: TrainState, *, tp: bool = False) -> TrainState:
    """Place a host-initialized TrainState onto the mesh (see place_tree
    for the multi-process contract)."""
    return place_tree(state, state_shardings(mesh, state, tp=tp))


# ---------------------------------------------------------------------------
# Sharded serving
# ---------------------------------------------------------------------------

def make_sharded_predict_fn(mcfg: ModelConfig, mesh: Mesh, params, *,
                            tp: bool = False):
    """jit the eval forward with the batch sharded on 'data' (+ optional TP
    weights).  ``params`` is only used for its tree structure; pass arrays
    already placed with matching shardings (e.g. a mesh-placed TrainState's
    params)."""
    from rau_vqa_tpu.eval.predict import predict

    pspecs = param_pspecs(params, tp=tp, mesh=mesh)
    p_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs)
    in_sh = (
        p_sh,
        NamedSharding(mesh, P("data", None)),        # tokens
        NamedSharding(mesh, P("data")),              # lengths
        NamedSharding(mesh, P("data", None, None)),  # feats
    )
    return jax.jit(lambda p, t, l, f: predict(p, mcfg, t, l, f),
                   in_shardings=in_sh)


def make_sharded_predict(mcfg: ModelConfig, mesh: Mesh, params, *,
                         tp: bool = False):
    """jit the eval forward with the batch sharded on 'data' (+ optional TP
    weights): multi-chip serving scales throughput ~linearly with the data
    axis since the per-hop compute is embarrassingly batch-parallel.
    Returns (jitted_fn, placed_params)."""
    pspecs = param_pspecs(params, tp=tp, mesh=mesh)
    p_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs)
    params = jax.tree.map(lambda x, s: jax.device_put(x, s), params, p_sh)
    return make_sharded_predict_fn(mcfg, mesh, params, tp=tp), params


def make_sharded_pixels_predict(mcfg: ModelConfig, mesh: Mesh, params,
                                backbone: str, *, tp: bool = False,
                                vit_cfg=None, feat_norm: bool = False):
    """From-pixels serving over the mesh: ONE jitted program taking uint8
    images sharded on 'data' (plus 'data'-sharded tokens/lengths), running
    preprocess -> frozen backbone -> RAU head end-to-end — the multi-chip
    composition of BASELINE.json configs[3] ("Ours_ResNet run on-TPU
    end-to-end, features not precomputed").  Backbone params are
    replicated (convs are embarrassingly batch-parallel; their weights are
    small next to the activations); RAU params follow ``param_pspecs``
    (replicated, or TP-sharded classifier/gates with ``tp=True``).

    Returns a jitted ``(params, bb_params, images_u8, tokens, lengths) ->
    (tab_pred, tab_att)`` — same outputs as eval/predict.predict."""
    from rau_vqa_tpu.eval.predict import predict
    from rau_vqa_tpu.models.pipeline import extract_features

    pspecs = param_pspecs(params, tp=tp, mesh=mesh)
    p_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs)
    rep = NamedSharding(mesh, P())   # prefix spec: replicates the bb tree

    def run(p, bb, imgs, t, l):
        feats = extract_features(backbone, bb, imgs, vit_cfg=vit_cfg,
                                 feat_norm=feat_norm)
        return predict(p, mcfg, t, l, feats)

    return jax.jit(
        run,
        in_shardings=(
            p_sh,
            rep,
            NamedSharding(mesh, P("data", None, None, None)),  # images u8
            NamedSharding(mesh, P("data", None)),              # tokens
            NamedSharding(mesh, P("data")),                    # lengths
        ),
    )
