"""Training engine: one compiled XLA step + a thin host loop.

The reference's train loop is a 1,234-line script mixing model build, feval,
Adam calls, plotting and checkpointing (Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:762-1223).
Here the entire optimization iteration — forward, joint loss, backward,
gradient noise, per-group clip, per-group Adam with dual learning rates —
is ONE jitted function with donated state, so a training step is a single
device program; the host loop only feeds batches and handles epoch-boundary
bookkeeping (LR decay :1211-1220, eval sweep :851-1207, checkpoints,
loss-explosion guard).

The loss-explosion guard implements the ``-loss_explod_threshold`` flag the
reference declares but never reads (:29): if the joint loss exceeds
``threshold``× its EMA (or goes non-finite), the step's update is discarded
by restoring the last checkpoint.
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rau_vqa_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
from rau_vqa_tpu.data.loader import VQAData
from rau_vqa_tpu.data.features import FeatureSource
from rau_vqa_tpu.eval.predict import compute_answers, make_predict_step
from rau_vqa_tpu.eval.submission import write_results
from rau_vqa_tpu.models.rau import init_params, rau_forward
from rau_vqa_tpu.train.losses import hop_grad_scale, joint_loss_and_metrics
from rau_vqa_tpu.train.optim import (
    adam_init,
    adam_update,
    add_gradient_noise,
    clip_by_global_norm,
)
from rau_vqa_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from rau_vqa_tpu.utils.logging import MetricsLogger, per_hop_record

PARAM_GROUPS = ("embed", "rnn", "mult")


class TrainState(NamedTuple):
    params: Any
    opt: Dict[str, Any]        # one Adam state per group (reference :769-775)
    step: jax.Array            # completed iterations
    rng: jax.Array


def init_train_state(key: jax.Array, mcfg: ModelConfig,
                     bb_params=None) -> TrainState:
    """Fresh state.  With ``bb_params`` the backbone joins as a 4th
    parameter group (fine-tuning, TrainConfig.train_backbone): its leaves
    and Adam moments live in the state like the reference's three flat
    vectors do (:769-775) — one donated buffer set, one checkpoint."""
    k_init, k_rng = jax.random.split(key)
    params = init_params(k_init, mcfg)
    groups = PARAM_GROUPS
    if bb_params is not None:
        params["backbone"] = jax.tree.map(jnp.asarray, bb_params)
        groups = PARAM_GROUPS + ("backbone",)
    opt = {g: adam_init(params[g]) for g in groups}
    return TrainState(params=params, opt=opt,
                      step=jnp.zeros((), jnp.int32), rng=k_rng)


# Metric keys that are SUMS over the batch (everything else is a batch
# mean): under gradient accumulation sums add across microbatches while
# means average — both exact for equal microbatch sizes.
_SUM_METRICS = ("do_pred_acc_num", "do_pred_acc_den")


def make_train_step(mcfg: ModelConfig, tcfg: TrainConfig,
                    backbone: Optional[str] = None, vit_cfg=None,
                    img_repeat: int = 1):
    """Build the pure train-step function (jit it at the call site so the
    parallel layer can add shardings).

    With ``tcfg.grad_accum = k > 1`` the step runs k sequential microbatch
    forward/backward passes under ``lax.scan`` (microbatch i = rows
    [i*B/k, (i+1)*B/k) — contiguous loader order) and applies ONE optimizer
    update on the averaged gradients.  The math is exact: every loss term is
    a batch mean, so the mean of equal-sized microbatch gradients equals the
    full-batch gradient (noise/clip/Adam see identical inputs up to
    float-summation order); only the dropout pattern differs (one fold_in
    per microbatch).  Activation memory drops ~k× — the lever for effective
    batch sizes that don't fit HBM (the reference, capped at in-core batch
    100, has no equivalent).

    With ``tcfg.train_backbone`` (requires ``backbone``) the ``feats``
    argument is a uint8 image batch [B, H, W, 3]: the step runs
    preprocess -> backbone -> RAU forward -> joint loss -> backward
    THROUGH the backbone in one program, and a 4th parameter group
    "backbone" gets its own scaled LR (tcfg.backbone_lr_scale) in the same
    noise(optional)/clip/Adam pipeline.  The reference cannot express this
    at all — its features are precomputed by a frozen extractor
    (data/get_*.sh).

    ``img_repeat = k > 1`` (fine-tuning only): the image batch carries
    B//k UNIQUE images and questions are grouped k-consecutive-per-image
    (the 'imggroup' batch order) — each image runs the backbone ONCE and
    its features repeat k times, k× less backbone compute.  EXACT for the
    questions' gradients; the backbone gradient sums the k questions'
    contributions through the shared pass, identical to running the
    duplicated image k times (linearity of grads over the repeat)."""
    accum = int(getattr(tcfg, "grad_accum", 1) or 1)
    train_bb = bool(getattr(tcfg, "train_backbone", False))
    if train_bb and not backbone:
        raise ValueError("train_backbone needs backbone= (the step's feats "
                         "argument becomes a uint8 image batch)")
    img_repeat = int(img_repeat or 1)
    if img_repeat > 1 and not train_bb:
        raise ValueError("img_repeat (grouped unique-image batches) is a "
                         "fine-tuning mode — set tcfg.train_backbone")
    groups = PARAM_GROUPS + ("backbone",) if train_bb else PARAM_GROUPS

    def step_fn(state: TrainState, tokens, lengths, feats, labels,
                hop_scale, lr, mult_lr):
        rng_next, k_fwd, k_noise = jax.random.split(state.rng, 3)

        def loss_fn(params, tok, ln, ft, lb, k):
            if train_bb:
                from rau_vqa_tpu.models.pipeline import extract_features
                ft = extract_features(
                    backbone, params["backbone"], ft, vit_cfg=vit_cfg,
                    remat=tcfg.backbone_remat,
                    feat_norm=getattr(tcfg, "backbone_feat_norm", False))
                if img_repeat > 1:
                    # grouped batches: question row i belongs to unique
                    # image i // img_repeat
                    ft = jnp.repeat(ft, img_repeat, axis=0)
            out = rau_forward(params, mcfg, tok, ln, ft,
                              train=True, rng=k)
            return joint_loss_and_metrics(out.scores, out.do_pred, lb,
                                          hop_scale)

        if accum == 1:
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, tokens, lengths,
                                       feats, labels, k_fwd)
        else:
            B = tokens.shape[0]
            if B % accum:
                raise ValueError(
                    f"batch_size {B} must divide by grad_accum {accum}")
            if img_repeat > 1 and (B // accum) % img_repeat:
                raise ValueError(
                    f"microbatch size {B // accum} must divide by "
                    f"img_repeat {img_repeat} (microbatches must split at "
                    f"image-group boundaries)")
            # feats may be a UNIQUE-image batch (img_repeat > 1) with a
            # shorter leading dim — split each array by its own length
            micro = tuple(
                a.reshape((accum, a.shape[0] // accum) + a.shape[1:])
                for a in (tokens, lengths, feats, labels))
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

            def body(carry, xs):
                g_acc, m_acc = carry
                tok, ln, ft, lb, k = xs
                (_, m), g = grad_fn(state.params, tok, ln, ft, lb, k)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                m_acc = jax.tree.map(jnp.add, m_acc, m)
                return (g_acc, m_acc), None

            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            (_, m0), _ = jax.eval_shape(grad_fn, state.params,
                                        *(a[0] for a in micro), k_fwd)
            zero_m = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), m0)
            (grads, metrics), _ = jax.lax.scan(
                body, (zero_g, zero_m),
                micro + (jax.random.split(k_fwd, accum),))
            grads = jax.tree.map(lambda g: g / accum, grads)
            metrics = {k: (v if k in _SUM_METRICS else v / accum)
                       for k, v in metrics.items()}

        lrs = {"embed": lr, "rnn": lr, "mult": mult_lr,
               "backbone": lr * float(tcfg.backbone_lr_scale)}
        new_params, new_opt = {}, {}
        for i, g in enumerate(groups):
            gg = grads[g]
            if g == "backbone":
                # zero-signal test on the PRE-noise gradient: with
                # backbone_grad_noise the injected noise keeps the
                # post-noise norm > 0 every step, which would defeat the
                # freeze entirely (Adam would integrate pure noise plus
                # stale momentum — the exact coasting pathology the
                # freeze exists to stop)
                alive = (sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                             for x in jax.tree.leaves(gg))
                         > 0).astype(jnp.float32)
            if g != "backbone" or tcfg.backbone_grad_noise:
                # state.step counts completed steps; the noise schedule
                # takes the 1-based iteration (the reference's `it`, :598)
                gg = add_gradient_noise(gg, jax.random.fold_in(k_noise, i),
                                        state.step + 1, tcfg.noisy_eta,
                                        tcfg.noisy_gamma)
            gg, norm = clip_by_global_norm(gg, tcfg.grad_clip)
            new_params[g], new_opt[g] = adam_update(
                state.params[g], gg, lrs[g], state.opt[g],
                beta1=tcfg.adam_beta1, beta2=tcfg.adam_beta2,
                epsilon=tcfg.adam_epsilon)
            if g == "backbone":
                tau = float(getattr(tcfg, "backbone_trust_ratio", 0.0))
                if tau > 0:
                    from rau_vqa_tpu.train.optim import trust_ratio_cap
                    new_params[g] = trust_ratio_cap(
                        new_params[g], state.params[g], tau)
                # zero-signal freeze: a fully saturated head yields an
                # EXACTLY-zero f32 backbone gradient; without this, Adam
                # coasts on stale momentum (measured: features kept
                # inflating 57 -> 12M std across 60 dead steps).  No
                # signal, no movement.  (`alive` was measured above on
                # the pre-noise gradient.)
                new_params[g] = jax.tree.map(
                    lambda n, o: o + (n - o) * alive.astype(n.dtype),
                    new_params[g], state.params[g])
            metrics[f"grad_norm_{g}"] = norm
        new_state = TrainState(params=new_params, opt=new_opt,
                               step=state.step + 1, rng=rng_next)
        return new_state, metrics

    return step_fn


class Trainer:
    """End-to-end training + periodic evaluation for one experiment."""

    def __init__(self, exp: ExperimentConfig, data: VQAData,
                 source: FeatureSource, workdir: str, *,
                 gt_anno: Optional[Dict[int, str]] = None,
                 official_anno: Optional[str] = None,
                 jit_step=None, mesh=None,
                 backbone: Optional[str] = None, bb_params=None,
                 vit_cfg=None):
        # model dims come from the dataset (reference reads vocab/answer size
        # from the loader, :204,:222)
        self.mcfg = dataclasses.replace(
            exp.model, vocab_size=data.vocab_size,
            answer_size=data.answer_size, seq_len=data.seq_len)
        self.tcfg = exp.train
        if self.tcfg.grad_accum > 1 \
                and self.tcfg.batch_size % self.tcfg.grad_accum:
            raise ValueError(
                f"batch_size {self.tcfg.batch_size} must divide by "
                f"grad_accum {self.tcfg.grad_accum}")
        self.exp = exp
        self.data = data
        self.source = source
        # interface check: a packed shard records whether its rows went
        # through the RMS-normalized interface (data/features.py) — feeding
        # the head the other interface silently scores near-garbage
        if source is not None:
            from rau_vqa_tpu.data.features import check_feat_interface
            check_feat_interface(
                source, bool(getattr(self.tcfg, "backbone_feat_norm",
                                     False)), "Trainer")
        self.workdir = workdir
        self.gt_anno = gt_anno
        # official VQA metric (10-rater consensus): annotations path,
        # digested lazily into a scorer at the first eval sweep
        self.official_anno = official_anno
        self._official_scorer = None
        self._warned_partial_official = False
        self.ckpt_dir = os.path.join(workdir, "snapshot")
        self.logger = MetricsLogger(os.path.join(workdir, "training_log"))

        # backbone fine-tuning: the backbone joins the state as a 4th
        # parameter group and the train step consumes raw uint8 images
        # (tcfg.train_backbone; see make_train_step)
        self.train_backbone = bool(self.tcfg.train_backbone)
        if self.train_backbone and (backbone is None or bb_params is None):
            raise ValueError(
                "train_backbone needs an image data source plus "
                "Trainer(backbone=..., bb_params=...) — fine-tuning "
                "differentiates through the pixels (--image-root)")
        self.state = init_train_state(
            jax.random.PRNGKey(self.tcfg.seed), self.mcfg,
            bb_params=bb_params if self.train_backbone else None)
        # image-grouped fine-tuning: with the 'imggroup' batch order each
        # image's questions are consecutive, so the step runs the backbone
        # ONCE per unique image and repeats its features (exact — see
        # make_train_step img_repeat; ~3x less backbone compute on VQA)
        self.img_repeat = 1
        if self.train_backbone and exp.data.batch_order == "imggroup":
            g = data.train_data.uniform_image_group_size()
            if self.tcfg.batch_size % g:
                raise ValueError(
                    f"imggroup fine-tuning: batch_size "
                    f"{self.tcfg.batch_size} must divide by the "
                    f"questions-per-image group size {g} (batches must "
                    f"start on image-group boundaries)")
            if mesh is not None:
                n_data = int(mesh.shape.get("data", 1))
                per_shard = self.tcfg.batch_size // n_data
                if self.tcfg.batch_size % n_data or per_shard % g:
                    raise ValueError(
                        f"imggroup fine-tuning on a mesh: the per-shard "
                        f"batch ({self.tcfg.batch_size}/{n_data}) must be "
                        f"a multiple of the group size {g} so feature "
                        f"repeats never cross shard boundaries")
            self.img_repeat = g
        # host-side fallback so the explosion guard can reject a poisoned
        # update even before the first checkpoint exists (reference declares
        # -loss_explod_threshold but never reads it, Ours_SS/...lua:29);
        # captured pre-placement so it is host-local in every process
        self._fallback_state = jax.tree.map(np.asarray, self.state)
        self.mesh = mesh
        if jit_step is not None:
            self.train_step = jit_step
        elif mesh is not None:
            # DP (+ optional TP) over the mesh; the batch is sharded on
            # 'data' in _put_batch, gradients all-reduce via GSPMD
            from rau_vqa_tpu.parallel.mesh import (
                make_sharded_train_step,
                place_state,
            )
            tp = exp.mesh.shard_params_tp
            self.state = place_state(mesh, self.state, tp=tp)
            self.train_step = make_sharded_train_step(
                self.mcfg, self.tcfg, mesh, self.state, tp=tp,
                backbone=backbone if self.train_backbone else None,
                vit_cfg=vit_cfg, img_repeat=self.img_repeat)
        else:
            self.train_step = jax.jit(
                make_train_step(
                    self.mcfg, self.tcfg,
                    backbone=backbone if self.train_backbone else None,
                    vit_cfg=vit_cfg, img_repeat=self.img_repeat),
                donate_argnums=(0,))
        if mesh is not None:
            # sharded serving for the eval sweep: params already live on the
            # mesh with TP/replicated shardings, the batch shards on 'data'.
            # Length buckets compose: the sharding specs are shape-generic,
            # so the Trainer truncates the token axis host-side (below) and
            # jit caches one sharded executable per bucket.
            from rau_vqa_tpu.parallel.mesh import make_sharded_predict_fn
            self.predict_step = make_sharded_predict_fn(
                self.mcfg, mesh, self._head_params(),
                tp=exp.mesh.shard_params_tp)
        else:
            # buckets=() — the Trainer dispatches buckets itself so the
            # mesh and non-mesh paths share one mechanism
            self.predict_step = make_predict_step(
                self.mcfg, fused=exp.fused_eval)
        # bucket ladders: smallest bucket covering a batch's max question
        # length wins; the full seq_len is always the top rung
        self._eval_ladder = self._make_ladder(exp.eval_buckets)
        self._train_ladder = self._make_ladder(self.tcfg.length_buckets)

        self._dequant = None
        # from-pixels training/eval: when the data source yields uint8
        # image batches, a frozen on-device backbone computes the [B, S, D]
        # features inline (the capability behind the reference's unused
        # next_batch_image path, vqa_prepro_loader.lua:1012-1068 — there
        # the features would be extracted on the host per batch)
        self.backbone = backbone
        # non-default ViT configs thread through every featurize/train
        # path (None = the stock ViT-L/14, extract_features' default)
        self.vit_cfg = vit_cfg
        # device-resident ONCE: bb goes to _featurize as a jit ARGUMENT
        # (so fine-tuned weights stay live), and numpy leaves as jit args
        # re-stage per dispatch — ~780 ms each through the rig tunnel
        # (CLAUDE.md).  On a mesh the backbone replicates (its weights are
        # small next to the activations).
        if bb_params is not None and not self.train_backbone:
            if mesh is not None:
                from rau_vqa_tpu.parallel.mesh import replicate_tree
                bb_params = replicate_tree(mesh, bb_params)
            else:
                bb_params = jax.device_put(bb_params)
        self.bb_params = bb_params
        self._featurize = None
        self.lr = self.tcfg.learning_rate
        self.mult_lr = self.tcfg.mult_learning_rate
        self.epoch = 0                  # completed epochs
        self._abort_streak = 0          # consecutive explosion-guard trips
        self.loss_ema: Optional[float] = None
        data.train_data.set_batch_order_option(exp.data.batch_order)
        data.train_data.reorder()

    # ------------------------------------------------------------------
    def _head_params(self):
        """The RAU head's three parameter groups — what predict/export
        consume.  Under fine-tuning the state carries a 4th 'backbone'
        group that the head forward must not see (rau_forward indexes by
        group name, but the sharded predict fn's template/sharding trees
        must match its inputs exactly)."""
        p = self.state.params
        return ({g: p[g] for g in PARAM_GROUPS} if "backbone" in p else p)

    def _bb_tree(self):
        """The live backbone tree: the trained group under fine-tuning,
        else the frozen Trainer(bb_params=...) weights."""
        return (self.state.params["backbone"] if self.train_backbone
                else self.bb_params)

    # ------------------------------------------------------------------
    def _make_ladder(self, buckets):
        from rau_vqa_tpu.eval.predict import bucket_ladder
        return bucket_ladder(self.mcfg.seq_len, buckets or ())

    @staticmethod
    def _bucket_t(ladder, lengths) -> int:
        """Smallest ladder rung covering this batch's max GLOBAL length.
        ``lengths`` is the pre-sharding host array, identical in every
        process — so multi-process runs always agree on the compiled
        shape."""
        from rau_vqa_tpu.eval.predict import pick_bucket
        max_len = int(np.max(np.asarray(lengths)))
        return pick_bucket(ladder, max_len)

    # ------------------------------------------------------------------
    def _hop_scale(self, epoch_1based: int) -> jnp.ndarray:
        return hop_grad_scale(
            self.mcfg.n_hops,
            scale_by_nhop=self.tcfg.hop_grad_scale_nhop,
            stop_timing=self.tcfg.hop_stop_timing,
            epoch=epoch_1based)

    def _put_batch(self, batch, max_t: Optional[int] = None,
                   featurize: bool = True):
        # ship features in the compute dtype: halves host->device bytes in
        # bf16 mode (the model casts to compute_dtype on entry anyway)
        feat_dt = (np.float32 if self.mcfg.compute_dtype == "float32"
                   else jnp.dtype(self.mcfg.compute_dtype))
        from rau_vqa_tpu.data.features import QuantFeats
        if isinstance(batch.feats, QuantFeats) and self.mesh is None:
            # int8 over the wire, dequantize on device (4x less transfer
            # than f32, 2x less than bf16); one tiny fused device program
            if self._dequant is None:
                self._dequant = jax.jit(
                    lambda v, s, _dt=feat_dt: v.astype(_dt)
                    * s[:, None, None].astype(_dt))
            feats = self._dequant(jnp.asarray(batch.feats.values),
                                  jnp.asarray(batch.feats.scales))
        elif isinstance(batch.feats, QuantFeats):
            # mesh path shards one feats array: dequantize on host with the
            # SAME op order/dtypes as the device-side _dequant (cast THEN
            # multiply) so mesh and single-chip runs see bitwise-identical
            # features
            feats = (batch.feats.values.astype(feat_dt)
                     * batch.feats.scales[:, None, None].astype(feat_dt))
        elif (np.asarray(batch.feats).dtype == np.uint8
              and np.asarray(batch.feats).ndim == 4):
            # raw images: ship uint8 (3 bytes/pixel over the wire) and
            # featurize on device after placement (below)
            feats = np.asarray(batch.feats)
        else:
            feats = np.asarray(batch.feats).astype(feat_dt)
        tokens = np.asarray(batch.tokens, np.int32)
        if max_t is not None and max_t < tokens.shape[1]:
            # length-bucket truncation (exact — scan steps past the last
            # token are dead; the reference runs to torch.max(x_len),
            # Ours_SS/...lua:448-450)
            tokens = tokens[:, :max_t]
        arrays = {
            "tokens": tokens,
            "lengths": np.asarray(batch.lengths, np.int32),
            "feats": feats,
        }
        if batch.labels is not None:
            arrays["labels"] = np.asarray(batch.labels, np.int32)
        if self.mesh is not None:
            n_data = int(self.mesh.shape.get("data", 1))
            b = next(iter(arrays.values())).shape[0]
            if b % n_data:
                raise ValueError(
                    f"batch size {b} not divisible by the mesh 'data' axis "
                    f"({n_data}): pick a divisible batch_size / "
                    f"test_batch_size (this JAX build rejects uneven "
                    f"shardings); the eval sweep pads automatically via "
                    f"_pad_batch_for_mesh")

        is_images = arrays["feats"].dtype == np.uint8

        def run_featurize(feats_dev):
            # featurize=False leaves a uint8 image batch raw — the
            # fine-tuning train step (tcfg.train_backbone) runs the
            # backbone INSIDE the differentiated program
            if not is_images or not featurize:
                return feats_dev
            if self.backbone is None or self.bb_params is None:
                raise ValueError(
                    "image batches need a visual backbone: pass "
                    "Trainer(backbone=..., bb_params=...)")
            if self._featurize is None:
                from rau_vqa_tpu.models.pipeline import extract_features
                # bb as a jit ARGUMENT (not a baked constant): under
                # fine-tuning the eval sweep must see the CURRENT trained
                # backbone, and device-resident args avoid per-dispatch
                # re-staging (CLAUDE.md dtype/jit-args discipline).
                # feat_norm must MATCH the interface the head was trained
                # on — honored regardless of train_backbone, because
                # standalone eval of a fine-tuned snapshot (cmd_eval
                # adopts backbone_feat_norm from the snapshot meta) runs
                # with train_backbone=False but still featurizes here.
                fn = bool(getattr(self.tcfg, "backbone_feat_norm", False))
                self._featurize = jax.jit(
                    lambda bb, imgs, _dt=feat_dt, _fn=fn: extract_features(
                        self.backbone, bb, imgs, vit_cfg=self.vit_cfg,
                        feat_norm=_fn).astype(_dt))
            return self._featurize(self._bb_tree(), feats_dev)

        if self.mesh is not None:
            from rau_vqa_tpu.parallel.mesh import shard_batch
            if jax.process_count() > 1:
                # host-sharded input: every process sees the same (counter-
                # seeded, deterministic) batch stream but materializes only
                # its own slice on device; shard_batch assembles the global
                # array from the per-process shards
                np_, pid = jax.process_count(), jax.process_index()
                # slice each array by ITS OWN length: under image-grouped
                # fine-tuning the feats array carries B//g unique images
                # while tokens carry B questions (group alignment is
                # validated in __init__, so the slices stay consistent)
                for k, v in arrays.items():
                    if v.shape[0] % np_:
                        raise ValueError(
                            f"global batch dim {v.shape[0]} ({k}) not "
                            f"divisible by {np_} processes")
                arrays = {
                    k: v[pid * (v.shape[0] // np_):
                         (pid + 1) * (v.shape[0] // np_)]
                    for k, v in arrays.items()}
            vals = shard_batch(self.mesh, *arrays.values())
            out = dict(zip(arrays.keys(), vals))
            out["feats"] = run_featurize(out["feats"])
            return out
        out = {k: jnp.asarray(v) for k, v in arrays.items()}
        out["feats"] = run_featurize(out["feats"])
        return out

    # ------------------------------------------------------------------
    def _pad_batch_to(self, batch, target_b: int):
        """Pad a batch's leading dim to target_b by repeating the last
        example (exact: callers slice the padded answers away before
        accumulation)."""
        orig_b = len(batch.qids)
        pad = target_b - orig_b
        if pad <= 0:
            return batch

        def p(a):
            if a is None:
                return None
            return np.concatenate([a, np.repeat(a[-1:], pad, axis=0)],
                                  axis=0)

        from rau_vqa_tpu.data.features import QuantFeats
        feats = batch.feats
        if isinstance(feats, QuantFeats):
            feats = QuantFeats(values=p(feats.values),
                               scales=p(feats.scales))
        else:
            feats = p(np.asarray(feats))
        return dataclasses.replace(
            batch, feats=feats, tokens=p(batch.tokens),
            lengths=p(batch.lengths), labels=p(batch.labels),
            mc_answers=p(batch.mc_answers), qids=p(batch.qids))

    def _pad_batch_for_mesh(self, batch):
        """Pad an eval batch's leading dim to the mesh 'data'-axis multiple
        (the reference's odd test batch sizes — 83/57 — don't divide
        meshes).  Returns (batch, orig_B)."""
        orig_b = len(batch.qids)
        if self.mesh is None:
            return batch, orig_b
        n_data = int(self.mesh.shape.get("data", 1))
        return self._pad_batch_to(batch, orig_b + (-orig_b) % n_data), orig_b

    # ------------------------------------------------------------------
    def train_epoch(self) -> Dict[str, float]:
        """One epoch over the train split; returns averaged metrics.

        A loss explosion ABORTS the epoch: the guard restored an
        epoch-boundary state (checkpoint or initial) whose counter-seeded
        data order was fast-forwarded by restore(), so continuing the
        current half-consumed permutation would replay/skip examples and
        desync the order stream from the epoch counter.  The caller's next
        train_epoch() re-runs a clean epoch from the restored state."""
        epoch_1based = self.epoch + 1
        hop_scale = self._hop_scale(epoch_1based)
        sums: Dict[str, np.ndarray] = {}
        n_steps = 0
        exploded = 0
        aborted = False
        # host-side step counter: reading self.state.step in consume()
        # would sync on the NEWEST in-flight dispatch and misattribute the
        # printed metrics (they belong to the previous step)
        step_base = int(self.state.step)
        t0 = time.time()

        def consume(step_id: int, metrics) -> None:
            """Host-side bookkeeping for a finished step (guard, prints,
            metric sums).  Called one step BEHIND the dispatch so reading
            metrics never stalls the device pipeline."""
            nonlocal n_steps, exploded, aborted
            # ONE host sync for every buffer: per-key float()/np.asarray()
            # would pay ~14 serial device->host round-trips per step on
            # the ~30 ms-RTT tunnel
            metrics = jax.device_get(metrics)
            loss = float(metrics["loss"])
            if not self._guard(loss):
                exploded += 1
                aborted = True
                return
            n_steps += 1
            if (self.tcfg.print_interval
                    and n_steps % self.tcfg.print_interval == 0):
                print(f"it {step_id} (epoch {epoch_1based}) "
                      f"loss={loss:.5f} lr={self.lr:.2e} "
                      f"mult_lr={self.mult_lr:.2e} "
                      f"[grad] E:{float(metrics['grad_norm_embed']):.4f} "
                      f"R:{float(metrics['grad_norm_rnn']):.4f} "
                      f"M:{float(metrics['grad_norm_mult']):.4f}"
                      + (f" B:{float(metrics['grad_norm_backbone']):.4f}"
                         if "grad_norm_backbone" in metrics else ""),
                      flush=True)
            for k in ("loss", "uni_loss", "select_loss", "uni_acc",
                      "select_acc", "any_correct_ratio", "grad_norm_embed",
                      "grad_norm_rnn", "grad_norm_mult",
                      "grad_norm_backbone"):
                if k in metrics:
                    sums[k] = sums.get(k, 0.0) + float(metrics[k])
            for k in ("ce_per_hop", "acc_per_hop", "do_pred_loss",
                      "do_pred_acc_num", "do_pred_acc_den"):
                v = np.asarray(metrics[k])
                sums[k] = sums.get(k, np.zeros_like(v, np.float64)) + v

        pending = None
        dispatched = 0
        # image-grouped fine-tuning: the loader fetches each batch's
        # UNIQUE images only (rows are g-consecutive under 'imggroup';
        # the step repeats features after the backbone) — no decode or
        # host copy of the g-1 duplicate rows
        for batch in self.data.train_data.batches(
                self.source, image_stride=self.img_repeat):
            dev = self._put_batch(
                batch, max_t=self._bucket_t(self._train_ladder,
                                            batch.lengths),
                # fine-tuning: raw uint8 images go INTO the train step
                featurize=not self.train_backbone)
            self.state, metrics = self.train_step(
                self.state, dev["tokens"], dev["lengths"], dev["feats"],
                dev["labels"], hop_scale,
                jnp.float32(self.lr), jnp.float32(self.mult_lr))
            dispatched += 1
            if pending is not None:
                consume(step_base + dispatched - 1, pending)
                if aborted:
                    # the in-flight step's result is moot: its input state
                    # was discarded by the restore
                    pending = None
                    break
            pending = metrics
        if pending is not None and not aborted:
            consume(step_base + dispatched, pending)
        dt = time.time() - t0
        if aborted:
            # re-apply the order fast-forward AFTER the generator closed:
            # breaking out of batches() ran its finally-rewind, which
            # restored the PRE-abort mid-epoch order snapshot over the
            # state restore()/the fallback expect (half-consumed
            # permutation + stale reorder_count).  reorder() is a pure
            # function of (seed, reorder_count), so this realigns the
            # stream with the restored epoch counter exactly.
            td = self.data.train_data
            td.reorder_count = self.epoch
            td.reorder()
            # restore() already rewound epoch/lr; this epoch did not
            # happen (don't bump the counter or decay the LR)
            record = {"epoch": self.epoch, "steps": n_steps,
                      "exploded": exploded, "aborted": True, "sec": dt}
            if jax.process_index() == 0:
                self.logger.log(record, kind="train")
            return record
        self.epoch += 1
        self._abort_streak = 0          # a completed epoch clears the guard
        out = {k: v / max(n_steps, 1) for k, v in sums.items()}
        record = {"epoch": self.epoch, "lr": self.lr, "mult_lr": self.mult_lr,
                  "steps": n_steps, "exploded": exploded, "sec": dt,
                  "examples_per_sec": n_steps * self.tcfg.batch_size / max(dt, 1e-9)}
        record.update(per_hop_record({
            "trainloss": out.get("ce_per_hop", []),
            "trainacc": out.get("acc_per_hop", []),
            "do_pred_loss": out.get("do_pred_loss", []),
            # gated do_pred accuracy (the reference's per-iteration
            # do_pred print, Ours_SS/...lua:551-557): correct-answer
            # steps where the confidence head fired / correct-answer steps
            "do_pred_acc": (sums.get("do_pred_acc_num", np.zeros(1))
                            / max(float(sums.get("do_pred_acc_den", 0.0)),
                                  1e-9)),
            # which hops carried gradient this epoch (the reference's
            # cmploss_XX columns, Ours_Full/...lua:1137-1143)
            "cmploss": (np.asarray(hop_scale) > 0).astype(np.float64),
        }))
        for k in ("loss", "uni_loss", "select_loss", "uni_acc", "select_acc",
                  "any_correct_ratio",
                  "grad_norm_embed", "grad_norm_rnn", "grad_norm_mult",
                  "grad_norm_backbone"):
            if k in out:
                record[k] = out[k]
        if jax.process_index() == 0:   # one writer in multi-process runs
            self.logger.log(record, kind="train")

        # exponential LR decay per epoch (reference :1211-1220)
        if (self.tcfg.lr_decay < 1.0
                and self.epoch % self.tcfg.lr_decay_interval == 0):
            self.lr *= self.tcfg.lr_decay
            self.mult_lr *= self.tcfg.mult_lr_decay
        return record

    # ------------------------------------------------------------------
    def _guard(self, loss: float) -> bool:
        """Loss-explosion guard: reject the step (restore last checkpoint)
        when loss is non-finite or > threshold x EMA.  Evaluated one step
        behind the dispatch (pipelined train loop), so the restore also
        discards the one in-flight step — both are rebuilt from the
        checkpoint."""
        thresh = self.tcfg.loss_explode_threshold
        bad = not math.isfinite(loss) or (
            self.loss_ema is not None and thresh > 0
            and loss > thresh * max(self.loss_ema, 1e-6))
        if bad:
            path = latest_checkpoint(self.ckpt_dir)
            if jax.process_count() > 1:
                # the restore decision must be uniform across processes —
                # loss is replicated, but checkpoint FILES may only exist
                # on the writer's host.  Divergent restores would leave
                # "replicated" params differing per process (silent SPMD
                # corruption), so fail loudly instead.
                from jax.experimental import multihost_utils
                have = multihost_utils.process_allgather(
                    np.int32(path is not None))
                if int(have.min()) != int(have.max()):
                    raise RuntimeError(
                        "loss-explosion restore needs the checkpoint dir "
                        "on a SHARED filesystem: some processes see "
                        f"{self.ckpt_dir!r}, others don't")
            if path is not None:
                self.restore(path)
            else:
                # no checkpoint yet: fall back to the initial state held on
                # host, so the poisoned update is never kept
                state = jax.tree.map(jnp.asarray, self._fallback_state)
                if self.mesh is not None:
                    from rau_vqa_tpu.parallel.mesh import place_state
                    state = place_state(self.mesh, state,
                                        tp=self.exp.mesh.shard_params_tp)
                self.state = state
                # the EMA tracked the poisoned run's (lower) losses; the
                # restored INITIAL params produce init-scale losses again.
                # Keeping the stale EMA would trip the guard on the next
                # epoch's first step, restore-to-init again, and livelock
                # every remaining epoch into a 2-step no-op.
                self.loss_ema = None
                # the fallback rewinds PARAMS to init: epoch/LR must
                # rewind with them, or the fresh params train under a
                # decayed LR and a mid-curriculum hop_grad_scale (hops
                # whose stop epoch already passed would never train)
                self.epoch = 0
                self.lr = self.tcfg.learning_rate
                self.mult_lr = self.tcfg.mult_learning_rate
            # a DETERMINISTIC divergence would replay bit-identically
            # from the restored state (same params, rng, data order) and
            # re-explode at the same step, burning every remaining epoch
            # as a silent abort loop.  Perturb the retry's RNG (grad
            # noise + dropout draws change; the epoch-seeded data order
            # is realigned by train_epoch and stays exact), and fail
            # loudly once retries stop helping — the guard exists for
            # TRANSIENT faults, not a genuinely divergent recipe.
            self._abort_streak += 1
            if self._abort_streak >= 3:
                raise RuntimeError(
                    f"loss exploded {self._abort_streak} consecutive "
                    f"epochs even after checkpoint restore + RNG "
                    f"perturbation (last loss {loss:g}, ema "
                    f"{self.loss_ema}) — the divergence is deterministic "
                    f"(learning rate / data), not transient; aborting "
                    f"instead of burning the remaining epochs")
            self.state = self.state._replace(
                rng=jax.random.fold_in(self.state.rng, self._abort_streak))
            return False
        self.loss_ema = loss if self.loss_ema is None else (
            0.9 * self.loss_ema + 0.1 * loss)
        return True

    # ------------------------------------------------------------------
    def evaluate(self, *, write_submissions: bool = True,
                 return_rows: bool = False) -> Dict[str, Any]:
        """Full test sweep producing the nHop+2 answer sets; writes OE/MC
        submission files and computes fast-val accuracy when GT is available
        (reference :851-1207)."""
        test = self.data.test_data
        test.inorder()
        H2 = self.mcfg.n_hops + 2
        oe_chunks, mc_chunks, qid_chunks = [], [], []
        n_eval_batches = (test.iter_per_epoch
                          + (1 if test.num_examples % test.batch_size else 0))
        visatt_left = (self.exp.visatt_batches if self.exp.visatt_batches >= 0
                       else n_eval_batches)
        # include_tail: any test_batch_size covers the whole split — the
        # final partial batch is padded (below) to the full batch size so
        # the compiled predict_step shape is reused, and the padded answers
        # are sliced away.  The reference instead requires a divisor
        # (Ours_SS/...lua:85-95).
        for batch in test.batches(self.source, include_tail=True):
            # _put_batch ships features in compute_dtype (halving bytes in
            # bf16 mode, same as the train path), truncates the token axis
            # to the batch's eval bucket (host-side: max over the GLOBAL
            # pre-shard lengths, so no device sync and every process picks
            # the same compiled shape), and shards on the mesh; mesh
            # batches pad to the 'data'-axis multiple (the reference's odd
            # test batch sizes — 83/57 — don't divide meshes) and the
            # padded tail is sliced away below
            orig_b = len(batch.qids)
            padded = self._pad_batch_to(batch, test.batch_size)
            padded, _ = self._pad_batch_for_mesh(padded)
            dev = self._put_batch(
                padded, max_t=self._bucket_t(self._eval_ladder,
                                             padded.lengths))
            tab_pred, tab_att = self.predict_step(
                self._head_params(), dev["tokens"], dev["lengths"],
                dev["feats"])
            tab_pred = tab_pred[:, :orig_b]
            tab_att = tab_att[:, :orig_b]
            if self.exp.visatt and visatt_left > 0:
                # attention PNG dumps (reference dumps EVERY test question
                # per epoch, :926-932; visatt_batches=1 bounds the file
                # count by default, -1 restores reference semantics).
                # Multi-process: tab_att is globally sharded — gather the
                # full array (process_allgather replicates non-fully-
                # addressable inputs) and keep the single-writer rule.
                if jax.process_count() > 1:
                    from jax.experimental import multihost_utils
                    att_np = np.asarray(
                        multihost_utils.process_allgather(tab_att,
                                                          tiled=True))
                else:
                    att_np = np.asarray(tab_att)
                if jax.process_index() == 0:
                    from rau_vqa_tpu.utils.visatt import dump_attention_maps
                    dump_attention_maps(
                        os.path.join(self.workdir, "figures"),
                        float(self.epoch), att_np, batch.qids.tolist(),
                        self.mcfg.cnn_w, self.mcfg.cnn_h)
                visatt_left -= 1
            mc = (None if batch.mc_answers is None
                  else jnp.asarray(batch.mc_answers, jnp.int32))
            oe_ans, mc_ans = compute_answers(tab_pred, mc)
            # keep device arrays; one host sync after the sweep (async
            # dispatch overlaps the next batch's prefetch + forward)
            oe_chunks.append(oe_ans)                      # [H2, B] ids
            if mc_ans is not None:
                mc_chunks.append(mc_ans)
            qid_chunks.append(batch.qids)
        if jax.process_count() > 1:
            # sharded outputs are only partially addressable per process:
            # assemble the global answer arrays across hosts
            from jax.experimental import multihost_utils
            oe_chunks = [np.asarray(multihost_utils.process_allgather(
                x, tiled=True)) for x in oe_chunks]
            mc_chunks = [np.asarray(multihost_utils.process_allgather(
                x, tiled=True)) for x in mc_chunks]
        else:
            oe_chunks = [np.asarray(x) for x in oe_chunks]
            mc_chunks = [np.asarray(x) for x in mc_chunks]

        # vectorized id->string mapping + row building (the reference builds
        # each row in a Lua loop, :903-913 — SURVEY.md hot-loop #4)
        qids = np.concatenate(qid_chunks)
        answer_arr = np.asarray(self.data.answers, dtype=object)
        oe_ids = np.concatenate(oe_chunks, axis=1)        # [H2, N]
        oe_strs = answer_arr[oe_ids]
        mc_strs = None
        if mc_chunks:
            mc_strs = answer_arr[np.concatenate(mc_chunks, axis=1)]

        def make_rows(strs_h):
            return [{"answer": a, "question_id": int(q)}
                    for a, q in zip(strs_h, qids)]

        epoch_f = float(self.epoch)
        result: Dict[str, Any] = {"epoch": epoch_f}
        rows_oe = [make_rows(oe_strs[h]) for h in range(H2)]
        rows_mc = ([make_rows(mc_strs[h]) for h in range(H2)]
                   if mc_strs is not None else [[]] * H2)
        if write_submissions and jax.process_index() == 0:
            # one writer in multi-process runs (files are per-run artifacts)
            write_results(self.workdir, "OpenEnded", self.exp.data.split,
                          self.exp.alg_name, epoch_f, rows_oe)
            if rows_mc[0]:
                write_results(self.workdir, "MultipleChoice",
                              self.exp.data.split, self.exp.alg_name,
                              epoch_f, rows_mc)
        if self.gt_anno is not None:
            # vectorized fast validation (reference :914-925)
            missing = [q for q in qids if int(q) not in self.gt_anno]
            if missing:
                raise KeyError(
                    f"fast validation: {len(missing)} question ids not in "
                    f"GT map (first: {missing[0]})")
            gt = np.asarray([self.gt_anno[int(q)] for q in qids],
                            dtype=object)
            result["testOEacc"] = [float((oe_strs[h] == gt).mean())
                                   for h in range(H2)]
            if mc_strs is not None:
                result["testMCacc"] = [float((mc_strs[h] == gt).mean())
                                       for h in range(H2)]
        if self.official_anno:
            # the official 10-rater consensus metric (the eval server's),
            # computed locally per hop — annotations digested once
            if self._official_scorer is None:
                import json

                from rau_vqa_tpu.eval.vqa_accuracy import VQAAccuracyScorer
                with open(self.official_anno) as f:
                    # precision=6: the metric logs as a fraction next to
                    # testOEacc; the CLI report's 2-decimal rounding would
                    # be visible noise at this scale
                    self._official_scorer = VQAAccuracyScorer(
                        json.load(f), precision=6)
            sc = self._official_scorer
            # stored as fractions like testOEacc (CLI `vqa-accuracy`
            # prints the percentage report with type breakdowns)
            oe_reps = [sc.score(rows_oe[h]) for h in range(H2)]
            result["testOEaccOfficial"] = [r["overall"] / 100.0
                                           for r in oe_reps]
            if oe_reps[0]["missing"] and not self._warned_partial_official:
                self._warned_partial_official = True
                import warnings
                warnings.warn(
                    f"official annotations cover only {oe_reps[0]['n']} of "
                    f"{oe_reps[0]['n'] + oe_reps[0]['missing']} evaluated "
                    f"questions — testOEaccOfficial averages that subset, "
                    f"NOT the split testOEacc covers", stacklevel=2)
            if mc_strs is not None:
                result["testMCaccOfficial"] = [
                    sc.score(rows_mc[h])["overall"] / 100.0
                    for h in range(H2)]
        if len(result) > 1 and jax.process_index() == 0:
            self.logger.log(
                {"epoch": epoch_f,
                 **per_hop_record({k: v for k, v in result.items()
                                   if k != "epoch"})},
                kind="test")
        if return_rows:
            # the released-checkpoint parity harness diffs these against the
            # result JSONs inside a reference tarball (eval/released.py)
            result["rows_oe"] = rows_oe
            result["rows_mc"] = rows_mc if mc_strs is not None else None
        return result

    # ------------------------------------------------------------------
    def save(self, *, background: bool = False) -> str:
        """Write a snapshot; ``background=True`` (single-process only)
        gathers device→host synchronously but moves serialization + disk
        IO to a writer thread so the train loop keeps dispatching.  The
        explosion guard and end-of-fit flush pending writes via
        ``latest_checkpoint`` / ``flush_checkpoint_writes``."""
        tree = self.state._asdict()
        if jax.process_count() > 1:
            # multi-process: (a) other hosts poll the shared filesystem for
            # the snapshot (explosion-guard uniformity check), so an async
            # write would widen that visibility race — stay synchronous;
            # (b) TP-sharded leaves span hosts (not fully addressable from
            # the writer), so gather them COLLECTIVELY — every process
            # must participate — before the single writer serializes
            background = False
            from jax.experimental import multihost_utils

            def fetch(x):
                if isinstance(x, jax.Array) and not x.is_fully_addressable:
                    # tiled=True is REQUIRED for global arrays: it means
                    # "assemble the global value" (TP-sharded and
                    # replicated-across-hosts leaves both land here); the
                    # default tiled=False stacks a new leading axis and
                    # raises for non-fully-addressable inputs
                    return np.asarray(
                        multihost_utils.process_allgather(x, tiled=True))
                return np.asarray(x)

            tree = jax.tree.map(fetch, tree)
        if jax.process_index() != 0:
            # one writer (post-gather: the full state is host-local here)
            return ""
        step = int(self.state.step)
        return save_checkpoint(
            self.ckpt_dir, step, float(self.epoch), tree,
            background=background,
            keep_last=self.tcfg.keep_last_checkpoints or None,
            extra={"lr": self.lr, "mult_lr": self.mult_lr,
                   "loss_ema": self.loss_ema,
                   "preset": self.exp.name, "alg_name": self.exp.alg_name,
                   "n_hops": self.mcfg.n_hops,
                   # fine-tuning snapshots carry the 4th param group; the
                   # backbone kind tells convert/serve tooling what it is
                   "train_backbone": self.train_backbone,
                   "backbone": self.backbone if self.train_backbone
                   else None,
                   # the interface the head actually trained on — honored
                   # by the featurize gate regardless of train_backbone
                   # (head-only training on a frozen RMS backbone must
                   # still self-describe as RMS, or standalone eval/serve
                   # adopt False and featurize raw)
                   "backbone_feat_norm": bool(
                       getattr(self.tcfg, "backbone_feat_norm", False)),
                   # self-describing snapshot: standalone eval adopts this
                   # (the reference's Eval.lua adopts the snapshot's opt
                   # table, Eval.lua:116-118)
                   "model_config": dataclasses.asdict(self.mcfg)})

    def restore(self, path: str) -> None:
        template = self.state._asdict()
        if self.train_backbone:
            # warm-start support: restoring a HEAD-ONLY snapshot (from a
            # precomputed-features run) into a fine-tuning state keeps the
            # current pretrained backbone group + fresh Adam moments and
            # restores just the three head groups — the natural two-phase
            # recipe (train head frozen, then unfreeze).  Peek at the
            # stored groups to pick the template; a 4-group snapshot
            # restores everything including the trained backbone.
            from flax import serialization
            with open(path, "rb") as f:
                raw = serialization.msgpack_restore(f.read())
            if "backbone" not in raw.get("params", {}):
                from rau_vqa_tpu.utils.checkpoint import validate_tree_shapes
                head_t = {
                    **template,
                    "params": {g: template["params"][g]
                               for g in PARAM_GROUPS},
                    "opt": {g: template["opt"][g] for g in PARAM_GROUPS},
                }
                tree = serialization.from_state_dict(head_t, raw)
                validate_tree_shapes(head_t, tree)
                tree["params"]["backbone"] = template["params"]["backbone"]
                tree["opt"]["backbone"] = template["opt"]["backbone"]
                # a warm start is a NEW training phase, not a resume: the
                # head snapshot's meta carries the FINISHED frozen run's
                # fully-decayed lr (base*0.9^N), epoch counter and
                # loss_ema — adopting them would fine-tune at ~1% LR and
                # clobber CLI --learning-rate overrides.  Keep this
                # trainer's fresh lr/epoch/order; restore weights only.
                meta = {}
                # the frozen run's step/rng also belong to the old phase
                tree["step"] = template["step"]
                tree["rng"] = template["rng"]
            else:
                # `raw` is already the decoded msgpack: from_state_dict
                # here instead of load_checkpoint's second read+decode of
                # the multi-hundred-MB 4-group file (2x peak host RAM;
                # this path also runs on every explosion-guard restore)
                from rau_vqa_tpu.utils.checkpoint import (
                    checkpoint_meta,
                    validate_tree_shapes,
                )
                tree = serialization.from_state_dict(template, raw)
                validate_tree_shapes(template, tree)
                meta = checkpoint_meta(path)
        else:
            tree, meta = load_checkpoint(path, template)
        self.state = TrainState(**tree)
        if self.mesh is not None:
            from rau_vqa_tpu.parallel.mesh import place_state
            self.state = place_state(self.mesh, self.state,
                                     tp=self.exp.mesh.shard_params_tp)
        else:
            # flax from_bytes hands back NUMPY leaves; device_put once or
            # a restore-then-eval run re-uploads the full model on every
            # eval batch (numpy jit args are re-staged per dispatch —
            # ~780 ms each through the rig tunnel, bench_serve decompose)
            self.state = jax.device_put(self.state)
        if "lr" in meta:
            self.lr = meta["lr"]
            self.mult_lr = meta["mult_lr"]
        if meta.get("loss_ema") is not None:
            self.loss_ema = meta["loss_ema"]
        if "epoch" in meta:
            self.epoch = int(meta["epoch"])
            # fast-forward the epoch-order stream so the resumed run sees the
            # exact batch order of an uninterrupted one (reorder streams are
            # counter-seeded, data/loader.py)
            td = self.data.train_data
            td.reorder_count = self.epoch
            td.reorder()

    # ------------------------------------------------------------------
    def fit(self, epochs: Optional[int] = None, *,
            eval_each: Optional[bool] = None) -> Dict[str, Any]:
        epochs = epochs or self.tcfg.max_epochs
        eval_each = (self.tcfg.test_interval > 0
                     if eval_each is None else eval_each)
        last_eval: Dict[str, Any] = {}
        raised = False
        try:
            for i in range(epochs):
                if i == 0 and self.exp.profile_dir:
                    with jax.profiler.trace(self.exp.profile_dir):
                        record = self.train_epoch()
                else:
                    record = self.train_epoch()
                if record.get("aborted"):
                    # the epoch was rewound to a state already evaluated /
                    # checkpointed at its own boundary: re-running eval on
                    # identical params would waste a full test sweep and
                    # write duplicate same-epoch log rows
                    continue
                if (eval_each and self.tcfg.test_interval > 0
                        and self.epoch % self.tcfg.test_interval == 0):
                    last_eval = self.evaluate()
                if (self.tcfg.checkpoint_interval > 0
                        and self.epoch % self.tcfg.checkpoint_interval == 0):
                    self.save(background=True)
                if (self.exp.graph_interval > 0
                        and self.epoch % self.exp.graph_interval == 0):
                    from rau_vqa_tpu.utils.plots import render_curves
                    render_curves(
                        os.path.join(self.workdir, "training_log"),
                        os.path.join(self.workdir, "graphs"),
                        self.mcfg.n_hops)
        except BaseException:
            raised = True
            raise
        finally:
            # all periodic snapshots are durable (and write errors
            # surfaced) even when an epoch raises mid-loop — but a flush
            # error must not REPLACE an in-flight training exception (the
            # primary failure automation matches on).  An explicit flag,
            # not sys.exc_info(): that would also see exceptions being
            # HANDLED anywhere up the caller's stack and silently demote
            # a real flush failure to a warning.
            from rau_vqa_tpu.utils.checkpoint import (
                flush_checkpoint_writes,
            )
            if not raised:
                flush_checkpoint_writes()
            else:
                try:
                    flush_checkpoint_writes()
                except Exception as e:
                    import warnings
                    warnings.warn(
                        f"background checkpoint write also failed while "
                        f"unwinding a training error: {e!r}")
        return last_eval
