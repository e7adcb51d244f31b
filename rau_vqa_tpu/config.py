"""Experiment configuration for rau_vqa_tpu.

The reference scatters ~35 CLI flags plus in-body constants across four nearly
identical scripts (Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:17-80, dims at
:202-228, early-stop tables at Ours_Full/...lua:414-429).  Here every knob is a
field on a frozen dataclass, and the four experiments of the paper's Table 1
are presets (reference: experiments/README.md:5, behavioural deltas diffed in
SURVEY.md §2c).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters.

    Defaults mirror the in-body constants of the reference
    (Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:202-228).
    """

    vocab_size: int = 12605          # includes ZEROPAD at index 0
    answer_size: int = 1000          # netout_dim (reference :222)
    seq_len: int = 26                # max question length (h5 contract)

    embed_dim: int = 200             # word embedding (reference :202)
    rnn_size: int = 512              # question DeepLSTM hidden (reference :209)
    rnn_layers: int = 2              # question DeepLSTM depth (reference :210)
    rnn_dropout: float = 0.5         # inter-layer dropout (reference :211)
    embed_dropout: float = 0.5       # word-embed dropout (reference :205)

    cnn_dim: int = 512               # cnnout_dim: 512 VGG pool5 / 2048 ResNet (:216)
    cnn_w: int = 14                  # cnnout_w (run scripts pass 14)
    cnn_h: int = 14                  # cnnout_h
    multfeat_dim: int = 512          # multimodal feature dim (reference :220)
    attfeat_dim: int = 256           # attention hidden dim (reference :221)

    att_rnn_size: int = 512          # answering-unit LSTM hidden (reference :225)
    att_rnn_layers: int = 1          # answering-unit LSTM depth (reference :226)
    att_rnn_dropout: float = 0.0     # answering-unit LSTM dropout (reference :227)
    mult_dropout: float = 0.5        # dropout on q-proj input / merge feat (:233,:239,:277)

    n_hops: int = 1                  # number of recurrent answering units (-nhop)

    # numerics: params live in param_dtype; matmuls may run in compute_dtype.
    # matmul_precision: 'highest' = full f32 (parity/tests); 'default' lets
    # the MXU run bf16 passes (fast path; combine with compute_dtype bf16).
    param_dtype: str = "float32"
    compute_dtype: str = "float32"
    matmul_precision: str = "highest"

    # run the training hop loop through the fused Pallas custom-VJP kernel
    # pair (ops/rau_train_hops.py): feats + weights stay VMEM-resident across
    # all hops in fwd AND bwd, dropout masks regenerate in-kernel.  Off-TPU
    # this selects the numerically identical pure-XLA reference path.
    fused_train: bool = False
    # batch tile for the fused training kernels (B must divide by it)
    fused_train_block: int = 16
    # forward implementation for the fused path on TPU: "pallas" runs the
    # fused kernel, "reference" runs the numerically identical mask-exact
    # XLA path (useful for isolating kernel cost; always used off-TPU)
    fused_train_impl: str = "pallas"
    # backward implementation for the fused path: "xla" rematerializes the
    # hop loop through the mask-exact XLA core (default — the in-kernel
    # backward is interpreter-verified but its Mosaic compile is
    # pathological on this toolchain, docs/mosaic_notes.md #6); "kernel"
    # uses the Pallas backward kernel.
    fused_train_bwd: str = "xla"

    # rematerialize each answering-unit hop in the backward pass
    # (jax.checkpoint): trades ~1x extra hop-forward FLOPs for not saving the
    # 8x [B, S, M]-sized per-hop activations — the training analogue of the
    # reference clone-army keeping every clone's output alive
    # (Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:343-347, :478-596)
    remat_hops: bool = False

    @property
    def rnnout_dim(self) -> int:
        # packed (c, h) pairs for every layer (DeepLSTM.lua:22-25)
        return 2 * self.rnn_size * self.rnn_layers

    @property
    def att_state_dim(self) -> int:
        return self.att_rnn_size * self.att_rnn_layers

    @property
    def cnn_spat(self) -> int:
        return self.cnn_w * self.cnn_h


@dataclass(frozen=True)
class TrainConfig:
    """Optimization hyper-parameters (reference :39-55, :769-775, :1211-1220)."""

    optim: str = "adam"
    batch_size: int = 100
    max_epochs: int = 50
    learning_rate: float = 3e-3       # embed + rnn groups
    mult_learning_rate: float = 3e-4  # multimodal group
    lr_decay: float = 0.9             # per-epoch exponential decay, both LRs
    mult_lr_decay: float = 0.9
    lr_decay_interval: int = 1        # in epochs
    grad_clip: float = 0.1            # per-group L2 norm clip (reference :607-629)
    noisy_eta: float = 0.01           # gradient noise (reference :54, :597-605)
    noisy_gamma: float = 0.55
    seed: int = 123
    # Adam internals (optim_updates.lua:59-62)
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    # SS scales each hop's CE gradient by nHop (Ours_SS/...lua:569); MS/Full drop it
    hop_grad_scale_nhop: bool = False
    # Full/ResNet per-hop early-stop curriculum: hop h's CE gradient is zeroed
    # once epoch >= stop_timing[h] (Ours_Full/...lua:414-429, :586-589).
    # None => no curriculum (SS, MS).  Length must be >= n_hops when set.
    hop_stop_timing: Optional[Tuple[int, ...]] = None
    # Gradient accumulation: k sequential microbatch backward passes per
    # optimizer update (exact — every loss term is a batch mean; see
    # trainer.make_train_step).  1 disables; batch_size must divide by k.
    grad_accum: int = 1
    # real loss-explosion guard (the reference declares -loss_explod_threshold
    # but never reads it, Ours_SS/...lua:29 — we wire it up for real)
    loss_explode_threshold: float = 3.0
    # Sequence-length buckets for the TRAIN step: each batch's token axis is
    # truncated to the smallest bucket covering its max question length —
    # the reference's own forward runs only to torch.max(x_len)
    # (Ours_SS/...lua:448-450).  EXACT: scan steps past every question's
    # last token are discarded by the last-token gather and carry zero
    # gradient (pinned by tests/test_train.py grad-parity).  One compiled
    # executable per bucket (+ full seq_len); () disables truncation.
    length_buckets: Tuple[int, ...] = (8, 16)
    # Backbone fine-tuning: the visual backbone becomes a 4th parameter
    # group ("backbone") and gradients flow through the pixels — a
    # capability the reference fundamentally lacks (its features come from
    # a frozen external extractor, data/get_*.sh; the training scripts
    # never see an image).  Requires an image data source (--image-root).
    train_backbone: bool = False
    # backbone LR = learning_rate * this scale; it then follows the same
    # per-epoch exponential decay as the embed/rnn groups (standard
    # fine-tuning practice: pretrained weights move slower than the
    # scratch-initialized head)
    backbone_lr_scale: float = 0.1
    # blockwise jax.checkpoint inside the backbone forward: the backward
    # keeps only block-boundary activations (values and gradients
    # identical — tests/test_finetune.py remat parity).  Measured: when
    # activations FIT in HBM, no-remat is ~5-9% faster (ResNet-101-448,
    # BASELINE.md fine-tuning table) — True stays the default because it
    # works at any batch; flip with --no-backbone-remat when B is modest.
    backbone_remat: bool = True
    # annealed gradient noise on the backbone group: the reference's
    # noise schedule (:597-605) regularizes its scratch-trained head;
    # injecting it into pretrained conv weights is off by default
    backbone_grad_noise: bool = False
    # LARS/LAMB-style per-leaf update cap for the backbone group:
    # ||update|| <= tau * (||leaf|| + 1e-3) per step.  Guards against the
    # measured coherent-Adam-kick catastrophe: Adam's bias-corrected
    # steps are sign-like (±lr/weight ≈ 1.5% relative), and an
    # input-aligned 1.5%-norm kick amplifies a conv's RESPONSE by up to
    # ~sqrt(fan) x that — one step inflated a random VGG16's pool5 std
    # 57 -> 3247, saturating the reference-pinned stacked-tanh head to
    # an EXACTLY-zero f32 gradient (compound tanh-tail underflow), after
    # which momentum coasts blind.  Measured on the degenerate fixture
    # probe: tau 0.02 and 1e-3 still explode-and-die; 2e-4 trains to
    # 100% (BASELINE.md fine-tuning notes).  0 disables.
    backbone_trust_ratio: float = 2e-4
    # RMS-normalize the backbone/head feature interface (per [b, s] cell
    # over D) during fine-tuning: scale-invariant, so NO backbone drift
    # can saturate the stacked-tanh head into the exactly-zero-gradient
    # regime (BASELINE.md).  Changes the head's input distribution —
    # use for from-scratch-ish backbones (the zero-asset smoke enables
    # it); warm-started heads trained on RAW features should keep False.
    # Recorded in snapshots; the Trainer threads it through eval/serving.
    backbone_feat_norm: bool = False
    test_interval: int = 1            # epochs between eval sweeps
    checkpoint_interval: int = 1      # epochs between checkpoints
    keep_last_checkpoints: int = 0    # 0 = keep all snapshots
    print_interval: int = 0           # steps between stdout lines (0 = off;
                                      # reference -print_iter, :60)


@dataclass(frozen=True)
class DataConfig:
    """Data locations and split selection (reference :31-37, :85-95)."""

    split: str = "val2014"            # [val2014|test2015|test-dev2015|train2014]
    vqa_dir: str = "./data/VQA_prepro/data_train_val"
    feat_dir: str = "./data/vqa_VGG16Conv_pool5_448/feat_448x448"
    gt_anno: str = "./data/VQA_prepro/comprehend/comprehend_val2014_annotations.json"
    official_anno: str = ""           # official VQA annotations JSON: if set,
                                      # eval sweeps also report the official
                                      # 10-rater consensus accuracy
    batch_order: str = "shuffle"      # [shuffle|inorder|sort|randsort] (reference :41)
    test_batch_size: int = 0          # 0 => derive from split like reference :85-95
    prefetch: bool = True
    valid_ratio: float = 0.0

    def resolved_test_batch_size(self) -> int:
        if self.test_batch_size > 0:
            return self.test_batch_size
        # chosen to divide split sizes exactly (reference :85-95)
        return {"val2014": 83, "test2015": 57, "test-dev2015": 96,
                "train2014": 100}[self.split]


@dataclass(frozen=True)
class MeshConfig:
    """Parallelism layout. DP over 'data' is the primary strategy for this
    model size (~20M params); TP over 'model' optionally shards the 1000-way
    classifier and the 4x512 LSTM gate matmuls (SURVEY.md §2d)."""

    enabled: bool = False             # construct a mesh for the Trainer
    data_axis: int = -1               # -1 => all available devices
    model_axis: int = 1
    axis_names: Tuple[str, str] = ("data", "model")
    shard_params_tp: bool = False     # enable TP weight sharding rules


@dataclass(frozen=True)
class ExperimentConfig:
    name: str = "ours_ss"
    alg_name: str = "LstmAttCtrlGradNoiseDontSelectSingleHopBalance448Pool5"
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    save_dir: str = "save_result_vqa"
    # observability (reference VISUALIZATION group, :57-62)
    visatt: bool = False          # dump attention-map PNGs during eval
    # eval batches to dump per epoch: 1 bounds the file count (default);
    # -1 = every test question, the reference's semantics (:926-932)
    visatt_batches: int = 1
    graph_interval: int = 10      # epochs between curve renders (:59)
    profile_dir: str = ""         # non-empty => jax.profiler trace of epoch 1
    fused_eval: bool = False      # fused Pallas kernels in the eval sweep
    # sequence-length buckets for eval/serving dispatch (exact — see
    # eval/predict.py make_predict_step); () = always run full seq_len
    eval_buckets: Tuple[int, ...] = ()

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


# Early-stop tables, 1-indexed by hop in the reference; stored 0-indexed here.
# Ours_Full/LstmAttCtrlGradNoiseDontSelect.lua:414-429
_FULL_STOP_TIMING = (1000, 35, 25, 20, 18, 16, 16, 16, 16, 1000)
# Ours_ResNet/LstmAttCtrlGradNoiseDontSelect.lua:416-427
_RESNET_STOP_TIMING = (1000, 30, 24, 20, 18, 16, 16, 15, 1000, 1000)


def _preset_ss() -> ExperimentConfig:
    return ExperimentConfig(
        name="ours_ss",
        alg_name="LstmAttCtrlGradNoiseDontSelectSingleHopBalance448Pool5",
        model=ModelConfig(n_hops=1, cnn_dim=512, cnn_w=14, cnn_h=14),
        train=TrainConfig(hop_grad_scale_nhop=True),
        data=DataConfig(split="test-dev2015",
                        vqa_dir="./data/VQA_prepro/data_train-val_test-dev"),
    )


def _preset_ms() -> ExperimentConfig:
    return ExperimentConfig(
        name="ours_ms",
        alg_name="LstmAttCtrlGradNoiseDontSelect448Pool5",
        model=ModelConfig(n_hops=8, cnn_dim=512, cnn_w=14, cnn_h=14),
        train=TrainConfig(),
        data=DataConfig(split="test-dev2015",
                        vqa_dir="./data/VQA_prepro/data_train-val_test-dev"),
    )


def _preset_full() -> ExperimentConfig:
    return ExperimentConfig(
        name="ours_full",
        alg_name="LstmAttCtrlGradNoiseDontSelect448Pool5",
        model=ModelConfig(n_hops=8, cnn_dim=512, cnn_w=14, cnn_h=14),
        train=TrainConfig(hop_stop_timing=_FULL_STOP_TIMING),
        data=DataConfig(split="test-dev2015",
                        vqa_dir="./data/VQA_prepro/data_train-val_test-dev"),
    )


def _preset_resnet() -> ExperimentConfig:
    return ExperimentConfig(
        name="ours_resnet",
        alg_name="NIPSFinalResNet101sz448tmin15lambda0dot5",
        model=ModelConfig(n_hops=8, cnn_dim=2048, cnn_w=14, cnn_h=14),
        train=TrainConfig(batch_size=80, hop_stop_timing=_RESNET_STOP_TIMING),
        data=DataConfig(split="test-dev2015",
                        vqa_dir="./data/VQA_prepro/data_train-val_test-dev",
                        feat_dir="./data/vqa_resnet_101_convfeat_448"),
    )


def _preset_resnet_ft() -> ExperimentConfig:
    """Backbone fine-tuning preset — the measured-best end-to-end config
    (BASELINE.md fine-tuning table, 906 q/s trained on v5e): Ours_ResNet
    dims with the ResNet-101 as a trainable 4th parameter group,
    image-grouped batches (one backbone pass per unique image, exact),
    no backbone remat (fits HBM at B=288; the knee), bf16 compute.
    Needs --image-root + --backbone resnet101 + --backbone-state (a .pth
    or a fine-tuned .msgpack); no analogue exists in the reference."""
    return ExperimentConfig(
        name="ours_resnet_ft",
        alg_name="NIPSFinalResNet101sz448FineTune",
        model=ModelConfig(n_hops=8, cnn_dim=2048, cnn_w=14, cnn_h=14,
                          compute_dtype="bfloat16",
                          matmul_precision="default"),
        train=TrainConfig(batch_size=288,
                          hop_stop_timing=_RESNET_STOP_TIMING,
                          train_backbone=True, backbone_remat=False),
        data=DataConfig(split="test-dev2015",
                        vqa_dir="./data/VQA_prepro/data_train-val_test-dev",
                        feat_dir="./data/vqa_resnet_101_convfeat_448",
                        batch_order="imggroup"),
    )


def _preset_vit() -> ExperimentConfig:
    """Stretch config (BASELINE.json configs[4]): ViT-L/14 patch tokens as
    the RAU feature map — 16x16 = 256 spatial cells of dim 1024 at 224px
    input.  Features come from the on-TPU ViT backbone
    (models/backbones/vit.py); the RAU attention is length-agnostic."""
    return ExperimentConfig(
        name="ours_vit",
        alg_name="RauVitL14Stretch",
        model=ModelConfig(n_hops=8, cnn_dim=1024, cnn_w=16, cnn_h=16),
        train=TrainConfig(),
        data=DataConfig(split="val2014"),
    )


PRESETS = {
    "ours_ss": _preset_ss,
    "ours_ms": _preset_ms,
    "ours_full": _preset_full,
    "ours_resnet": _preset_resnet,
    "ours_resnet_ft": _preset_resnet_ft,
    "ours_vit": _preset_vit,
}


def get_preset(name: str) -> ExperimentConfig:
    try:
        return PRESETS[name]()
    except KeyError:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
