"""rau_vqa_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for Recurrent
Answering Units VQA (Noh & Han, arXiv 1606.03647).

This is a from-scratch, TPU-first re-design of the capabilities of the Torch7
reference implementation (HyeonwooNoh/RAU_VQA).  It is NOT a port: the model
is expressed as pure functional JAX over explicit parameter pytrees, the
question LSTM runs as a `lax.scan` with length masking (replacing the
reference's per-timestep module clones, Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:331-347),
the hop loop is a statically unrolled answering-unit step, and the whole
train step compiles to a single XLA program sharded over a `jax.sharding.Mesh`.

Layering (each its own subpackage; the reference's single 1,234-line script is
factored into real layers — see SURVEY.md §1):

- ``rau_vqa_tpu.config``    — experiment presets (ours_ss / ours_ms / ours_full / ours_resnet)
- ``rau_vqa_tpu.models``    — model core: LSTM cells, answering unit, RAU forward
- ``rau_vqa_tpu.ops``       — Pallas TPU kernels + XLA reference ops
- ``rau_vqa_tpu.data``      — VQA prepro data contract, loaders, fixtures
- ``rau_vqa_tpu.train``     — losses, from-scratch optimizers, trainer
- ``rau_vqa_tpu.eval``      — prediction, metrics, VQA submission files
- ``rau_vqa_tpu.parallel``  — device mesh + sharding rules (DP primary, optional TP)
- ``rau_vqa_tpu.utils``     — checkpointing, metrics logging, misc
"""

__version__ = "0.1.0"

from rau_vqa_tpu.config import (  # noqa: F401
    ModelConfig,
    TrainConfig,
    DataConfig,
    ExperimentConfig,
    get_preset,
    PRESETS,
)


def __getattr__(name):  # lazy: keep `import rau_vqa_tpu` light (no jax import)
    if name == "Trainer":
        from rau_vqa_tpu.train.trainer import Trainer
        return Trainer
    if name == "load_vqa_data":
        from rau_vqa_tpu.data.loader import load_vqa_data
        return load_vqa_data
    if name in ("predict", "predict_fused"):
        from rau_vqa_tpu.eval import predict as _p
        return getattr(_p, name)
    if name in ("init_params", "rau_forward"):
        from rau_vqa_tpu.models import rau as _r
        return getattr(_r, name)
    raise AttributeError(f"module 'rau_vqa_tpu' has no attribute {name!r}")
