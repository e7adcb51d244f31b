from rau_vqa_tpu.train.losses import joint_loss_and_metrics, hop_grad_scale  # noqa: F401
from rau_vqa_tpu.train.optim import (  # noqa: F401
    adam_init,
    adam_update,
    clip_by_global_norm,
    add_gradient_noise,
)
from rau_vqa_tpu.train.trainer import Trainer, TrainState, make_train_step  # noqa: F401
