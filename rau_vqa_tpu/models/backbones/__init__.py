from rau_vqa_tpu.models.backbones.vgg import (  # noqa: F401
    vgg16_pool5_init,
    vgg16_pool5_apply,
    vgg16_from_torch_state,
)
from rau_vqa_tpu.models.backbones.resnet import (  # noqa: F401
    resnet101_init,
    resnet101_apply,
    resnet_from_torch_state,
)
from rau_vqa_tpu.models.backbones.vit import (  # noqa: F401
    ViTConfig,
    VIT_B16,
    VIT_L14,
    vit_init,
    vit_apply,
    vit_from_timm_state,
)
