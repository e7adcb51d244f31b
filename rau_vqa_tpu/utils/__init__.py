from rau_vqa_tpu.utils.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from rau_vqa_tpu.utils.logging import MetricsLogger  # noqa: F401
