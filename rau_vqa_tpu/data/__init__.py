from rau_vqa_tpu.data.loader import VQAData, SplitData, load_vqa_data  # noqa: F401
from rau_vqa_tpu.data.features import (  # noqa: F401
    FeatureSource,
    T7DirFeatureSource,
    PackedFeatureStore,
    pack_feature_dir,
)
