"""Native C++ feature-loader: builds, matches the Python store bit-exact,
survives ring reuse across many batches."""

import json
import os

import numpy as np
import pytest

from rau_vqa_tpu.data.features import PackedFeatureStore, coco_feat_name, pack_feature_dir
from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture

SPEC = FixtureSpec()


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native_fixture"))
    vqa_dir = generate_fixture(root, SPEC)
    with open(os.path.join(vqa_dir, "data_prepro.json")) as f:
        info = json.load(f)
    imgs = info["unique_img_train"] + info["unique_img_test"]
    out = os.path.join(root, "packed")
    pack_feature_dir([os.path.join(root, "feat")], imgs, [1] * len(imgs),
                     out, SPEC.feat_dim, SPEC.feat_w, SPEC.feat_h)
    return out, [coco_feat_name(p) for p in imgs]


def test_native_builds_and_matches_python(packed):
    from rau_vqa_tpu.data.native import NativePackedFeatureStore

    shard, names = packed
    py_store = PackedFeatureStore(shard)
    native = NativePackedFeatureStore(shard, n_threads=3)
    rs = np.random.RandomState(0)
    for trial in range(8):
        pick = [names[i] for i in rs.randint(0, len(names), 16)]
        a = native.get_batch(pick, [1] * len(pick))
        b = py_store.get_batch(pick, [1] * len(pick))
        np.testing.assert_array_equal(a, b)
    native.close()


def test_native_in_split_iteration(packed):
    """Full epoch through SplitData.batches with the native source."""
    from rau_vqa_tpu.data.loader import load_vqa_data
    from rau_vqa_tpu.data.native import NativePackedFeatureStore

    shard, _ = packed
    vqa_dir = os.path.join(os.path.dirname(shard), "vqa_prepro")
    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                         test_batch_size=8)
    native = NativePackedFeatureStore(shard, n_threads=2)
    py_store = PackedFeatureStore(shard)

    def epoch(src, prefetch):
        d = load_vqa_data(vqa_dir, batch_size=16, split="val2014", seed=3)
        d.train_data.inorder()
        return [b.feats for b in d.train_data.batches(src, prefetch=prefetch)]

    a = epoch(native, True)
    b = epoch(py_store, False)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    native.close()
