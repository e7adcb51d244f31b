"""Data layer: t7 round-trip, fixture bundle, loader contract, batch-order
policies, packed feature store, prefetch equivalence."""

import json
import os

import numpy as np
import pytest

from rau_vqa_tpu.data import (
    PackedFeatureStore,
    T7DirFeatureSource,
    load_vqa_data,
    pack_feature_dir,
)
from rau_vqa_tpu.data import t7
from rau_vqa_tpu.data.features import coco_feat_name
from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture
from rau_vqa_tpu.data.loader import load_gt_annotations

SPEC = FixtureSpec()


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vqa_fixture")
    generate_fixture(str(root), SPEC)
    return str(root)


def test_t7_roundtrip_tensor(tmp_path):
    x = np.random.RandomState(0).randn(4, 3, 2).astype(np.float32)
    p = str(tmp_path / "x.t7")
    t7.save_t7(p, x)
    y = t7.load_t7(p)
    np.testing.assert_array_equal(x, y)


def test_t7_roundtrip_table(tmp_path):
    obj = {"it": 10.0, "epoch": 2.5, "name": "snapshot", "flag": True,
           "params": [np.arange(6, dtype=np.float32).reshape(2, 3),
                      np.ones((4,), np.float64)]}
    p = str(tmp_path / "snap.t7")
    t7.save_t7(p, obj)
    got = t7.load_t7(p)
    assert got["it"] == 10.0
    assert got["name"] == "snapshot"
    assert got["flag"] is True
    np.testing.assert_array_equal(got["params"][0], obj["params"][0])
    np.testing.assert_array_equal(got["params"][1], obj["params"][1])


def test_t7_noncontiguous_tensor(tmp_path):
    x = np.random.RandomState(1).randn(6, 8).astype(np.float32)
    p = str(tmp_path / "t.t7")
    t7.save_t7(p, np.ascontiguousarray(x.T))
    np.testing.assert_array_equal(t7.load_t7(p), x.T)


def test_coco_feat_name():
    assert (coco_feat_name("val2014/COCO_val2014_000000533942.jpg")
            == "COCO_val2014_000000533942.t7")


def test_loader_contract(fixture_root):
    vqa_dir = os.path.join(fixture_root, "vqa_prepro")
    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                         test_batch_size=8)
    # vocab: ZEROPAD at 0, then the fixture words
    assert data.vocab[0] == "ZEROPAD"
    assert data.vocab_size == SPEC.n_words + 1
    assert data.answer_size == SPEC.n_answers
    assert data.seq_len == SPEC.seq_len
    # 0-based answer labels in range
    assert data.train_data.answers.min() >= 0
    assert data.train_data.answers.max() < SPEC.n_answers
    # tokens: pad is 0, words within vocab
    q = data.train_data.questions
    assert q.min() == 0 and q.max() <= SPEC.n_words
    # mc answers are 0-based with -1 absent
    assert data.test_data.mc_answers.min() == -1
    # tokenize round trip through the vocab map
    toks, n = data.question_to_tokens("w01 w02 nonexistent-word")
    assert n == 3
    assert toks[0] == data.vocab_map["w01"]
    assert toks[2] == data.vocab_map["UNK"]
    assert data.tokens_to_question(toks, 2) == "w01 w02"
    # normalize=True applies the bundle-building convention (lowercase +
    # punctuation split) so serve/ask questions don't UNK on 'W01'/'w02?'
    toks, n = data.question_to_tokens("W01 w02?", normalize=True)
    assert n == 3
    assert toks[0] == data.vocab_map["w01"]
    assert toks[1] == data.vocab_map["w02"]
    assert toks[2] == data.vocab_map["UNK"]       # the '?' token


def test_batch_iteration_and_feats(fixture_root):
    vqa_dir = os.path.join(fixture_root, "vqa_prepro")
    feat_dir = os.path.join(fixture_root, "feat")
    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                         test_batch_size=8)
    src = T7DirFeatureSource([feat_dir], SPEC.feat_dim, SPEC.feat_w, SPEC.feat_h)
    data.train_data.set_batch_order_option("shuffle")
    data.train_data.reorder()
    seen_qids = []
    for batch in data.train_data.batches(src):
        assert batch.feats.shape == (16, SPEC.feat_w * SPEC.feat_h, SPEC.feat_dim)
        assert batch.tokens.shape == (16, SPEC.seq_len)
        assert batch.labels.shape == (16,)
        seen_qids.extend(batch.qids.tolist())
    assert len(seen_qids) == data.train_data.iter_per_epoch * 16
    assert len(set(seen_qids)) == len(seen_qids)  # no dup within an epoch


def test_batch_order_policies(fixture_root):
    vqa_dir = os.path.join(fixture_root, "vqa_prepro")
    data = load_vqa_data(vqa_dir, batch_size=8, split="val2014")
    sd = data.train_data
    sd.set_batch_order_option("inorder")
    sd.reorder()
    np.testing.assert_array_equal(sd.batch_order, np.arange(sd.num_examples))
    sd.set_batch_order_option("sort")
    sd.reorder()
    lens = sd.lengths[sd.batch_order]
    assert np.all(np.diff(lens) >= 0)
    sd.set_batch_order_option("randsort")
    sd.reorder()
    lens2 = sd.lengths[sd.batch_order]
    assert np.all(np.diff(lens2) >= 0)
    # randsort shuffles within equal-length runs: orders differ (w.h.p.)
    sd2_order = sd.batch_order.copy()
    sd.reorder()
    assert not np.array_equal(sd2_order, sd.batch_order)
    sd.set_batch_order_option("shuffle")
    sd.reorder()
    assert not np.array_equal(sd.batch_order, np.arange(sd.num_examples))


def test_packed_store_matches_t7(fixture_root, tmp_path):
    vqa_dir = os.path.join(fixture_root, "vqa_prepro")
    feat_dir = os.path.join(fixture_root, "feat")
    with open(os.path.join(vqa_dir, "data_prepro.json")) as f:
        info = json.load(f)
    imgs = info["unique_img_train"] + info["unique_img_test"]
    store = pack_feature_dir([feat_dir], imgs, [1] * len(imgs),
                             str(tmp_path / "packed"),
                             SPEC.feat_dim, SPEC.feat_w, SPEC.feat_h)
    src = T7DirFeatureSource([feat_dir], SPEC.feat_dim, SPEC.feat_w, SPEC.feat_h)
    names = [coco_feat_name(p) for p in imgs[:5]]
    np.testing.assert_allclose(store.get_batch(names, [1] * 5),
                               src.get_batch(names, [1] * 5), rtol=1e-6)
    # reopen from disk
    store2 = PackedFeatureStore(str(tmp_path / "packed"))
    np.testing.assert_array_equal(store2.get_batch(names, [1] * 5),
                                  store.get_batch(names, [1] * 5))


def test_prefetch_equals_sync(fixture_root):
    vqa_dir = os.path.join(fixture_root, "vqa_prepro")
    feat_dir = os.path.join(fixture_root, "feat")
    src = T7DirFeatureSource([feat_dir], SPEC.feat_dim, SPEC.feat_w, SPEC.feat_h)

    def run(prefetch):
        data = load_vqa_data(vqa_dir, batch_size=16, split="val2014", seed=5)
        data.train_data.set_batch_order_option("inorder")
        data.train_data.reorder()
        return list(data.train_data.batches(src, prefetch=prefetch))

    a, b = run(True), run(False)
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba.qids, bb.qids)
        np.testing.assert_array_equal(ba.feats, bb.feats)


def test_valid_ratio_split(fixture_root):
    vqa_dir = os.path.join(fixture_root, "vqa_prepro")
    data = load_vqa_data(vqa_dir, batch_size=8, split="val2014",
                         valid_ratio=0.25)
    n_val = data.val_data.num_examples
    n_train = data.train_data.num_examples
    assert n_val == int(SPEC.n_train * 0.25)
    assert n_val + n_train == SPEC.n_train
    # disjoint qids
    assert not (set(data.val_data.qids.tolist())
                & set(data.train_data.qids.tolist()))


def test_gt_annotations(fixture_root):
    gt = load_gt_annotations(os.path.join(fixture_root, "vqa_prepro",
                                          "gt_annotations.json"))
    assert len(gt) == SPEC.n_test
    assert all(isinstance(k, int) for k in gt)


def test_batch_fetch_variants(fixture_root):
    """Text-only and multi-source batches (next_batch / next_batch_twofeats
    equivalents)."""
    vqa_dir = os.path.join(fixture_root, "vqa_prepro")
    feat_dir = os.path.join(fixture_root, "feat")
    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014")
    sd = data.train_data
    sd.inorder()
    b_text = sd.next_batch_text()
    assert b_text.feats is None
    assert b_text.tokens.shape == (16, SPEC.seq_len)

    src = T7DirFeatureSource([feat_dir], SPEC.feat_dim, SPEC.feat_w,
                             SPEC.feat_h)
    sd.inorder()
    b_two = sd.next_batch_multi([src, src])
    assert isinstance(b_two.feats, tuple) and len(b_two.feats) == 2
    np.testing.assert_array_equal(b_two.feats[0], b_two.feats[1])


def test_qa_utils_names():
    from rau_vqa_tpu.data.qa_utils import cocofeat_name, cocoimg_name

    assert cocoimg_name("train2014", 357413) == "COCO_train2014_000000357413.jpg"
    assert cocofeat_name("val2014", 7) == "COCO_val2014_000000000007.t7"


def test_packed_store_float16(fixture_root, tmp_path):
    """fp16 shards halve feature storage/bandwidth; reads return f32."""
    vqa_dir = os.path.join(fixture_root, "vqa_prepro")
    feat_dir = os.path.join(fixture_root, "feat")
    with open(os.path.join(vqa_dir, "data_prepro.json")) as f:
        info = json.load(f)
    imgs = info["unique_img_train"][:6]
    store = pack_feature_dir([feat_dir], imgs, [1] * len(imgs),
                             str(tmp_path / "packed16"),
                             SPEC.feat_dim, SPEC.feat_w, SPEC.feat_h,
                             dtype="float16")
    src = T7DirFeatureSource([feat_dir], SPEC.feat_dim, SPEC.feat_w,
                             SPEC.feat_h)
    names = [coco_feat_name(p) for p in imgs]
    a = store.get_batch(names, [1] * len(names))
    b = src.get_batch(names, [1] * len(names))
    assert a.dtype == np.float32
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)
    # native reader handles fp16 rows too
    from rau_vqa_tpu.data.native import NativePackedFeatureStore
    nat = NativePackedFeatureStore(str(tmp_path / "packed16"), n_threads=2)
    np.testing.assert_array_equal(nat.get_batch(names, [1] * len(names)), a)
    nat.close()


def test_packed_store_int8(fixture_root, tmp_path):
    """int8 shards (per-image absmax scales): 4x less feature bandwidth."""
    vqa_dir = os.path.join(fixture_root, "vqa_prepro")
    feat_dir = os.path.join(fixture_root, "feat")
    with open(os.path.join(vqa_dir, "data_prepro.json")) as f:
        info = json.load(f)
    imgs = info["unique_img_train"][:6]
    store = pack_feature_dir([feat_dir], imgs, [1] * len(imgs),
                             str(tmp_path / "packed8"),
                             SPEC.feat_dim, SPEC.feat_w, SPEC.feat_h,
                             dtype="int8")
    src = T7DirFeatureSource([feat_dir], SPEC.feat_dim, SPEC.feat_w,
                             SPEC.feat_h)
    names = [coco_feat_name(p) for p in imgs]
    a = store.get_batch(names, [1] * len(names))
    b = src.get_batch(names, [1] * len(names))
    # quantization error bounded by scale/2 = absmax/254 per image
    absmax = np.abs(b).reshape(len(imgs), -1).max(axis=1)
    err = np.abs(a - b).reshape(len(imgs), -1).max(axis=1)
    assert np.all(err <= absmax / 254 + 1e-6)
    from rau_vqa_tpu.data.native import NativePackedFeatureStore
    nat = NativePackedFeatureStore(str(tmp_path / "packed8"), n_threads=2)
    np.testing.assert_allclose(nat.get_batch(names, [1] * len(names)), a,
                               rtol=1e-6)
    nat.close()


def test_t7_fuzz_roundtrip(tmp_path):
    """Random nested tables/tensors survive the t7 codec byte-exact."""
    rs = np.random.RandomState(11)

    def rand_obj(depth):
        kind = rs.randint(0, 6 if depth < 3 else 4)
        if kind == 0:
            return float(rs.randn())
        if kind == 1:
            return f"s{rs.randint(1000)}"
        if kind == 2:
            return bool(rs.randint(2))
        if kind == 3:
            shape = tuple(rs.randint(1, 5, rs.randint(1, 4)))
            dt = [np.float32, np.float64, np.int32, np.int64][rs.randint(4)]
            return (rs.randn(*shape) * 10).astype(dt)
        if kind == 4:
            return [rand_obj(depth + 1) for _ in range(rs.randint(1, 4))]
        return {f"k{i}": rand_obj(depth + 1) for i in range(rs.randint(1, 4))}

    def check(a, b):
        if isinstance(a, np.ndarray):
            np.testing.assert_array_equal(a, b)
        elif isinstance(a, list):
            assert len(a) == len(b)
            for x, y in zip(a, b):
                check(x, y)
        elif isinstance(a, dict):
            assert set(a) == set(b)
            for k in a:
                check(a[k], b[k])
        elif isinstance(a, float):
            assert a == b
        else:
            assert a == b

    for trial in range(20):
        obj = {"root": rand_obj(0)}
        p = str(tmp_path / f"fuzz{trial}.t7")
        t7.save_t7(p, obj)
        check(obj, t7.load_t7(p))


def test_packed_store_raw_int8_device_dequant(fixture_root, tmp_path):
    """raw_int8 mode returns QuantFeats; device-side dequantization equals
    the host-dequantized read bit-for-bit (same int8*scale math)."""
    import jax
    import jax.numpy as jnp
    from rau_vqa_tpu.data.features import QuantFeats

    vqa_dir = os.path.join(fixture_root, "vqa_prepro")
    feat_dir = os.path.join(fixture_root, "feat")
    with open(os.path.join(vqa_dir, "data_prepro.json")) as f:
        info = json.load(f)
    imgs = info["unique_img_train"][:4]
    out = str(tmp_path / "packed8raw")
    pack_feature_dir([feat_dir], imgs, [1] * len(imgs), out,
                     SPEC.feat_dim, SPEC.feat_w, SPEC.feat_h, dtype="int8")
    from rau_vqa_tpu.data.features import PackedFeatureStore
    host = PackedFeatureStore(out)
    raw = PackedFeatureStore(out, raw_int8=True)
    names = [coco_feat_name(p) for p in imgs]
    qf = raw.get_batch(names, [1] * len(names))
    assert isinstance(qf, QuantFeats)
    assert qf.values.dtype == np.int8
    assert qf.scales.shape == (len(imgs),)
    dev = jax.jit(lambda v, s: v.astype(jnp.float32)
                  * s[:, None, None])(jnp.asarray(qf.values),
                                      jnp.asarray(qf.scales))
    np.testing.assert_array_equal(
        np.asarray(dev), host.get_batch(names, [1] * len(names)))
    # a shard without scales (f32) falls back to float shipping — LOUDLY
    # (silently ignoring --ship-int8 would hide a 4x transfer regression)
    out32 = str(tmp_path / "packed32")
    pack_feature_dir([feat_dir], imgs, [1] * len(imgs), out32,
                     SPEC.feat_dim, SPEC.feat_w, SPEC.feat_h)
    with pytest.warns(UserWarning, match="raw_int8 requested"):
        st = PackedFeatureStore(out32, raw_int8=True)
    assert not st.raw_int8
    assert isinstance(st.get_batch(names, [1] * len(names)), np.ndarray)


def test_zero_based_img_pos_rejected(fixture_root, tmp_path):
    """img_pos is 1-based (schema :1322): a 0 would negative-wrap to the
    LAST unique image and silently mis-pair every question — the loader
    must reject it loudly."""
    import shutil

    import h5py

    vqa_dir = os.path.join(fixture_root, "vqa_prepro")
    bad = str(tmp_path / "bad_bundle")
    shutil.copytree(vqa_dir, bad)
    with h5py.File(os.path.join(bad, "data_prepro.h5"), "r+") as h5:
        pos = np.asarray(h5["img_pos_train"])
        pos[0] = 0
        del h5["img_pos_train"]
        h5["img_pos_train"] = pos
    with pytest.raises(ValueError, match="1-based"):
        load_vqa_data(bad, batch_size=16, split="val2014",
                      test_batch_size=8)


def test_t7_rejects_0d_arrays(tmp_path):
    """Torch7's ndim==0 means EMPTY tensor, so a 0-d scalar would
    round-trip to an empty array — the writer must refuse instead of
    losing the value."""
    from rau_vqa_tpu.data.t7 import save_t7

    with pytest.raises(ValueError, match="0-d"):
        save_t7(str(tmp_path / "s.t7"), np.array(3.5, np.float32))


def test_fixture_rejects_oversized_mc(tmp_path):
    """n_mc - 1 distinct candidates must exist among n_answers; a spec
    that can't be satisfied fails with a clear error, not a numpy
    broadcast crash."""
    import dataclasses as dc

    from rau_vqa_tpu.data.fixtures import generate_fixture

    with pytest.raises(ValueError, match="n_mc"):
        generate_fixture(str(tmp_path / "f"),
                         dc.replace(SPEC, n_mc=SPEC.n_answers + 2))


def test_prefetch_abandoned_generator_rewinds(fixture_root):
    """Breaking out of a prefetched batches() iterator must not skip the
    prefetched-but-unyielded batch: the order state rewinds, so the data
    sequence matches an uninterrupted prefetch=False run."""
    import itertools

    vqa_dir = os.path.join(fixture_root, "vqa_prepro")
    feat_dir = os.path.join(fixture_root, "feat")
    src = T7DirFeatureSource([feat_dir], SPEC.feat_dim, SPEC.feat_w,
                             SPEC.feat_h)

    def qid_stream(interrupt):
        data = load_vqa_data(vqa_dir, batch_size=16, split="val2014", seed=5)
        data.train_data.set_batch_order_option("shuffle")
        data.train_data.reorder()
        out = []
        if interrupt:   # consume 2, abandon mid-epoch, then resume
            for b in itertools.islice(
                    data.train_data.batches(src, prefetch=True), 2):
                out.append(b.qids)
        else:
            # no-lookahead baseline: plain next_batch never prefetches,
            # so its order state is trivially correct
            out += [data.train_data.next_batch(src).qids,
                    data.train_data.next_batch(src).qids]
        for b in data.train_data.batches(src, prefetch=True):
            out.append(b.qids)
        return out

    plain = qid_stream(False)
    broken = qid_stream(True)
    assert len(plain) == len(broken)
    for a, b in zip(plain, broken):
        np.testing.assert_array_equal(a, b)


def test_loader_loud_failure_modes(fixture_root, tmp_path):
    """Contract violations fail loudly: unknown word without UNK,
    out-of-range datatype, undersized split, packed-shard dtype
    mismatch."""
    import json as _json

    import pytest

    vqa_dir = os.path.join(fixture_root, "vqa_prepro")
    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014")
    # the fixture vocab always carries UNK — strip it to exercise the raise
    assert "UNK" in data.vocab_map
    data.vocab_map = {w: i for w, i in data.vocab_map.items() if w != "UNK"}
    with pytest.raises(KeyError, match="no 'UNK' entry"):
        data.question_to_tokens("definitely_not_in_any_vocab_xyzzy")

    feat_dir = os.path.join(fixture_root, "feat")
    src = T7DirFeatureSource([feat_dir], SPEC.feat_dim, SPEC.feat_w,
                             SPEC.feat_h)
    name = data.train_data.img_names[0]
    with pytest.raises(ValueError, match="1-based"):
        src.get_batch([name], np.asarray([0], np.int32))
    with pytest.raises(ValueError, match="1-based"):
        src.get_batch([name], np.asarray([2], np.int32))

    # an undersized split loads fine but fails loudly the moment any
    # batch is drawn from it (construction stays legal: a workflow may
    # never iterate that split)
    big = load_vqa_data(vqa_dir, batch_size=100000, split="val2014")
    with pytest.raises(ValueError, match="zero full batches"):
        big.train_data.next_batch_text()
    with pytest.raises(ValueError, match="zero full batches"):
        next(iter(big.train_data.batches(src)))

    # packed shard whose index.json dtype disagrees with features.npy
    from rau_vqa_tpu.data.features import PackedFeatureStore
    shard = tmp_path / "shard"
    os.makedirs(shard)
    np.save(shard / "features.npy", np.zeros((2, 4, 8), np.float32))
    with open(shard / "index.json", "w") as f:
        _json.dump({"index": {"a.t7": 0, "b.t7": 1}, "dim": 8, "spat": 4,
                    "dtype": "int8"}, f)
    with pytest.raises(ValueError, match="dtype mismatch"):
        PackedFeatureStore(str(shard))


def test_fixture_image_class_encoding_range(tmp_path):
    """The gray-level class encoding occupies [30+40c, 30+40c+39] per
    class: n_answers > 5 would wrap past uint8 and alias high classes
    onto class 0's band, silently capping attainable accuracy — reject
    it instead (images=True only; feature fixtures are unaffected)."""
    import dataclasses as dc

    from rau_vqa_tpu.data.fixtures import generate_fixture

    with pytest.raises(ValueError, match="gray level"):
        generate_fixture(str(tmp_path / "f"),
                         dc.replace(SPEC, n_answers=6), images=True)
    # the feature-fixture path has no pixel encoding: same spec is fine
    generate_fixture(str(tmp_path / "g"), dc.replace(SPEC, n_answers=6))


def test_fixture_texture_images_stats_equalized(tmp_path):
    """image_mode='texture' encodes the class in stripe ORIENTATION x
    PERIOD with first-order statistics equalized: per-class pixel means
    and stds must be indistinguishable (a frozen random backbone cannot
    read the class off the image mean, the point of the fine-tuning
    accuracy A/B), while images of different classes differ pixelwise."""
    import numpy as np
    from PIL import Image

    from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture

    spec = FixtureSpec(n_train=16, n_test=8, n_images=8, n_answers=4,
                       n_img_classes=4)
    generate_fixture(str(tmp_path), spec, images=True, image_size=64,
                     uniform_img_assign=True, image_mode="texture")
    per_class = {}
    for i in range(8):
        p = tmp_path / "images" / "train2014" / \
            f"COCO_train2014_{i:012d}.jpg"
        arr = np.asarray(Image.open(p), np.float32)
        per_class.setdefault(i % 4, []).append(arr)
    means = {c: np.mean(v) for c, v in per_class.items()}
    stds = {c: np.mean([a.std() for a in v]) for c, v in per_class.items()}
    assert max(means.values()) - min(means.values()) < 3.0, means
    assert max(stds.values()) - min(stds.values()) < 5.0, stds
    # distinct classes are pixelwise distinct (learnable at all)
    a0 = per_class[0][0]
    a1 = per_class[1][0]
    assert np.abs(a0 - a1).mean() > 20.0


def test_fixture_dense_class_code(tmp_path):
    """class_code='dense' encodes the image class as a fixed +/-1 pattern
    over ALL feature channels: images of one class correlate strongly
    with their class code and not with another's (the paper-dims
    learnability datasets use this; the single-channel bump was a
    hard read for the 512-dim head — BASELINE.md round 5)."""
    import numpy as np

    from rau_vqa_tpu.data.features import T7DirFeatureSource, coco_feat_name
    from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture

    spec = FixtureSpec(n_train=16, n_test=8, n_images=8, n_answers=4,
                       n_img_classes=4, class_code="dense",
                       feat_noise=0.05)
    generate_fixture(str(tmp_path), spec)
    src = T7DirFeatureSource([str(tmp_path / "feat")], spec.feat_dim,
                             spec.feat_w, spec.feat_h)
    names = [coco_feat_name(f"train2014/COCO_train2014_{i:012d}.jpg")
             for i in range(8)]
    feats = src.get_batch(names, [1] * 8)        # [8, S, D]
    means = feats.mean(axis=1)                   # spatial-avg [8, D]
    # same-class images (i and i+4 share class i%4) nearly identical
    # codes; different classes near-orthogonal
    same = np.dot(means[0], means[4]) / (
        np.linalg.norm(means[0]) * np.linalg.norm(means[4]))
    diff = np.dot(means[0], means[1]) / (
        np.linalg.norm(means[0]) * np.linalg.norm(means[1]))
    assert same > 0.95, same
    assert abs(diff) < 0.3, diff
