"""prepro: official VQA v1 release JSONs -> data_prepro bundle.

The reference only ever downloads this bundle (data/get_vqa_prepro.sh;
data/VQA_prepro/README.md credits an external repo for the scripts).
These tests pin the native rebuild end-to-end: fabricated official-format
JSONs -> `rau-vqa prepro` -> load_vqa_data -> (slow) train+eval.
"""

import json
import os

import numpy as np
import pytest

from rau_vqa_tpu.data.loader import load_gt_annotations, load_vqa_data
from rau_vqa_tpu.data.prepro import (
    PreproConfig,
    build_prepro,
    join_split,
    tokenize,
)


def _write_vqa_v1(dirpath, split, n_questions, *, rs, annotated=True,
                  mc=False, n_images=4, extra_word=None):
    """Official VQA v1 file pair for one split: questions (+ annotations)."""
    answers_pool = ["yes", "no", "2", "red", "left", "skiing"]
    words = ["what", "is", "the", "color", "of", "dog", "cat", "how",
             "many", "people", "are", "there"]
    questions, annotations = [], []
    for i in range(n_questions):
        qid = {"train2014": 1000, "val2014": 2000,
               "test2015": 3000}[split] + i
        text = " ".join(rs.choice(words, rs.randint(3, 8))) + "?"
        if extra_word and i == 0:
            text = extra_word + " " + text
        q = {"question_id": qid, "image_id": i % n_images,
             "question": text}
        if mc:
            q["multiple_choices"] = ["yes", "no", "maybe", "42"]
        questions.append(q)
        annotations.append({
            "question_id": qid, "image_id": i % n_images,
            "multiple_choice_answer": answers_pool[i % len(answers_pool)],
            "answers": [{"answer": answers_pool[i % len(answers_pool)],
                         "answer_confidence": "yes", "answer_id": 1}],
        })
    qpath = os.path.join(dirpath, f"q_{split}.json")
    with open(qpath, "w") as f:
        json.dump({"questions": questions}, f)
    apath = None
    if annotated:
        apath = os.path.join(dirpath, f"a_{split}.json")
        with open(apath, "w") as f:
            json.dump({"annotations": annotations}, f)
    return qpath, apath


def test_tokenize_punctuation():
    assert tokenize("What is, the dog's color?") == \
        ["what", "is", ",", "the", "dog", "'", "s", "color", "?"]


def test_prepro_bundle_contract(tmp_path):
    """The bundle loads through load_vqa_data; tokens round-trip; answer
    top-N filtering, UNK mapping, MC indices, img names and the gt map all
    match the fabricated inputs."""
    rs = np.random.RandomState(0)
    tq, ta = _write_vqa_v1(str(tmp_path), "train2014", 36, rs=rs)
    vq, va = _write_vqa_v1(str(tmp_path), "val2014", 12, rs=rs, mc=True,
                           extra_word="zebra")

    out = str(tmp_path / "bundle")
    train = [("train2014", join_split(tq, ta, "train2014"))]
    test = join_split(vq, va, "val2014")
    # 36 questions cycle 6 answers evenly -> top-5 drops one answer's rows
    summary = build_prepro(train, test, out, PreproConfig(num_answers=5))
    assert summary["n_answers"] == 5
    assert summary["n_dropped"] == 6
    assert summary["n_train"] == 30

    data = load_vqa_data(out, batch_size=5, split="val2014",
                         test_batch_size=4)
    assert data.vocab[0] == "ZEROPAD" and "UNK" in data.vocab_map
    assert data.answer_size == 5
    assert data.train_data.num_examples == 30
    assert data.test_data.num_examples == 12

    # tokens round-trip: the stored ids decode to the tokenizer's output
    with open(tq) as f:
        q_by_id = {q["question_id"]: q["question"]
                   for q in json.load(f)["questions"]}
    sd = data.train_data
    for i in range(5):
        toks = sd.questions[i][:sd.lengths[i]]
        assert data.tokens_to_question(toks) == \
            " ".join(tokenize(q_by_id[int(sd.qids[i])]))

    # the unseen test word maps to UNK, not ZEROPAD and not a crash
    zebra_row = int(np.flatnonzero(data.test_data.qids == 2000)[0])
    first_tok = int(data.test_data.questions[zebra_row, 0])
    assert data.vocab[first_tok] == "UNK"

    # image names follow the COCO convention the feature stores key on
    assert sd.img_names[0].startswith("COCO_train2014_")
    assert sd.img_names[0].endswith(".t7")
    assert sd.img_paths[0].startswith("train2014/COCO_train2014_")

    # MC: in-vocab choices resolve to 0-based answer ids, others -> -1
    mc = data.test_data.mc_answers
    assert mc.shape == (12, 18)
    yes_ix = data.answer_map["yes"]
    assert (mc[:, 0] == yes_ix).all()       # 'yes' is in the top-5
    assert (mc[:, 2] == -1).all()           # 'maybe' is not
    assert (mc[:, 4:] == -1).all()          # absent columns

    gt = load_gt_annotations(os.path.join(out, "gt_annotations.json"))
    assert len(gt) == 12 and gt[2000] in {"yes", "no", "2", "red",
                                          "left", "skiing"}


def test_prepro_multi_source_datatypes(tmp_path):
    """Two train sources produce datatype_train (1-based source index) —
    the multi-feature-dir routing of mixed train+val layouts."""
    import h5py

    rs = np.random.RandomState(1)
    t1q, t1a = _write_vqa_v1(str(tmp_path), "train2014", 10, rs=rs)
    t2q, t2a = _write_vqa_v1(str(tmp_path), "val2014", 8, rs=rs)
    sq, _ = _write_vqa_v1(str(tmp_path), "test2015", 6, rs=rs,
                          annotated=False)
    out = str(tmp_path / "bundle")
    build_prepro([("train2014", join_split(t1q, t1a, "train2014")),
                  ("val2014", join_split(t2q, t2a, "val2014"))],
                 join_split(sq, None, "test2015"), out,
                 PreproConfig(num_answers=6))
    with h5py.File(os.path.join(out, "data_prepro.h5")) as h5:
        dt = np.asarray(h5["datatype_train"])
    assert set(dt) == {1, 2}
    assert (dt[:10] == 1).all() and (dt[10:] == 2).all()
    # unannotated test split -> no gt map
    assert not os.path.exists(os.path.join(out, "gt_annotations.json"))
    data = load_vqa_data(out, batch_size=4, split="test2015")
    assert data.test_data.num_examples == 6
    assert data.test_data.img_paths[0].startswith("test2015/COCO_test2015_")


def test_prepro_testdev_images_live_in_test2015(tmp_path):
    """test-dev2015 questions reference PHYSICAL test2015 images: the
    unique_img_test paths must be 'test2015/COCO_test2015_<012d>.jpg'
    (there is no test-dev image folder; the released bundles' paths at
    vqa_prepro_loader.lua:1311 confirm the convention)."""
    rs = np.random.RandomState(3)
    tq, ta = _write_vqa_v1(str(tmp_path), "train2014", 12, rs=rs)
    dq_path = str(tmp_path / "q_testdev.json")
    with open(dq_path, "w") as f:
        json.dump({"questions": [
            {"question_id": 4000 + i, "image_id": 17 + i,
             "question": "what is the dog?"} for i in range(3)]}, f)

    out = str(tmp_path / "bundle_dev")
    build_prepro([("train2014", join_split(tq, ta, "train2014"))],
                 join_split(dq_path, None, "test-dev2015"), out)
    with open(os.path.join(out, "data_prepro.json")) as f:
        uniq = json.load(f)["unique_img_test"]
    assert uniq == [f"test2015/COCO_test2015_{17 + i:012d}.jpg"
                    for i in range(3)]


def test_cli_prepro(tmp_path):
    from rau_vqa_tpu.cli import main

    rs = np.random.RandomState(2)
    tq, ta = _write_vqa_v1(str(tmp_path), "train2014", 12, rs=rs)
    vq, va = _write_vqa_v1(str(tmp_path), "val2014", 8, rs=rs)
    # MC overlay file: the same questions with multiple_choices added
    with open(vq) as f:
        mc_qs = json.load(f)["questions"]
    for q in mc_qs:
        q["multiple_choices"] = ["yes", "no", "maybe", "42"]
    with open(str(tmp_path / "mc.json"), "w") as f:
        json.dump({"questions": mc_qs}, f)
    out = str(tmp_path / "bundle")
    rc = main(["prepro", "--train", "train2014", tq, ta,
               "--test", "val2014", vq,
               "--test-annotations", va,
               "--test-mc", str(tmp_path / "mc.json"),
               "--out", out, "--num-answers", "6"])
    assert rc == 0
    data = load_vqa_data(out, batch_size=4, split="val2014")
    assert data.test_data.mc_answers is not None
    assert (data.test_data.mc_answers[:, 0] >= 0).any()
    assert os.path.exists(os.path.join(out, "gt_annotations.json"))


@pytest.mark.slow
def test_prepro_to_training_self_sufficient(tmp_path):
    """The zero-downloads loop: official-format JSONs + raw JPEGs ->
    prepro -> precompute-features -> Trainer train+eval on the shard."""
    import dataclasses

    import jax
    from PIL import Image

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
    from rau_vqa_tpu.precompute import precompute_features, scan_image_dir
    from rau_vqa_tpu.train.trainer import Trainer

    rs = np.random.RandomState(3)
    tq, ta = _write_vqa_v1(str(tmp_path), "train2014", 48, rs=rs)
    vq, va = _write_vqa_v1(str(tmp_path), "val2014", 16, rs=rs)
    out = str(tmp_path / "bundle")
    build_prepro([("train2014", join_split(tq, ta, "train2014"))],
                 join_split(vq, va, "val2014"), out, PreproConfig())

    img_root = str(tmp_path / "imgs")
    for split, n in (("train2014", 4), ("val2014", 4)):
        os.makedirs(os.path.join(img_root, split))
        for i in range(n):
            arr = rs.randint(0, 255, (70, 80, 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(
                img_root, split, f"COCO_{split}_{i:012d}.jpg"))

    bb = vgg16_pool5_init(jax.random.PRNGKey(0))
    store = precompute_features(img_root, scan_image_dir(img_root),
                                str(tmp_path / "shard"), "vgg16", bb,
                                size=64, batch_size=8, backend="pil")

    exp = get_preset("ours_ms")
    exp = exp.replace(
        model=dataclasses.replace(
            exp.model, n_hops=2, cnn_dim=512, cnn_w=2, cnn_h=2,
            embed_dim=16, rnn_size=16, multfeat_dim=16, attfeat_dim=8,
            att_rnn_size=16, embed_dropout=0.0, rnn_dropout=0.0,
            mult_dropout=0.1),
        train=dataclasses.replace(exp.train, batch_size=16, noisy_eta=0.0,
                                  grad_clip=10.0, length_buckets=()),
        data=dataclasses.replace(exp.data, split="val2014"))
    data = load_vqa_data(out, batch_size=16, split="val2014",
                         test_batch_size=8)
    gt = load_gt_annotations(os.path.join(out, "gt_annotations.json"))
    trainer = Trainer(exp, data, store, str(tmp_path / "run"), gt_anno=gt)
    rec = trainer.train_epoch()
    assert np.isfinite(rec["loss"])
    res = trainer.evaluate(write_submissions=False)
    assert all(np.isfinite(a) for a in res["testOEacc"])


def test_prepro_fuzz_adversarial_questions(tmp_path):
    """Property fuzz over adversarial question text: unicode, regex
    specials, punctuation runs, empty and >max_length questions.  The
    bundle must build, load through the standard loader, and keep the
    contract invariants (0-based tokens < vocab, pads zero past length,
    length >= 1, truncation at the h5 width)."""
    import numpy as np

    from rau_vqa_tpu.data import load_vqa_data
    from rau_vqa_tpu.data.prepro import (
        Entry,
        PreproConfig,
        build_prepro,
        tokenize,
    )

    rs = np.random.RandomState(11)
    pieces = ["what", "is", "Straße", "naïve", "日本", "🤔", "a+b", "50%",
              "[x]", "(y)", "\\d+", "c:\\\\path", "end.", "--", "''",
              '"quoted"', "semi;colon", "a\nb", "tab\tsep", "?", "!!!",
              "<tag>", "x^2", "#1", "$5", "&amp", "*star*", "=eq="]
    answers = ["yes", "no", "maybe", "2", "répondre"]

    def rand_question(i):
        if i % 17 == 0:
            return ""                       # empty question
        n = 40 if i % 13 == 0 else rs.randint(1, 9)   # some overlong
        return " ".join(rs.choice(pieces, n))

    def entries(split, n, base, annotated):
        return [Entry(question_id=base + i, split=split, image_id=i % 3,
                      question=rand_question(i),
                      answer=answers[i % len(answers)] if annotated
                      else None)
                for i in range(n)]

    cfg = PreproConfig(num_answers=4, max_length=26, word_threshold=0)
    out = str(tmp_path / "bundle")
    summary = build_prepro(
        [("train2014", entries("train2014", 120, 1000, True))],
        entries("val2014", 40, 2000, True), out, cfg)
    assert summary["n_train"] > 0 and summary["vocab_size"] > 1

    data = load_vqa_data(out, batch_size=8, split="val2014")
    for sd in (data.train_data, data.test_data):
        toks = np.asarray(sd.questions)
        lens = np.asarray(sd.lengths)
        assert toks.min() >= 0 and toks.max() < data.vocab_size
        assert lens.min() >= 1 and lens.max() <= cfg.max_length
        cols = np.arange(toks.shape[1])[None, :]
        # 0 = ZEROPAD everywhere at/after each row's length
        assert (toks[cols >= lens[:, None]] == 0).all()

    # tokenize is total and never emits empties on any fuzz string
    for i in range(200):
        for t in tokenize(rand_question(i)):
            assert t and t != " "
