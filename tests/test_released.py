"""Released-checkpoint parity harness, offline: fabricate a tarball in the
reference's released format (snapshot_iter*_epoch*.t7 with an opt table +
per-hop result JSONs, experiments/*/download_trained_model.sh contents) and
run the ENTIRE verify pipeline against it."""

import dataclasses
import json
import os
import tarfile

import jax
import numpy as np
import pytest

from rau_vqa_tpu.config import get_preset
from rau_vqa_tpu.data import T7DirFeatureSource, load_vqa_data
from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture
from rau_vqa_tpu.data.loader import load_gt_annotations
from rau_vqa_tpu.eval.released import (
    adopt_snapshot_opt,
    find_snapshots,
    pick_snapshot,
    verify_released,
)
from rau_vqa_tpu.eval.submission import write_results
from rau_vqa_tpu.train.trainer import Trainer
from rau_vqa_tpu.utils import torch_convert as tc

SPEC = FixtureSpec()
EPOCH = 40.0


def make_exp():
    exp = get_preset("ours_ms")
    return exp.replace(
        model=dataclasses.replace(
            exp.model, n_hops=2, cnn_dim=SPEC.feat_dim, cnn_w=SPEC.feat_w,
            cnn_h=SPEC.feat_h, embed_dim=16, rnn_size=16, multfeat_dim=16,
            attfeat_dim=8, att_rnn_size=16, embed_dropout=0.0,
            rnn_dropout=0.0, mult_dropout=0.1),
        train=dataclasses.replace(exp.train, batch_size=16),
        data=dataclasses.replace(exp.data, split="val2014"))


@pytest.fixture(scope="module")
def released(tmp_path_factory):
    """Fabricated released artifact: fixture data + a 'trained' snapshot in
    Torch format + the result JSONs that snapshot produces through the eval
    sweep — exactly what download_trained_model.sh would fetch."""
    root = tmp_path_factory.mktemp("released")
    fix_root = str(root / "fix")
    generate_fixture(fix_root, SPEC)
    vqa_dir = os.path.join(fix_root, "vqa_prepro")

    exp = make_exp()
    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                         test_batch_size=8)
    src = T7DirFeatureSource([os.path.join(fix_root, "feat")],
                             SPEC.feat_dim, SPEC.feat_w, SPEC.feat_h)
    trainer = Trainer(exp, data, src, str(root / "fab_run"))
    trainer.epoch = int(EPOCH)
    result = trainer.evaluate(write_submissions=False, return_rows=True)

    # assemble the released directory layout (reference :1167-1197)
    rel_dir = str(root / "save_result_vqa_val2014")
    os.makedirs(os.path.join(rel_dir, "snapshot"))
    params_np = jax.tree.map(np.asarray, trainer.state.params)
    tc.export_snapshot(
        os.path.join(rel_dir, "snapshot",
                     f"snapshot_iter000240_epoch{EPOCH:.2f}.t7"),
        params_np, trainer.mcfg, it=240, epoch=EPOCH,
        opt={"nhop": float(trainer.mcfg.n_hops), "alg_name": exp.alg_name,
             "cnnout_dim": float(SPEC.feat_dim),
             "cnnout_w": float(SPEC.feat_w),
             "cnnout_h": float(SPEC.feat_h)})
    write_results(rel_dir, "OpenEnded", "val2014", exp.alg_name, EPOCH,
                  result["rows_oe"])
    write_results(rel_dir, "MultipleChoice", "val2014", exp.alg_name, EPOCH,
                  result["rows_mc"])

    tarball = str(root / "save_result_vqa_val2014.tar.gz")
    with tarfile.open(tarball, "w:gz") as tf:
        tf.add(rel_dir, arcname="save_result_vqa_val2014")
    return {"tarball": tarball, "rel_dir": rel_dir, "vqa_dir": vqa_dir,
            "feat_dir": os.path.join(fix_root, "feat"),
            "params": params_np, "mcfg": trainer.mcfg}


def test_snapshot_discovery(released):
    snaps = find_snapshots(released["rel_dir"])
    assert [e for e, _, _ in snaps] == [EPOCH]
    e, p = pick_snapshot(released["rel_dir"])
    assert e == EPOCH and p.endswith(".t7")
    with pytest.raises(FileNotFoundError):
        pick_snapshot(released["rel_dir"], epoch=39.0)


def test_adopts_snapshot_opt(released):
    from rau_vqa_tpu.data import t7
    _, p = pick_snapshot(released["rel_dir"])
    snap = t7.load_t7(p)
    exp = adopt_snapshot_opt(get_preset("ours_ms"), snap["opt"])
    assert exp.model.n_hops == 2
    assert exp.model.cnn_dim == SPEC.feat_dim
    assert exp.alg_name == make_exp().alg_name


def test_verify_released_cli_end_to_end(released, tmp_path):
    """The one command: tarball in, agreement report out, exit 0 at 100%."""
    from rau_vqa_tpu.cli import main

    # the reference hard-codes model dims in-script (no rnn_size flag), so
    # fixture-scale dims ride --model-json; at paper scale the preset alone
    # suffices
    model_json = str(tmp_path / "model.json")
    with open(model_json, "w") as f:
        json.dump(dataclasses.asdict(make_exp().model), f)
    # official annotations (unanimous raters = the comprehend GT): the
    # harness then scores ours AND the tarball's rows with the official
    # 10-rater metric
    gt = load_gt_annotations(os.path.join(released["vqa_dir"],
                                          "gt_annotations.json"))
    official_json = str(tmp_path / "official.json")
    with open(official_json, "w") as f:
        json.dump({"annotations": [
            {"question_id": qid, "question_type": "what",
             "answer_type": "other", "multiple_choice_answer": ans,
             "answers": [{"answer": ans, "answer_confidence": "yes",
                          "answer_id": i + 1} for i in range(10)]}
            for qid, ans in gt.items()]}, f)
    workdir = str(tmp_path / "verify")
    rc = main([
        "verify-released", "--tarball", released["tarball"],
        "--preset", "ours_ms",
        "--vqa-dir", released["vqa_dir"],
        "--feat-dir", released["feat_dir"],
        "--split", "val2014", "--test-batch-size", "8",
        "--save-dir", workdir,
        "--model-json", model_json,
        "--official-anno", official_json,
    ])
    assert rc == 0
    with open(os.path.join(workdir, "verify_released_report.json")) as f:
        report = json.load(f)
    assert report["min_agree"] == 1.0
    assert report["epoch"] == EPOCH
    # every hop set compared: nHop + uni + select, OE and MC
    assert len(report["hops"]) == 4
    assert all("oe" in h and "mc" in h for h in report["hops"].values())
    assert not any(h["oe"]["qid_mismatch"] for h in report["hops"].values())
    # identical weights -> identical rows -> the official accuracies agree
    # exactly, for both tasks, at every hop
    for h in report["hops"].values():
        for task in ("oe", "mc"):
            assert h[task]["official_ours"] == \
                pytest.approx(h[task]["official_released"])


def _verify_with(released, workdir, exp):
    data = load_vqa_data(released["vqa_dir"], batch_size=16, split="val2014",
                         test_batch_size=8)
    src = T7DirFeatureSource([released["feat_dir"]], SPEC.feat_dim,
                             SPEC.feat_w, SPEC.feat_h)
    gt = load_gt_annotations(os.path.join(released["vqa_dir"],
                                          "gt_annotations.json"))
    return verify_released(released["rel_dir"], exp, data, src, workdir,
                           gt_anno=gt)


def test_verify_released_detects_wrong_weights(released, tmp_path):
    """A corrupted snapshot must NOT reach 100% agreement: re-export with
    perturbed classifier weights and diff against the pristine tarball's
    result JSONs."""
    import shutil

    from rau_vqa_tpu.data import t7

    bad_root = str(tmp_path / "bad")
    shutil.copytree(released["rel_dir"], bad_root)
    _, p = pick_snapshot(bad_root)
    snap = t7.load_t7(p)
    flats = snap["params"]
    if isinstance(flats, dict):
        flats = [flats[float(i)] for i in (1, 2, 3)]
    rs = np.random.RandomState(0)
    flats[2] = flats[2] + rs.randn(flats[2].size).astype(np.float32) * 0.5
    t7.save_t7(p, {"it": snap["it"], "epoch": snap["epoch"],
                   "params": flats, "opt": snap["opt"]})

    bad = dict(released, rel_dir=bad_root)
    report = _verify_with(bad, str(tmp_path / "w"), make_exp())
    assert report["min_agree"] < 1.0


def test_verify_released_layout_mismatch_reports(released, tmp_path):
    """Wrong model dims -> a structured layout report, not a crash."""
    exp = make_exp()
    exp = exp.replace(model=dataclasses.replace(exp.model, multfeat_dim=32))
    report = _verify_with(released, str(tmp_path / "w2"), exp)
    assert report["error"] == "layout"
    assert report["sizes"]["mult"]["snapshot"] != \
        report["sizes"]["mult"]["config"]
