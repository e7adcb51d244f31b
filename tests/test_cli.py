"""CLI: fixture training, standalone eval adopting the snapshot's config,
checkpoint shape validation, feature packing."""

import glob
import os

import pytest

from rau_vqa_tpu.cli import main


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("cli_run"))
    rc = main(["train", "--preset", "ours_ms", "--fixture", "--nhop", "2",
               "--epochs", "2", "--save-dir", wd])
    assert rc == 0
    return wd


def test_train_artifacts(trained_run):
    assert os.path.exists(os.path.join(trained_run, "config.json"))
    assert glob.glob(os.path.join(trained_run, "snapshot", "*.msgpack"))
    assert os.path.exists(os.path.join(trained_run, "training_log",
                                       "metrics.jsonl"))
    assert glob.glob(os.path.join(trained_run, "results", "hop_01",
                                  "vqa_OpenEnded_*"))
    # config.json records the RESOLVED model config (vocab/answer/seq_len
    # come from the data bundle): convert-snapshot --config-json documents
    # pointing at this file, so the preset's paper dims would be wrong
    import json
    with open(os.path.join(trained_run, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["model"]["vocab_size"] < 100          # fixture vocab, not 12k
    assert cfg["model"]["answer_size"] < 100
    assert cfg["model"]["n_hops"] == 2


def test_convert_snapshot_cli_honors_output_path(trained_run, tmp_path):
    """`convert-snapshot` must write the .msgpack/.json pair at the LITERAL
    --output path (it used to save under save_checkpoint's own
    snapshot_iter..._epoch... naming, silently ignoring --output), and the
    round-tripped checkpoint must answer identically."""
    import json

    import numpy as np

    ck = glob.glob(os.path.join(trained_run, "snapshot", "*20*.msgpack"))[0]
    with open(ck.replace(".msgpack", ".json")) as f:
        mc = json.load(f)["model_config"]
    t7 = str(tmp_path / "snap.t7")
    rc = main(["convert-snapshot", "--input", ck, "--output", t7,
               "--to-torch", "--vocab-size", str(mc["vocab_size"]),
               "--answer-size", str(mc["answer_size"]),
               "--seq-len", str(mc["seq_len"])])
    assert rc == 0 and os.path.exists(t7)
    cfg_json = str(tmp_path / "mcfg.json")
    with open(cfg_json, "w") as f:
        json.dump({"model": mc}, f)
    out = str(tmp_path / "roundtrip.msgpack")
    rc = main(["convert-snapshot", "--input", t7, "--output", out,
               "--config-json", cfg_json,
               "--vocab-size", str(mc["vocab_size"]),
               "--answer-size", str(mc["answer_size"]),
               "--seq-len", str(mc["seq_len"])])
    assert rc == 0
    assert os.path.exists(out)                       # literal path honored
    assert os.path.exists(str(tmp_path / "roundtrip.json"))

    # round-trip parity: identical params through the Torch format
    import jax

    from rau_vqa_tpu.config import ModelConfig
    from rau_vqa_tpu.train.trainer import init_train_state
    from rau_vqa_tpu.utils.checkpoint import load_checkpoint
    state = init_train_state(jax.random.PRNGKey(0), ModelConfig(**mc))
    a, _ = load_checkpoint(ck, state._asdict())
    b, _ = load_checkpoint(out, state._asdict())
    for la, lb in zip(jax.tree_util.tree_leaves(a["params"]),
                      jax.tree_util.tree_leaves(b["params"])):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
def test_train_on_mesh_from_cli(tmp_path):
    """--mesh-data/--mesh-model/--tp drive the Trainer's sharded step (and
    sharded eval sweep) on a 4x2 virtual mesh straight from the CLI
    (VERDICT r1 missing #5: MeshConfig was dead config)."""
    import json
    wd = str(tmp_path / "mesh_run")
    rc = main(["train", "--preset", "ours_ms", "--fixture", "--nhop", "2",
               "--epochs", "2", "--save-dir", wd,
               "--mesh-data", "4", "--mesh-model", "2", "--tp"])
    assert rc == 0
    with open(os.path.join(wd, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["mesh"]["enabled"] is True
    assert cfg["mesh"]["data_axis"] == 4
    assert cfg["mesh"]["model_axis"] == 2
    assert cfg["mesh"]["shard_params_tp"] is True
    assert glob.glob(os.path.join(wd, "results", "hop_01", "vqa_OpenEnded_*"))


def test_standalone_eval_adopts_snapshot_config(trained_run, tmp_path):
    ck = sorted(glob.glob(os.path.join(trained_run, "snapshot",
                                       "*.msgpack")))[-1]
    fix = os.path.join(trained_run, "fixture")
    rc = main(["eval", "--checkpoint", ck, "--preset", "ours_ms",
               "--vqa-dir", os.path.join(fix, "vqa_prepro"),
               "--feat-dir", os.path.join(fix, "feat"),
               "--split", "val2014", "--test-batch-size", "8",
               "--gt-anno", os.path.join(fix, "vqa_prepro",
                                         "gt_annotations.json"),
               "--save-dir", str(tmp_path / "eval_out")])
    assert rc == 0
    assert glob.glob(os.path.join(str(tmp_path / "eval_out"), "results",
                                  "hop_01", "vqa_OpenEnded_*"))


def test_eval_fixture_flag(trained_run, tmp_path):
    """`eval --fixture` routes to the deterministic fixture bundle while
    keeping the snapshot's self-described model config — the flag was
    accepted by the parser but silently ignored (eval then crashed
    looking for the real VQA bundle at the preset path)."""
    ck = sorted(glob.glob(os.path.join(trained_run, "snapshot",
                                       "*.msgpack")))[-1]
    out = str(tmp_path / "eval_fix_out")
    rc = main(["eval", "--checkpoint", ck, "--preset", "ours_ms",
               "--fixture", "--save-dir", out])
    assert rc == 0
    assert glob.glob(os.path.join(out, "results", "hop_01",
                                  "vqa_OpenEnded_*"))


@pytest.mark.slow   # >5 s: fast-loop budget (CLAUDE.md)
def test_eval_wrong_config_fails_loudly(trained_run, tmp_path):
    """Restoring a snapshot into a mismatched model must raise, not return
    garbage (flax from_bytes alone silently accepts any shapes)."""
    import dataclasses
    import jax
    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.train.trainer import init_train_state
    from rau_vqa_tpu.utils.checkpoint import load_checkpoint

    ck = sorted(glob.glob(os.path.join(trained_run, "snapshot",
                                       "*.msgpack")))[-1]
    big = get_preset("ours_ms").model  # full-size dims != fixture dims
    state = init_train_state(jax.random.PRNGKey(0), big)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_checkpoint(ck, state._asdict())


def test_undersized_eval_split_covered_by_tail(trained_run):
    """An eval batch size LARGER than the split (83 > 32 fixture examples)
    used to raise 'zero full batches'; since evaluate() pads the tail
    batch (VERDICT r3 #4) it is a legal tail-only sweep that must cover
    every question exactly once."""
    import json as _json
    fix = os.path.join(trained_run, "fixture")
    ck = sorted(glob.glob(os.path.join(trained_run, "snapshot",
                                       "*.msgpack")))[-1]
    rc = main(["eval", "--checkpoint", ck, "--preset", "ours_ms",
               "--vqa-dir", os.path.join(fix, "vqa_prepro"),
               "--feat-dir", os.path.join(fix, "feat"),
               "--split", "val2014",   # split-derived batch 83 > 32 examples
               "--save-dir", trained_run + "_tailonly"])
    assert rc == 0
    subs = glob.glob(os.path.join(trained_run + "_tailonly", "results",
                                  "hop_01", "vqa_OpenEnded_*"))
    assert subs
    with open(subs[0]) as f:
        rows = _json.load(f)
    qids = [r["question_id"] for r in rows]
    assert len(qids) == 32 and len(set(qids)) == 32


def test_pack_features_cli(trained_run, tmp_path):
    fix = os.path.join(trained_run, "fixture")
    out = str(tmp_path / "packed")
    rc = main(["pack-features", "--feat-dir", os.path.join(fix, "feat"),
               "--vqa-dir", os.path.join(fix, "vqa_prepro"),
               "--out", out, "--cnnout-dim", "16", "--cnnout-w", "3",
               "--cnnout-h", "3"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "features.npy"))
    assert os.path.exists(os.path.join(out, "index.json"))


def test_pack_features_honors_datatypes(tmp_path):
    """A split whose train images mix source dirs (h5 datatype_train, the
    reference's tab_featpaths indexing at vqa_prepro_loader.lua:876) must
    read each image from ITS dir — not dir 0 for everything (VERDICT r1
    missing #6)."""
    import json
    import h5py
    import numpy as np
    from rau_vqa_tpu.data import t7
    from rau_vqa_tpu.data.features import PackedFeatureStore

    vqa_dir = tmp_path / "vqa"
    dir1 = tmp_path / "feat_train"
    dir2 = tmp_path / "feat_val"
    for d in (vqa_dir, dir1, dir2):
        d.mkdir()
    D, W, H = 4, 2, 2
    train_name = "COCO_train2014_000000000001"
    val_name = "COCO_val2014_000000000002"
    t7.save_t7(str(dir1 / f"{train_name}.t7"),
               np.full((D, W, H), 1.0, np.float32))
    # decoy with the val image's name in dir 1: the pre-fix behavior reads it
    t7.save_t7(str(dir1 / f"{val_name}.t7"),
               np.full((D, W, H), 99.0, np.float32))
    t7.save_t7(str(dir2 / f"{val_name}.t7"),
               np.full((D, W, H), 2.0, np.float32))
    with open(vqa_dir / "data_prepro.json", "w") as f:
        json.dump({"unique_img_train": [f"train2014/{train_name}.jpg",
                                        f"val2014/{val_name}.jpg"],
                   "unique_img_test": []}, f)
    with h5py.File(vqa_dir / "data_prepro.h5", "w") as h5:
        h5["img_pos_train"] = np.asarray([1, 2], np.int64)
        h5["datatype_train"] = np.asarray([1, 2], np.int32)

    out = str(tmp_path / "packed")
    rc = main(["pack-features", "--feat-dir", str(dir1),
               "--feat-dir", str(dir2), "--vqa-dir", str(vqa_dir),
               "--out", out, "--cnnout-dim", str(D), "--cnnout-w", str(W),
               "--cnnout-h", str(H)])
    assert rc == 0
    store = PackedFeatureStore(out)
    got = store.get_batch([f"{train_name}.t7", f"{val_name}.t7"], [1, 1])
    assert float(got[0].mean()) == 1.0
    assert float(got[1].mean()) == 2.0   # NOT the 99.0 decoy from dir 1


@pytest.mark.slow
def test_profile_command(tmp_path):
    out = str(tmp_path / "trace")
    rc = main(["profile", "--out", out, "--steps", "2", "--preset", "ours_ms",
               "--nhop", "1", "--batch-size", "8", "--cnnout-dim", "16",
               "--cnnout-w", "2", "--cnnout-h", "2"])
    assert rc == 0
    # a trace directory with at least one artifact
    found = []
    for root, _, files in os.walk(out):
        found += files
    assert found, "profiler produced no trace files"


def test_fused_eval_flag(trained_run, tmp_path):
    """--fused-eval works off-TPU (Pallas interpret auto-selected)."""
    ck = sorted(glob.glob(os.path.join(trained_run, "snapshot",
                                       "*.msgpack")))[-1]
    fix = os.path.join(trained_run, "fixture")
    rc = main(["eval", "--checkpoint", ck, "--preset", "ours_ms",
               "--fused-eval",
               "--vqa-dir", os.path.join(fix, "vqa_prepro"),
               "--feat-dir", os.path.join(fix, "feat"),
               "--split", "val2014", "--test-batch-size", "8",
               "--gt-anno", os.path.join(fix, "vqa_prepro",
                                         "gt_annotations.json"),
               "--save-dir", str(tmp_path / "fused_eval")])
    assert rc == 0


def test_submission_file_schema(trained_run):
    """Result JSONs must match the VQA eval-server contract exactly:
    name vqa_<task>_mscoco_<split>_<alg><NN>hop-<epoch>_results.json,
    content [{"answer": str, "question_id": int}] (reference :1171-1186)."""
    import json
    import re

    files = glob.glob(os.path.join(trained_run, "results", "hop_*",
                                   "vqa_*_results.json"))
    assert files
    pat = re.compile(
        r"vqa_(OpenEnded|MultipleChoice)_mscoco_[\w-]+_.+\d{2}hop-\d+\.\d{2}_results\.json$")
    for path in files:
        assert pat.search(os.path.basename(path)), path
        with open(path) as f:
            rows = json.load(f)
        assert isinstance(rows, list) and rows
        for row in rows[:5]:
            assert set(row) == {"answer", "question_id"}
            assert isinstance(row["answer"], str)
            assert isinstance(row["question_id"], int)


def test_data_script_syntax():
    import subprocess
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(["bash", "-n", os.path.join(root, "scripts",
                                                   "get_data.sh")])
    assert r.returncode == 0


@pytest.mark.slow
def test_fused_train_flag(tmp_path):
    """--fused-train trains the fixture through the fused-semantics hop loop
    (pure-XLA reference path off-TPU) and still learns/evaluates."""
    import json
    wd = str(tmp_path / "fused_train_run")
    rc = main(["train", "--preset", "ours_ms", "--fixture", "--nhop", "2",
               "--epochs", "2", "--save-dir", wd,
               "--fused-train", "--fused-train-block", "8"])
    assert rc == 0
    with open(os.path.join(wd, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["model"]["fused_train"] is True
    assert cfg["model"]["fused_train_block"] == 8
    assert glob.glob(os.path.join(wd, "results", "hop_01", "vqa_OpenEnded_*"))
    with open(os.path.join(wd, "training_log", "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    losses = [r["loss"] for r in rows if r.get("kind") == "train"]
    assert len(losses) == 2 and losses[-1] < losses[0]


def test_load_backbone_state_vgg(tmp_path):
    """rau-vqa serve --backbone vgg16 --backbone-state: a torchvision-format
    state_dict converts into the serving param tree."""
    import numpy as np
    import torch

    from rau_vqa_tpu.cli import _load_backbone_state

    conv_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    widths = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    state, c_in = {}, 3
    for idx, c_out in zip(conv_indices, widths):
        state[f"features.{idx}.weight"] = torch.zeros(c_out, c_in, 3, 3)
        state[f"features.{idx}.bias"] = torch.zeros(c_out)
        c_in = c_out
    path = str(tmp_path / "vgg16.pth")
    torch.save(state, path)
    params = _load_backbone_state("vgg16", path)
    assert len(params["convs"]) == 13
    assert params["convs"][0]["w"].shape == (3, 3, 3, 64)
    assert params["convs"][-1]["w"].shape == (3, 3, 512, 512)
    with pytest.raises(SystemExit):
        _load_backbone_state("vgg16", "")


def test_platform_flag(tmp_path):
    """--platform pins jax_platforms before dispatch (outage escape hatch);
    both '--platform cpu' and '--platform=cpu' forms; bogus names fail
    loudly.  Under the test env the pin is already cpu, so asserting the
    config value is exact."""
    import jax

    rc = main(["--platform", "cpu", "fixture", "--out",
               str(tmp_path / "a")])
    assert rc == 0
    assert str(jax.config.jax_platforms) == "cpu"
    rc = main(["--platform=cpu", "fixture", "--out", str(tmp_path / "b")])
    assert rc == 0
    with pytest.raises(SystemExit, match="cpu|tpu|axon"):
        main(["--platform", "bogus", "fixture", "--out",
              str(tmp_path / "c")])


@pytest.mark.slow
def test_bench_cpu_smoke():
    """The driver's exact `python bench.py` entry point runs end-to-end on
    a pinned-CPU interpreter (env-shrunk sizes, auto-shrunk canary) and
    emits the one-line JSON contract.  Guards against trace-time breaks
    that would otherwise surface only as a crashed BENCH_r{N} artifact on
    the real rig (the backbone-flag-leaf crash shipped exactly that way)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAU_BENCH_B="16", RAU_BENCH_K="2",
               RAU_BENCH_ROUNDS="1")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import bench; bench.main()"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert line["metric"] == "vqa_questions_per_sec_per_chip"
    assert line["value"] > 0 and "error" not in line
    assert "rig_canary_tflops" in line and "spread" in line


@pytest.mark.slow
def test_bench_pixels_cpu_smoke():
    """Same contract for `python bench_pixels.py` (tiny flags)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import sys; sys.argv = ['bench_pixels', '--batch', '2',"
         "'--size', '64', '--chain', '2', '--rounds', '1'];"
         "import bench_pixels; bench_pixels.main()"],
        cwd=repo, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert line["metric"] == "pixels_questions_per_sec_per_chip"
    assert line["value"] > 0 and "error" not in line


@pytest.mark.slow
def test_bench_scripts_cpu_smoke():
    """The auxiliary measurement scripts (precompute throughput bench,
    serving batch-knee probe) also run end-to-end on a pinned-CPU
    interpreter with tiny flags — same rationale as the bench smokes."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cases = [
        ("scripts/bench_precompute.py",
         ["--backbone", "vgg16", "--n", "6", "--size", "64", "--batch", "2"],
         "precompute_images_per_sec"),
        ("scripts/probe_serving_batch.py",
         ["--batches", "4,8", "--rounds", "1", "--chain", "2",
          "--canary", "128,2,1"],
         None),
        ("scripts/bench_serve.py",
         ["--tiny", "--clients", "4", "--requests", "2", "--unloaded", "4",
          "--max-batch", "4"],
         "serve_questions_per_sec"),
        ("scripts/bench_train.py",
         ["--batch", "8", "--steps", "1", "--rounds", "1",
          "--variants", "plain"],
         "train_ms_per_step"),
        # from-pixels training variant: frozen vgg backbone featurizes
        # inline in the chained train step (tiny 64px images)
        ("scripts/bench_train.py",
         ["--batch", "6", "--qpi", "3", "--steps", "1", "--rounds", "1",
          "--variants", "pixels", "--pixels-size", "64",
          "--preset", "ours_ms"],
         "train_ms_per_step"),
        ("scripts/profile_vit.py",
         ["--batch", "2", "--chain", "1", "--rounds", "1"],
         "vit_profile_ms"),
    ]
    for script, flags, metric in cases:
        # sys.path[0] = scripts/ replicates `python scripts/foo.py` (the
        # sweep's invocation): cwd is NOT importable, so a script missing
        # its repo-root path shim fails here like it would on the rig.
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms', 'cpu');"
             "import sys, os.path;"
             f"sys.path[0] = os.path.dirname(os.path.abspath({script!r}));"
             f"sys.argv = [{script!r}] + {flags!r};"
             f"import runpy; runpy.run_path({script!r}, "
             "run_name='__main__')"],
            cwd=repo, capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, (script, r.stderr[-3000:])
        line = json.loads(r.stdout.strip().splitlines()[-1])
        assert "error" not in line, (script, line)
        if metric:
            assert line["metric"] == metric and line["value"] > 0
        else:
            assert line["sweep"][0]["qps"] > 0


@pytest.mark.slow
def test_bench_artifact_cpu_smoke(tmp_path):
    """`bench.py --artifact` and `bench_pixels.py --artifact` build the
    chained-program artifact when missing, reuse it on a second run (no
    rebuild), and emit the JSON contract with "artifact": true — the
    measurement path VERDICT r3 #6 asked for."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAU_BENCH_B="16", RAU_BENCH_K="2",
               RAU_BENCH_ROUNDS="1")
    art = str(tmp_path / "serve_chain")
    for i in range(2):
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms', 'cpu');"
             f"import sys; sys.argv = ['bench', '--artifact', {art!r}];"
             "import bench; bench.main()"],
            cwd=repo, env=env, capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stderr[-3000:]
        line = json.loads(r.stdout.strip().splitlines()[-1])
        assert line["artifact"] is True and line["value"] > 0
        built = "building chain artifact" in r.stderr
        assert built == (i == 0), (i, r.stderr[-1500:])

    part = str(tmp_path / "pixels_chain")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import sys; sys.argv = ['bench_pixels', '--batch', '2',"
         f"'--size', '64', '--chain', '2', '--rounds', '1',"
         f"'--artifact', {part!r}];"
         "import bench_pixels; bench_pixels.main()"],
        cwd=repo, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert line["artifact"] is True and line["value"] > 0


@pytest.mark.slow
def test_serve_cli_end_to_end(trained_run):
    """The `rau-vqa serve` SUBCOMMAND wiring (arg plumbing -> RAUService ->
    HTTP server), exercised as a real subprocess + HTTP round trip — the
    service class itself is unit-tested in test_serve.py, but the CLI
    dispatch block was not (the round-4 `eval --fixture` bug was exactly
    this class of gap)."""
    import http.client
    import json
    import signal
    import socket
    import subprocess
    import sys
    import time

    ck = sorted(glob.glob(os.path.join(trained_run, "snapshot",
                                       "*.msgpack")))[-1]
    fix = os.path.join(trained_run, "fixture")
    with socket.socket() as s:        # free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    feat_name = sorted(os.listdir(os.path.join(fix, "feat")))[0]
    proc = subprocess.Popen(
        [sys.executable, "-m", "rau_vqa_tpu.cli", "--platform", "cpu",
         "serve", "--checkpoint", ck, "--preset", "ours_ms",
         "--vqa-dir", os.path.join(fix, "vqa_prepro"),
         "--feat-dir", os.path.join(fix, "feat"), "--port", str(port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True)
    try:
        deadline = time.time() + 120
        last_err = None
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"serve exited rc={proc.returncode}: "
                    f"{proc.stderr.read()[-2000:]}")
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=5)
                conn.request("GET", "/healthz")
                assert conn.getresponse().status == 200
                break
            except (ConnectionError, OSError, socket.timeout) as e:
                last_err = e
                time.sleep(1.0)
        else:
            raise AssertionError(f"serve never came up: {last_err}")

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        body = json.dumps({"question": "what color is the ball",
                           "feat_name": feat_name})
        conn.request("POST", "/answer", body=body)
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()[:500]
        out = json.loads(resp.read())
        assert len(out["answers"]) == 5
        assert all("answer" in a and "score" in a for a in out["answers"])
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["requests_served"] >= 1
    finally:
        proc.send_signal(signal.SIGTERM)     # direct pid, never by pattern
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=20)


def test_eval_ft_preset_from_features(trained_run, tmp_path):
    """`rau-vqa eval --preset ours_resnet_ft` on precomputed features must
    work: evaluate() never trains, so the preset's train_backbone=True is
    forced off instead of surfacing Trainer's training-oriented 'needs an
    image data source' ValueError (the guard lived in cmd_train only)."""
    ck = sorted(glob.glob(os.path.join(trained_run, "snapshot",
                                       "*.msgpack")))[-1]
    out = str(tmp_path / "eval_ft_out")
    rc = main(["eval", "--checkpoint", ck, "--preset", "ours_resnet_ft",
               "--fixture", "--save-dir", out])
    assert rc == 0
    assert glob.glob(os.path.join(out, "results", "hop_01",
                                  "vqa_OpenEnded_*"))
