"""Observability: curve PNG rendering, attention dumps, profiler hook."""

import glob
import os

import numpy as np
import pytest

from rau_vqa_tpu.utils.logging import MetricsLogger, per_hop_record
from rau_vqa_tpu.utils.plots import render_curves
from rau_vqa_tpu.utils.visatt import dump_attention_maps, save_attention_png


def test_metrics_logger_roundtrip(tmp_path):
    log = MetricsLogger(str(tmp_path))
    log.log({"epoch": 1, "loss": 1.5,
             **per_hop_record({"trainacc": [0.1, 0.2]})}, kind="train")
    log.log({"epoch": 1, **per_hop_record({"testOEacc": [0.3, 0.4]})},
            kind="test")
    rows = log.read(kind="train")
    assert rows[0]["trainacc_01"] == 0.1
    assert rows[0]["trainacc_02"] == 0.2
    assert log.read(kind="test")[0]["testOEacc_02"] == 0.4


def test_metrics_logger_tolerates_torn_tail(tmp_path):
    """A dashboard read racing the trainer's append can see a partially
    flushed final line: skip it (it completes by the next refresh); a
    corrupt line ANYWHERE ELSE still raises."""
    import json

    import pytest

    log = MetricsLogger(str(tmp_path))
    log.log({"epoch": 1, "loss": 1.0}, kind="train")
    with open(log.path, "a") as f:
        f.write('{"epoch": 2, "los')          # torn mid-append
    rows = log.read(kind="train")
    assert len(rows) == 1 and rows[0]["epoch"] == 1
    with open(log.path, "a") as f:            # now completed + one more
        f.write('s": 2.0, "kind": "train"}\n')
    assert len(log.read(kind="train")) == 2
    # corruption NOT at the tail is a real error, not a skip
    with open(log.path, "w") as f:
        f.write("garbage\n")
        f.write(json.dumps({"epoch": 1, "kind": "train"}) + "\n")
    with pytest.raises(json.JSONDecodeError):
        log.read()


def test_checkpoint_keep_last_sorts_by_step(tmp_path):
    """Pruning ranks snapshots by PARSED step: lexicographic order puts
    iter1000000 before iter999999 and would delete the newest."""
    import numpy as np

    from rau_vqa_tpu.utils.checkpoint import save_checkpoint

    d = str(tmp_path / "ck")
    tree = {"w": np.zeros(2, np.float32)}
    for step in (999998, 999999, 1000000):
        save_checkpoint(d, step, float(step), tree, keep_last=2)
    kept = sorted(f for f in os.listdir(d) if f.endswith(".msgpack"))
    assert any("iter999999" in f for f in kept)
    assert any("iter1000000" in f for f in kept)
    assert not any("iter999998" in f for f in kept)


def test_tile_batch_images_pad_exceeds_batch():
    """pad > B must still fill the grid (zeros_like(imgs[:pad]) under-
    filled and broke row assembly)."""
    import numpy as np

    from rau_vqa_tpu.utils.visatt import tile_batch_images

    grid = tile_batch_images(np.ones((2, 4, 4), np.float32), n_cols=5)
    assert grid.shape == (4, 20)
    assert grid[:, :8].min() == 1.0 and grid[:, 8:].max() == 0.0


def test_render_curves(tmp_path):
    log = MetricsLogger(str(tmp_path / "logs"))
    for e in range(1, 4):
        log.log({"epoch": e, "lr": 0.1 * 0.9 ** e, "mult_lr": 0.01,
                 **per_hop_record({"trainacc": [0.1 * e, 0.2 * e],
                                   "trainloss": [2.0 / e, 1.5 / e],
                                   "do_pred_loss": [0.5 / e, 0.4 / e]})},
                kind="train")
        log.log({"epoch": e,
                 **per_hop_record({"testOEacc": [0.15 * e, 0.25 * e]})},
                kind="test")
    written = render_curves(str(tmp_path / "logs"), str(tmp_path / "graphs"),
                            n_hops=2)
    names = {os.path.basename(p) for p in written}
    assert "accuracy_curve_hop01.png" in names
    assert "loss_curve_hop02.png" in names
    assert "do_pred_loss_curve_hop01.png" in names
    assert "learning_rate.png" in names
    assert all(os.path.getsize(p) > 0 for p in written)


def test_attention_dumps(tmp_path):
    rs = np.random.RandomState(0)
    att = rs.rand(4, 3, 6).astype(np.float32)  # [H+2, B, S] with 3x2 grid
    n = dump_attention_maps(str(tmp_path / "figures"), 2.0, att,
                            [101, 102, 103], 3, 2)
    assert n == 12
    files = glob.glob(str(tmp_path / "figures" / "epoch_002" / "hop_001" /
                          "*.png"))
    assert len(files) == 3
    # uniform map edge case
    save_attention_png(str(tmp_path / "flat.png"),
                       np.full((3, 2), 0.5, np.float32))
    assert os.path.getsize(str(tmp_path / "flat.png")) > 0


def test_dashboard_serves(tmp_path):
    import threading
    import urllib.request
    from http.server import HTTPServer

    from rau_vqa_tpu.utils.dashboard import make_handler

    wd = str(tmp_path / "run")
    log = MetricsLogger(os.path.join(wd, "training_log"))
    log.log({"epoch": 1, "loss": 2.0, "lr": 0.003,
             **per_hop_record({"trainacc": [0.5], "trainloss": [1.9]})},
            kind="train")
    server = HTTPServer(("127.0.0.1", 0), make_handler(wd, 1))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10).read().decode()
        assert "latest train record" in page and "trainacc_01" in page
        raw = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics.jsonl", timeout=10).read()
        assert b"trainacc_01" in raw
        # nested visatt figures serve; directory escapes are refused
        from rau_vqa_tpu.utils.visatt import dump_attention_maps
        att = np.random.RandomState(0).rand(3, 1, 6).astype(np.float32)
        dump_attention_maps(os.path.join(wd, "figures"), 1.0, att, [7], 3, 2)
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/figures/epoch_001/hop_001/7.png",
            timeout=10).read()
        assert png[:4] == b"\x89PNG"
        import urllib.error
        import pytest
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/figures/%2e%2e/training_log/"
                f"metrics.jsonl", timeout=10)
    finally:
        server.shutdown()


def test_dashboard_sparklines_and_attention(tmp_path):
    """Sparklines render as inline SVG with no matplotlib involvement, and
    the attention browser lists figures/ dumps (BACKLOG #7)."""
    import json
    from rau_vqa_tpu.utils.dashboard import (
        _attention_browser,
        _page,
        _sparkline,
    )
    wd = str(tmp_path)
    os.makedirs(os.path.join(wd, "training_log"))
    with open(os.path.join(wd, "training_log", "metrics.jsonl"), "w") as f:
        for e in range(5):
            f.write(json.dumps({"kind": "train", "epoch": e + 1,
                                "loss": 3.0 - 0.3 * e, "uni_acc": 0.2 * e,
                                "select_acc": 0.1 * e,
                                "examples_per_sec": 100.0 + e}) + "\n")
            f.write(json.dumps({"kind": "test", "epoch": e + 1,
                                "testOEacc_01": 0.1 * e}) + "\n")
    page = _page(wd, 1)
    assert "<svg" in page and "polyline" in page
    assert "matplotlib" not in page
    # sparkline handles short/NaN series gracefully
    assert _sparkline([]) == "<i>n/a</i>"
    assert "<svg" in _sparkline([1.0, float("nan"), 2.0, 3.0])
    # attention browser: the REAL visatt layout is nested
    # figures/epoch_XXX/hop_XXX/<qid>.png
    from rau_vqa_tpu.utils.visatt import dump_attention_maps
    att = np.random.RandomState(0).rand(3, 2, 6).astype(np.float32)
    dump_attention_maps(os.path.join(wd, "figures"), 1.0, att, [7, 9], 3, 2)
    got = _attention_browser(wd)
    assert "epoch_001/hop_001/7.png" in got


def test_file_utils_roundtrip(tmp_path):
    from rau_vqa_tpu.utils.file_utils import text_read, write_text

    path = str(tmp_path / "lines.txt")
    write_text(path, ["alpha", "beta", ""])
    assert text_read(path) == ["alpha", "beta", ""]


def test_rig_canary_smoke():
    """The bench canary must run on any backend and return a sane record
    (tiny n so this stays in the fast loop)."""
    from rau_vqa_tpu.utils.rigcheck import matmul_canary

    out = matmul_canary(n=256, iters=4, rounds=2)
    assert set(out) == {"tflops", "frac_of_peak", "ms_per_matmul"}
    assert out["tflops"] > 0 and out["ms_per_matmul"] > 0
    assert 0 < out["frac_of_peak"] < 1.5


def test_bench_watchdog_fire_and_cancel():
    """The bench watchdog prints ONE parseable JSON error line and
    hard-exits when the deadline passes (a hung TPU tunnel blocks the
    main thread in C code, so exceptions can't be delivered); a
    cancelled watchdog never fires."""
    import json
    import subprocess
    import sys

    from rau_vqa_tpu.utils.rigcheck import bench_watchdog

    # cancel path: arming + cancelling leaves no timer behind
    t = bench_watchdog("m", "u", timeout_s=60)
    t.cancel()

    # fire path: a subprocess that blocks past a tiny deadline (cwd pinned
    # to the repo root so the package imports even when pytest runs from
    # elsewhere)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "from rau_vqa_tpu.utils.rigcheck import bench_watchdog\n"
         "import time\n"
         "bench_watchdog('vqa_questions_per_sec_per_chip',"
         " 'questions/sec', timeout_s=0.3)\n"
         "time.sleep(30)\n"],
        capture_output=True, text=True, timeout=60, cwd=repo_root)
    assert proc.returncode == 3
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["metric"] == "vqa_questions_per_sec_per_chip"
    assert line["value"] == 0.0 and "watchdog" in line["error"]


def test_bench_preflight(monkeypatch, capsys):
    """A hung/erroring device probe exits 3 with the driver-parseable
    error JSON line (fast path of the watchdog contract); a healthy probe
    passes through."""
    import json

    import pytest

    from rau_vqa_tpu.utils import doctor, rigcheck

    # honor_cpu_pin=False: the test env pins jax to CPU (conftest), which
    # the production default rightly short-circuits
    monkeypatch.setattr(doctor, "_probe",
                        lambda code, t: {"status": "hung", "detail": "x"})
    with pytest.raises(SystemExit) as ex:
        rigcheck.bench_preflight("m", "u", timeout_s=1.0,
                                 honor_cpu_pin=False)
    assert ex.value.code == 3
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["metric"] == "m" and "preflight" in line["error"]

    monkeypatch.setattr(doctor, "_probe",
                        lambda code, t: {"status": "ok", "n": 1,
                                         "platform": "axon", "kind": "tpu"})
    assert rigcheck.bench_preflight("m", "u", honor_cpu_pin=False)["n"] == 1
    # an UNPINNED probe resolving to the CPU fallback is a failure too:
    # the bench would emit a TPU-labeled number measured on host
    monkeypatch.setattr(doctor, "_probe",
                        lambda code, t: {"status": "ok", "n": 1,
                                         "platform": "cpu", "kind": "cpu"})
    with pytest.raises(SystemExit):
        rigcheck.bench_preflight("m", "u", honor_cpu_pin=False)
    assert "fallback" in capsys.readouterr().out
    # the cpu-pin short-circuit itself: no subprocess probe at all
    monkeypatch.setattr(doctor, "_probe",
                        lambda code, t: (_ for _ in ()).throw(
                            AssertionError("probe must not run")))
    assert rigcheck.bench_preflight("m", "u")["platform"] == "cpu"


@pytest.mark.slow   # fast-loop budget (VERDICT r4 #5); full suite runs it
def test_doctor_probe_outcomes_and_report(monkeypatch, capsys):
    """_probe classifies ok/hung/error via subprocess+timeout (a hung
    tunnel never raises — the timeout IS the detection); the CLI prints a
    human block to stderr and one JSON line to stdout, exit code from
    report['healthy']."""
    import json

    from rau_vqa_tpu.utils import doctor as doc

    ok = doc._probe("import json; print(json.dumps({'n': 1}))", 30)
    assert ok["status"] == "ok" and ok["n"] == 1
    hung = doc._probe("import time; time.sleep(20)", 1.0)
    assert hung["status"] == "hung"
    err = doc._probe("raise RuntimeError('boom')", 30)
    assert err["status"] == "error" and "boom" in err["detail"]

    # the device probe must RUN one op, not just list devices: the
    # exec-wedge mode (init ok, every dispatch hangs — observed
    # 2026-08-20) is invisible to a jax.devices()-only probe.  Exercised
    # here on the pinned-CPU backend; on the rig the same snippet hangs
    # in the subprocess and the timeout classifies it 'hung'.
    dev = doc._probe(doc._DEVICE_PROBE.format(
        force_cpu='jax.config.update("jax_platforms", "cpu")'), 120)
    assert dev["status"] == "ok" and dev["exec"] == "ok"

    fake = {
        "versions": {"jax": "0.0"},
        "device": {"status": "hung", "detail": "x"},
        "cpu": {"status": "ok", "n": 8, "platform": "cpu", "kind": "cpu"},
        "native_features": {"status": "ok"},
        "native_images": {"status": "ok"},
        "healthy": False,
    }
    text = doc.format_report(fake)
    assert "HUNG" in text and "UNHEALTHY" in text and "8x cpu" in text
    # hung device + live host -> the report points at the escape hatch
    assert "--platform cpu" in text

    from rau_vqa_tpu import cli
    monkeypatch.setattr(doc, "run_doctor", lambda **kw: fake)
    rc = cli.main(["doctor"])
    assert rc == 1
    out = capsys.readouterr()
    assert json.loads(out.out.strip().splitlines()[-1])["healthy"] is False
    assert "UNHEALTHY" in out.err


def test_error_line_carries_last_measured(monkeypatch, capsys):
    """During an outage the failure artifact stays interpretable: the
    error JSON line embeds the most recent healthy-rig measurement
    recorded for the same metric under benchmarks/ (value stays 0.0 —
    nothing was measured THIS run)."""
    import json

    from rau_vqa_tpu.utils import rigcheck

    rec = rigcheck._last_recorded("vqa_questions_per_sec_per_chip")
    assert rec is not None and rec["value"] > 0 and rec["round"] >= 3

    rigcheck._emit_error_line("vqa_questions_per_sec_per_chip",
                              "questions/sec", "boom", "note")
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["value"] == 0.0 and line["error"] == "boom"
    assert line["last_measured"]["value"] == rec["value"]

    # unknown metric: no last_measured field, never raises
    assert rigcheck._last_recorded("no_such_metric") is None
    rigcheck._emit_error_line("no_such_metric", "u", "boom", "note")
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "last_measured" not in line


def test_doctor_watch_polls_until_healthy(monkeypatch, capsys):
    """doctor --watch: re-polls while unhealthy, exits 0 the moment the
    device comes back (the unattended outage-recovery gate), exits 1 on
    --watch-timeout."""
    import json

    from rau_vqa_tpu import cli
    from rau_vqa_tpu.utils import doctor as doc

    sick = {"versions": {}, "device": {"status": "hung", "detail": "x"},
            "cpu": {"status": "ok", "n": 1, "platform": "cpu",
                    "kind": "cpu"}, "healthy": False}
    well = dict(sick, device={"status": "ok", "n": 1, "platform": "axon",
                              "kind": "tpu"}, healthy=True)
    seq = iter([sick, sick, well])
    monkeypatch.setattr(doc, "run_doctor", lambda **kw: next(seq))
    rc = cli.main(["doctor", "--watch", "--watch-interval", "0.01"])
    assert rc == 0
    out = capsys.readouterr()
    assert json.loads(out.out.strip().splitlines()[-1])["healthy"]
    assert out.err.count("next poll") == 2

    monkeypatch.setattr(doc, "run_doctor", lambda **kw: dict(sick))
    rc = cli.main(["doctor", "--watch", "--watch-interval", "0.01",
                   "--watch-timeout", "0.02"])
    assert rc == 1
    assert "giving up" in capsys.readouterr().err


def test_compile_cache_seed_and_refresh(tmp_path, monkeypatch):
    """The committed seed dir warms a fresh checkout's (gitignored) live
    cache, and refresh_cache_seed curates live->seed: bench-prefix +
    size-gated copy in, stale same-prefix entries dropped (round-5 root
    cause: the driver benches a clean checkout where the ignored live
    cache is always empty, re-paying the 700-930 s compile lottery)."""
    import importlib.util
    import jax

    from rau_vqa_tpu.utils import rigcheck

    live = tmp_path / "live"
    seed = tmp_path / "seed"
    seed.mkdir()
    (seed / "jit_serve_chain-aaaa-cache").write_bytes(b"X" * 64)
    (seed / "not_an_entry.txt").write_text("ignored")

    # enabling with a seed copies missing entries into the live dir
    before = jax.config.jax_compilation_cache_dir
    try:
        assert rigcheck.enable_compile_cache(str(live), seed_dir=str(seed))
        assert (live / "jit_serve_chain-aaaa-cache").read_bytes() == b"X" * 64
        assert not (live / "not_an_entry.txt").exists()
        # an existing live entry is never clobbered by the seed
        (live / "jit_serve_chain-aaaa-cache").write_bytes(b"Y" * 64)
        assert rigcheck.enable_compile_cache(str(live), seed_dir=str(seed))
        assert (live / "jit_serve_chain-aaaa-cache").read_bytes() == b"Y" * 64
    finally:
        jax.config.update("jax_compilation_cache_dir", before)

    spec = importlib.util.spec_from_file_location(
        "refresh_cache_seed",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts",
            "refresh_cache_seed.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    big = b"Z" * (mod.MIN_BYTES + 1)
    (live / "jit_serve_chain-bbbb-cache").write_bytes(big)      # new program
    (live / "jit_mfu_probe-cccc-cache").write_bytes(big)
    (live / "jit__uniform-dddd-cache").write_bytes(big)         # wrong prefix
    (live / "jit_serve_chain-tiny-cache").write_bytes(b"t")     # too small
    n = mod.refresh(str(live), str(seed), log=lambda *a: None)
    names = sorted(p.name for p in seed.iterdir())
    assert "jit_serve_chain-bbbb-cache" in names
    assert "jit_mfu_probe-cccc-cache" in names
    assert "jit__uniform-dddd-cache" not in names
    assert "jit_serve_chain-tiny-cache" not in names
    # the old seed entry was REPLACED by a newer same-prefix live entry
    assert "jit_serve_chain-aaaa-cache" not in names
    # replacement semantics: absence from live alone is NOT staleness —
    # clearing the live dir and refreshing must keep committed seeds
    import shutil as _sh
    for f in live.iterdir():
        f.unlink()
    n2 = mod.refresh(str(live), str(seed), log=lambda *a: None)
    assert n2 == n and "jit_serve_chain-bbbb-cache" in sorted(
        p.name for p in seed.iterdir())
    assert n == 2
