"""HTTP inference service: train on the fixture, serve, query over HTTP."""

import glob
import json
import os
import threading
import urllib.request

import pytest

# module-scope: the session fixture trains a model (~25 s)
pytestmark = pytest.mark.slow

from rau_vqa_tpu.cli import main


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("serve_run"))
    main(["train", "--preset", "ours_ms", "--fixture", "--nhop", "2",
          "--epochs", "25", "--save-dir", wd])
    ck = sorted(glob.glob(os.path.join(wd, "snapshot", "*.msgpack")))[-1]
    fix = os.path.join(wd, "fixture")

    from rau_vqa_tpu.serve import RAUService, serve
    svc = RAUService(ck, os.path.join(fix, "vqa_prepro"),
                     [os.path.join(fix, "feat")], preset="ours_ms")
    server = serve(svc, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    served.svc = svc        # expose for batching assertions
    served.ck = ck          # for the artifact-serving parity test
    served.fix = fix
    yield port
    server.shutdown()


def _post(port, payload, path="/answer"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_healthz(served):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{served}/healthz", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_answer_endpoint(served):
    out = _post(served, {"question": "w01 w02 w03",
                         "feat_name": "COCO_train2014_000000000000.t7",
                         "topk": 3})
    assert len(out["answers"]) == 3
    assert all(a["answer"].startswith("ans") for a in out["answers"])
    assert len(out["per_hop"]) == 2
    # scores sorted descending
    scores = [a["score"] for a in out["answers"]]
    assert scores == sorted(scores, reverse=True)


def test_answer_datatype_routing(served):
    """The request-level datatype field reaches the feature source: with
    ONE feature dir, datatype=2 must be a loud 400 (the 1-based routing
    guard), and the default datatype=1 resolves normally."""
    import urllib.error

    payload = {"question": "w01",
               "feat_name": "COCO_train2014_000000000000.t7"}
    out = _post(served, dict(payload, datatype=1))
    assert out["answers"]
    try:
        _post(served, dict(payload, datatype=2))
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


def test_answer_endpoint_errors(served):
    # missing operand -> clean 400, not a crash
    try:
        _post(served, {"question": "w01"})
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
        assert "feat_name" in json.loads(e.read())["error"]
    assert raised

    try:
        _post(served, {"question": "w01", "feat_name": "no-such-file.t7"})
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


def test_int8_features_preserve_accuracy(tmp_path_factory):
    """Serving from int8-quantized feature shards must keep fixture accuracy
    (within a couple of answers of the f32 store)."""
    import json
    import numpy as np
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train import make_trainer
    from rau_vqa_tpu.data.features import PackedFeatureStore, pack_feature_dir
    from rau_vqa_tpu.data.fixtures import generate_fixture

    root = str(tmp_path_factory.mktemp("int8fix"))
    vqa_dir = generate_fixture(root)
    trainer = make_trainer(root, str(tmp_path_factory.mktemp("int8run")))
    trainer.fit(epochs=25, eval_each=False)
    base = trainer.evaluate(write_submissions=False)

    with open(os.path.join(vqa_dir, "data_prepro.json")) as f:
        info = json.load(f)
    imgs = info["unique_img_train"] + info["unique_img_test"]
    from rau_vqa_tpu.data.fixtures import FixtureSpec
    spec = FixtureSpec()
    shard = os.path.join(root, "packed8")
    pack_feature_dir([os.path.join(root, "feat")], imgs, [1] * len(imgs),
                     shard, spec.feat_dim, spec.feat_w, spec.feat_h,
                     dtype="int8")
    trainer.source = PackedFeatureStore(shard)
    quant = trainer.evaluate(write_submissions=False)
    for a, b in zip(base["testOEacc"], quant["testOEacc"]):
        assert abs(a - b) <= 2 / 32 + 1e-9  # at most 2 answers differ


def test_bucketed_predict_is_exact():
    """Bucketed dispatch returns bit-identical predictions to the full
    seq_len run for every bucket branch (truncation past the last real
    token is exact under the last-token gather)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rau_vqa_tpu.config import ModelConfig
    from rau_vqa_tpu.eval.predict import make_predict_step
    from rau_vqa_tpu.models.rau import init_params

    cfg = ModelConfig(vocab_size=40, answer_size=11, seq_len=20,
                      embed_dim=8, rnn_size=16, rnn_layers=2, cnn_dim=12,
                      cnn_w=3, cnn_h=2, multfeat_dim=16, attfeat_dim=8,
                      att_rnn_size=16, att_rnn_layers=1, n_hops=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    full = make_predict_step(cfg)
    bucketed = make_predict_step(cfg, buckets=(6, 12))
    rs = np.random.RandomState(0)
    B = 5
    feats = jnp.asarray(rs.randn(B, cfg.cnn_spat, cfg.cnn_dim), jnp.float32)
    for max_len in (4, 6, 9, 17, 20):   # exercises every bucket + full
        lengths = np.minimum(rs.randint(1, max_len + 1, B), max_len)
        lengths[0] = max_len            # pin the max
        tokens = np.zeros((B, cfg.seq_len), np.int32)
        for b in range(B):
            tokens[b, :lengths[b]] = rs.randint(1, cfg.vocab_size,
                                                lengths[b])
        tokens = jnp.asarray(tokens)
        lengths = jnp.asarray(lengths, jnp.int32)
        want_p, want_a = full(params, tokens, lengths, feats)
        got_p, got_a = bucketed(params, tokens, lengths, feats)
        np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))
        np.testing.assert_array_equal(np.asarray(got_a), np.asarray(want_a))


def test_concurrent_requests_micro_batch(served):
    """Concurrent posts share device dispatches (dynamic micro-batching)
    and every request still gets its own correct answer."""
    import concurrent.futures

    # sequential references first (each on its own dispatch)
    feats = [f"COCO_train2014_{i:012d}.t7" for i in range(4)]
    qs = [f"w01 w0{i + 2} w03" for i in range(4)]
    seq = [_post(served, {"question": q, "feat_name": f, "topk": 1})
           for q, f in zip(qs, feats)]

    from tests import test_serve as _self
    _svc = _self.served.svc
    _svc.max_wait_ms = 50.0     # generous linger: guarantee group formation
    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        futs = [ex.submit(_post, served,
                          {"question": q, "feat_name": f, "topk": 1})
                for q, f in zip(qs, feats) for _ in range(3)]
        got = [f.result() for f in futs]
    by_q = {}
    for r in got:
        by_q.setdefault(r["question"], set()).add(
            r["answers"][0]["answer"])
    for ref in seq:
        assert by_q[ref["question"]] == {ref["answers"][0]["answer"]}, (
            "concurrent answer diverged from sequential")
    assert max(_svc._batch_sizes_served) > 1, (
        f"no request group formed: {_svc._batch_sizes_served}")
    _svc.max_wait_ms = 5.0


def test_image_feature_cache(served, monkeypatch):
    """Repeat image_b64 requests for one image hit the LRU feature cache:
    the backbone runs once per distinct image (VQA asks ~3 questions per
    image)."""
    import io as _io

    import numpy as np
    from PIL import Image

    svc = globals()["served"].svc     # fixture exposes the service object
    calls = {"n": 0}
    S, D = svc.mcfg.cnn_spat, svc.mcfg.cnn_dim

    def fake_extract(backbone, bb_params, arr, vit_cfg=None, **kw):
        calls["n"] += 1
        return np.zeros((arr.shape[0], S, D), np.float32)

    import rau_vqa_tpu.models.pipeline as pl
    monkeypatch.setattr(pl, "extract_features", fake_extract)
    monkeypatch.setattr(svc, "backbone", "vgg16")
    monkeypatch.setattr(svc, "bb_params", {})

    buf = _io.BytesIO()
    rs = np.random.RandomState(0)
    Image.fromarray(rs.randint(0, 256, (64, 64, 3), dtype=np.uint8)).save(
        buf, format="JPEG")
    img_bytes = buf.getvalue()
    for _ in range(3):
        svc._featurize_image(img_bytes)
    assert calls["n"] == 1
    # a different image misses the cache
    buf2 = _io.BytesIO()
    Image.fromarray(rs.randint(0, 256, (64, 64, 3), dtype=np.uint8)).save(
        buf2, format="JPEG")
    svc._featurize_image(buf2.getvalue())
    assert calls["n"] == 2


def test_answer_many_endpoint(served):
    """Several questions about one image: features once, answers for all."""
    svc = globals()["served"].svc
    out = _post(served, {"questions": ["w01 w02", "w03", "w04 w05 w06"],
                         "feat_name": "COCO_train2014_000000000000.t7"},
                path="/answer_many")
    assert len(out["results"]) == 3
    for i, r in enumerate(out["results"]):
        assert r["answers"] and "question" in r
    # the burst rode the micro-batcher (some group had >= 2 requests)
    assert max(svc._batch_sizes_served) >= 2


def test_image_feature_cache_coalesces_concurrent(served, monkeypatch):
    """Concurrent requests for ONE image run the backbone once: later
    arrivals wait on the in-flight computation instead of racing it."""
    import io as _io
    import threading as _t
    import time as _time

    import numpy as np
    from PIL import Image

    svc = globals()["served"].svc
    calls = {"n": 0}
    S, D = svc.mcfg.cnn_spat, svc.mcfg.cnn_dim

    def fake_extract(backbone, bb_params, arr, vit_cfg=None, **kw):
        calls["n"] += 1
        _time.sleep(0.2)        # widen the race window
        return np.zeros((arr.shape[0], S, D), np.float32)

    import rau_vqa_tpu.models.pipeline as pl
    monkeypatch.setattr(pl, "extract_features", fake_extract)
    monkeypatch.setattr(svc, "backbone", "vgg16")
    monkeypatch.setattr(svc, "bb_params", {})

    buf = _io.BytesIO()
    rs = np.random.RandomState(9)
    Image.fromarray(rs.randint(0, 256, (64, 64, 3), dtype=np.uint8)).save(
        buf, format="JPEG")
    img_bytes = buf.getvalue()
    results = []
    threads = [_t.Thread(target=lambda: results.append(
        svc._featurize_image(img_bytes))) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4 and calls["n"] == 1


def test_artifact_service_parity(served, tmp_path):
    """A service built from an AOT StableHLO artifact (rau-vqa export) must
    return the same answers as the checkpoint-backed service."""
    import numpy as np

    from rau_vqa_tpu.serve import RAUService
    from tests import test_serve as _self   # the fixture stashes paths on
    fix, ck = _self.served.fix, _self.served.ck   # its own function object

    art = str(tmp_path / "art")
    rc = main(["export", "--checkpoint", ck, "--out", art,
               "--eval-buckets", "8"])
    assert rc == 0
    svc = RAUService(None, os.path.join(fix, "vqa_prepro"),
                     [os.path.join(fix, "feat")], artifact=art)
    q = "w01 w02 w03"
    feat = "COCO_train2014_000000000000.t7"
    base = _post(served, {"question": q, "feat_name": feat, "topk": 3})
    out = svc.answer(q, feat_name=feat, topk=3)
    assert ([a["answer"] for a in out["answers"]]
            == [a["answer"] for a in base["answers"]])
    np.testing.assert_allclose([a["score"] for a in out["answers"]],
                               [a["score"] for a in base["answers"]],
                               rtol=1e-5, atol=1e-6)
    assert out["per_hop"] == base["per_hop"]

    # features-only artifacts carry the head's feature interface, and the
    # service adopts it for image requests routed through a separate
    # --backbone (pixels artifacts bake the RMS op instead): a raw-head
    # artifact serves raw...
    assert svc.feat_norm is False
    # ...and an RMS-head artifact (meta bit set at export from the
    # snapshot's backbone_feat_norm) makes the service featurize RMS
    import json
    mp = os.path.join(art, "meta.json")
    with open(mp) as f:
        meta = json.load(f)
    meta["backbone_feat_norm"] = True
    with open(mp, "w") as f:
        json.dump(meta, f)
    svc_rms = RAUService(None, os.path.join(fix, "vqa_prepro"),
                         [os.path.join(fix, "feat")], artifact=art)
    assert svc_rms.feat_norm is True


def test_artifact_flags_warn_not_silently_ignored(served, tmp_path):
    """--fused-eval / explicit --eval-buckets cannot take effect when
    serving from a baked artifact: the service must warn (and default
    construction must NOT warn spuriously)."""
    import warnings

    from rau_vqa_tpu.serve import RAUService
    from tests import test_serve as _self
    fix, ck = _self.served.fix, _self.served.ck

    art = str(tmp_path / "art")
    assert main(["export", "--checkpoint", ck, "--out", art,
                 "--eval-buckets", "8"]) == 0
    vqa = os.path.join(fix, "vqa_prepro")
    feat = [os.path.join(fix, "feat")]
    def serve_warnings(**kw):
        # record-and-filter (not simplefilter('error')): an unrelated
        # DeprecationWarning from a library upgrade must not fail this
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            RAUService(None, vqa, feat, artifact=art, **kw)
        return [str(x.message) for x in w
                if "artifact" in str(x.message)]

    assert serve_warnings() == []           # defaults: no artifact warning
    msgs = serve_warnings(fused=True, buckets=(4, 12))
    assert any("--fused-eval is ignored" in m for m in msgs)
    assert any("requested buckets" in m for m in msgs)
    # explicit 'disable buckets' can't take effect either — still a warning
    assert any("requested buckets" in m for m in serve_warnings(buckets=()))
    # explicitly requesting exactly the baked ladder is a no-op: silent
    assert serve_warnings(buckets=(8,)) == []


def test_pixels_artifact_service(served, tmp_path):
    """A service over a from-pixels artifact answers from raw images: the
    backbone is baked into the program, feat_name is rejected loudly, the
    micro-batch operand is uint8 pixels — and the answers match running
    the same decode + backbone + predict live."""
    import base64
    import io

    import jax
    import numpy as np
    from flax import serialization
    from PIL import Image

    from rau_vqa_tpu.config import ModelConfig
    from rau_vqa_tpu.eval.export import export_pixels_predict
    from rau_vqa_tpu.eval.predict import predict
    from rau_vqa_tpu.models.backbones.vit import ViTConfig, vit_init
    from rau_vqa_tpu.models.pipeline import extract_features
    from rau_vqa_tpu.models.rau import init_params
    from rau_vqa_tpu.serve import RAUService
    from tests import test_serve as _self
    fix, ck = _self.served.fix, _self.served.ck

    with open(ck.replace(".msgpack", ".json")) as f:
        cfg = ModelConfig(**json.load(f)["model_config"])
    with open(ck, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(
        init_params(jax.random.PRNGKey(0), cfg), tree["params"])
    # tiny ViT whose patch grid matches the fixture's 3x3x16 feature map
    vcfg = ViTConfig(image_size=12, patch=4, dim=16, depth=2, heads=4,
                     mlp_ratio=2.0)
    bb = vit_init(jax.random.PRNGKey(3), vcfg)

    art = str(tmp_path / "pix_art")
    export_pixels_predict(params, cfg, "vit", bb, art, image_size=12,
                          vit_cfg=vcfg)
    svc = RAUService(None, os.path.join(fix, "vqa_prepro"),
                     [os.path.join(fix, "feat")], artifact=art)
    assert svc.pixels_artifact and svc.image_size == 12

    with pytest.raises(ValueError, match="image_b64"):
        svc.answer("w01 w02", feat_name="COCO_train2014_000000000000.t7")

    rs = np.random.RandomState(11)
    pixels = rs.randint(0, 255, (12, 12, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(pixels).save(buf, "PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    qs = ["w01 w02 w03", "w04 w05"]
    outs = svc.answer_many(qs, image_b64=b64, topk=3, attention=True)
    # attention rows ride the artifact path too (its program returns the
    # same [H+2, B, S] table)
    for out in outs:
        att = out["attention"]
        assert att["grid"] == [3, 3] and len(att["rows"]) == 4
        assert all(abs(sum(r) - 1.0) < 1e-3 for r in att["rows"])

    # live reference: same PNG bytes through the shared decode helper,
    # then backbone + predict outside the artifact
    from rau_vqa_tpu.data.images import decode_scale_center_crop
    with Image.open(io.BytesIO(buf.getvalue())) as img:
        arr = decode_scale_center_crop(img, 12)[None]
    feats = np.asarray(extract_features("vit", bb, arr, vit_cfg=vcfg),
                       np.float32)
    for q, out in zip(qs, outs):
        toks, length = svc.data.question_to_tokens(q, normalize=True)
        tab, _ = predict(params, cfg, toks[None], np.asarray([length]),
                         feats)
        tab = np.asarray(tab)
        final = tab[-1, 0]
        want = [svc.data.answers[int(i)]
                for i in np.argsort(final)[::-1][:3]]
        assert [a["answer"] for a in out["answers"]] == want
        np.testing.assert_allclose(
            [a["score"] for a in out["answers"]],
            np.sort(final)[::-1][:3], rtol=1e-5, atol=1e-6)


def test_attention_in_response_and_stats(served):
    """{"attention": true} returns the per-hop spatial attention rows
    (each a softmax over the feature grid — the maps the reference dumps
    as PNGs); /stats exposes the micro-batcher's operator metrics."""
    feat = "COCO_train2014_000000000000.t7"
    out = _post(served, {"question": "w01 w02 w03", "feat_name": feat,
                         "attention": True})
    att = out["attention"]
    assert att["grid"] == [3, 3]
    # nhop(2) + uniform + select rows, each a 9-cell distribution
    assert len(att["rows"]) == 4
    for row in att["rows"]:
        assert len(row) == 9
        assert abs(sum(row) - 1.0) < 1e-3
    # default stays lean: no attention key
    out2 = _post(served, {"question": "w01 w02 w03", "feat_name": feat})
    assert "attention" not in out2

    import urllib.request
    with urllib.request.urlopen(
            f"http://127.0.0.1:{served}/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["dispatches"] >= 1 and stats["requests_served"] >= 2
    assert stats["mean_batch"] >= 1.0
    assert stats["pixels_artifact"] is False


def test_device_feat_cache_lru_and_eviction(served):
    """The live path keeps per-image features DEVICE-resident (round 4:
    the per-dispatch feature upload was 784 of 851 ms p50 on the rig
    tunnel).  Contract: repeat feat_names hit the same device buffer,
    the LRU evicts at feat_cache_size, and answers are identical across
    an eviction/re-stage cycle."""
    import jax
    import numpy as np

    fx = globals()["served"]          # fixture exposes the service object
    svc = fx.svc
    names = sorted(os.listdir(os.path.join(fx.fix, "feat")))[:3]

    # hermetic: earlier module tests populate the module-shared cache —
    # pre-cached names would make every _feats_for below a hit and the
    # eviction under test would never fire
    with svc._feat_cache_lock:
        svc._dev_feat_cache.clear()

    a0 = svc._feats_for(names[0], None)
    assert isinstance(a0, jax.Array)          # device-resident
    assert svc._feats_for(names[0], None) is a0   # LRU hit, same buffer

    old_size, svc.feat_cache_size = svc.feat_cache_size, 2
    try:
        before = _post(served, {"question": "w01 w02",
                                "feat_name": names[0]})
        svc._feats_for(names[1], None)
        svc._feats_for(names[2], None)        # capacity 2: evicts names[0]
        with svc._feat_cache_lock:
            assert ("f", names[0], 1) not in svc._dev_feat_cache
        # re-staged features must answer identically post-eviction
        after = _post(served, {"question": "w01 w02",
                               "feat_name": names[0]})
        assert [a["answer"] for a in after["answers"]] == \
            [a["answer"] for a in before["answers"]]
        np.testing.assert_allclose(
            [a["score"] for a in after["answers"]],
            [a["score"] for a in before["answers"]], rtol=1e-5)
    finally:
        svc.feat_cache_size = old_size

    st = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{served}/stats", timeout=30).read())
    assert st["device_feat_cache_entries"] >= 1


def test_service_without_feat_dirs(served):
    """A feat-dir-less service (the pixels-artifact / image-only mode the
    CLI supports via `--feat-dir`-less invocation) must start cleanly and
    reject feat_name requests with a clear error, not crash at startup
    with an IndexError."""
    from rau_vqa_tpu.serve import RAUService
    from tests import test_serve as _self

    fix, ck = _self.served.fix, _self.served.ck
    svc = RAUService(ck, os.path.join(fix, "vqa_prepro"), [])
    assert svc.source is None
    with pytest.raises(ValueError, match="no --feat-dir"):
        svc.answer("w01 w02", feat_name="COCO_train2014_000000000000.t7")


def test_request_timeout_and_wedged_health(served):
    """A hung device dispatch (the tunnel's documented no-raise hang mode)
    must bound request waits and flip /healthz to 'wedged' instead of
    wedging every request thread behind a green healthcheck."""
    import time

    from rau_vqa_tpu.serve import RAUService
    from tests import test_serve as _self

    fix, ck = _self.served.fix, _self.served.ck
    svc = RAUService(ck, os.path.join(fix, "vqa_prepro"),
                     [os.path.join(fix, "feat")], request_timeout_s=0.3)
    assert svc.health() == {"status": "ok"}
    real_predict = svc.predict

    def hung_predict(*a, **k):
        time.sleep(1.2)        # longer than the timeout, then recover
        return real_predict(*a, **k)

    svc.predict = hung_predict
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="timed out"):
        svc.answer("w01 w02", feat_name="COCO_train2014_000000000000.t7")
    assert time.monotonic() - t0 < 1.0       # bounded, not the full hang
    # while the dispatch is still stuck, health reports wedged
    for _ in range(50):
        h = svc.health()
        if h["status"] == "wedged":
            break
        time.sleep(0.02)
    assert h["status"] == "wedged" and h["dispatch_stuck_s"] >= 0.3
    # let the hung dispatch drain (it also pays the first jit compile)
    for _ in range(600):
        if svc.health() == {"status": "ok"}:
            break
        time.sleep(0.2)
    assert svc.health() == {"status": "ok"}
    # the service recovers: the same request now completes normally
    svc.predict = real_predict
    out = svc.answer("w01 w02",
                     feat_name="COCO_train2014_000000000000.t7")
    assert out["answers"]
    # stats counters are lifetime monotonic ints
    st = svc.stats()
    assert st["requests_served"] >= 2 and st["dispatches"] >= 2
