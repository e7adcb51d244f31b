"""Minimal HTTP inference service.

POST /answer with JSON {"question": str, "feat_name": str} (precomputed
features) or {"question": str, "image_b64": str} (raw image through the
on-TPU backbone when one is configured); returns the top-k answers of the
"select" aggregate plus per-hop answers.  POST /answer_many with
{"questions": [str, ...], "feat_name"|"image_b64"} answers several
questions about ONE image — features are fetched once and the questions
share a micro-batch dispatch (the VQA ~3-questions-per-image pattern).
Either POST accepts {"attention": true} to include the per-hop spatial
attention rows (the maps the reference dumps as PNGs,
Ours_SS/...lua:926-932).  GET /healthz for liveness; GET /stats for
operator metrics (dispatch count, mean micro-batch, cache size).

One process, one chip.  Concurrent requests are DYNAMICALLY MICRO-BATCHED:
a collector thread drains the request queue, pads the group to a fixed
batch-size bucket (1/4/8/16 — bounded compile count), and runs ONE device
dispatch for the whole group.  Combined with length-bucketed encoding this
keeps tail latency near the single-request floor while throughput scales
with concurrency; ``max_wait_ms`` bounds the artificial queueing delay.
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np


class RAUService:
    """Wraps a checkpointed model for single-question serving."""

    def __init__(self, checkpoint: Optional[str], vqa_dir: str, feat_dirs,
                 *, preset: str = "ours_ms", artifact: Optional[str] = None,
                 backbone: Optional[str] = None, bb_params=None,
                 fused: bool = False, buckets=None,
                 max_batch: int = 16, max_wait_ms: float = 5.0,
                 feat_cache_size: int = 256,
                 request_timeout_s: float = 2600.0):
        import dataclasses
        import jax

        from rau_vqa_tpu.config import ModelConfig, get_preset
        from rau_vqa_tpu.data.loader import load_vqa_data
        from rau_vqa_tpu.eval.predict import make_predict_step
        from rau_vqa_tpu.train.trainer import init_train_state
        from rau_vqa_tpu.utils.checkpoint import load_checkpoint
        import os

        if (checkpoint is None) == (artifact is None):
            raise ValueError("pass exactly one of checkpoint / artifact")
        buckets_explicit = buckets is not None
        if buckets is None:
            # default ladder for live serving; an artifact bakes its own,
            # so only an EXPLICIT value trips the flags-ignored warning
            # (including an explicit () = 'disable buckets')
            buckets = () if artifact is not None else (8, 16)
        exp = get_preset(preset)
        if artifact is not None:
            # AOT StableHLO artifact (rau-vqa export): the model config and
            # params are baked into the programs; only tokenization/answer
            # vocab comes from vqa_dir — and must match the baked dims
            from rau_vqa_tpu.eval.export import load_exported
            runner = load_exported(artifact)
            exp = exp.replace(
                model=ModelConfig(**runner.meta["model_config"]))
            # the artifact bakes its own ladder and (non-fused) program;
            # live-eval knobs cannot take effect — say so instead of
            # silently ignoring the operator's flags
            import warnings
            if fused:
                warnings.warn("serving from an artifact: --fused-eval is "
                              "ignored (the exported program is baked)")
            from rau_vqa_tpu.eval.predict import bucket_ladder
            want = bucket_ladder(exp.model.seq_len, buckets)[:-1]
            # chain artifacts have no ladder at all — they are rejected
            # below with the real error; a '[] ladder' warning first
            # would misdirect the operator toward re-exporting buckets
            if buckets_explicit and not getattr(runner, "_chain", False) \
                    and want != runner.ladder[:-1]:
                # covers explicit () / 'none' too: asking to DISABLE
                # buckets cannot take effect against a baked ladder
                warnings.warn(
                    f"serving from an artifact: requested buckets "
                    f"{want or '(disabled)'} ignored — the artifact "
                    f"ladder is {runner.ladder} (re-export with "
                    f"--eval-buckets to change it)")
        else:
            from rau_vqa_tpu.utils.checkpoint import checkpoint_meta
            meta = checkpoint_meta(checkpoint)
            if "model_config" in meta:
                exp = exp.replace(
                    model=ModelConfig(**meta["model_config"]))
        self.data = load_vqa_data(vqa_dir, 1, split=exp.data.split,
                                  test_batch_size=1)
        self.mcfg = dataclasses.replace(
            exp.model, vocab_size=self.data.vocab_size,
            answer_size=self.data.answer_size, seq_len=self.data.seq_len)
        if artifact is not None:
            if self.mcfg != exp.model:
                raise ValueError(
                    f"artifact was exported for vocab/answer/seq_len "
                    f"{(exp.model.vocab_size, exp.model.answer_size, exp.model.seq_len)} "
                    f"but {vqa_dir!r} provides "
                    f"{(self.data.vocab_size, self.data.answer_size, self.data.seq_len)}")
            self.params = None
            if runner.kind in ("serve_chain", "pixels_chain"):
                # the K-chained MEASUREMENT programs (bench.py --artifact)
                # take (params..., salt) operands and loop internally —
                # wiring one as a predict fn would start the server fine
                # and then fail every request with a StableHLO
                # operand-arity error
                raise ValueError(
                    f"artifact kind {runner.kind!r} is a benchmark chain "
                    f"program, not a serving program — export one with "
                    f"`rau-vqa export` (kind 'predict'/'pixels_predict')")
            if runner.kind == "pixels_predict":
                # from-pixels artifact: backbone is BAKED INTO the program
                # (rau-vqa export --backbone); requests must carry images,
                # and the micro-batch operand is uint8 pixels, not feats
                self.pixels_artifact = True
                if backbone is not None:
                    import warnings
                    warnings.warn(
                        "serving from a pixels artifact: --backbone/"
                        "--backbone-state are ignored (the exported "
                        "program bakes its own backbone)")
                self.predict = lambda p, t, l, imgs: runner(imgs, t, l)
            else:
                # features-only artifact: when image requests featurize
                # through a separately-loaded backbone (--backbone), the
                # artifact's meta says which interface the head was
                # trained on (pixels artifacts bake the RMS op instead)
                self.feat_norm = bool(
                    runner.meta.get("backbone_feat_norm", False))
                self.predict = lambda p, t, l, f: runner(t, l, f)
        else:
            state = init_train_state(jax.random.PRNGKey(0), self.mcfg)
            tree, _ = load_checkpoint(checkpoint, state._asdict())
            # device_put ONCE: flax from_bytes hands back NUMPY leaves,
            # and numpy jit args are re-staged on EVERY dispatch — the
            # whole model re-uploaded per request measured as ~780 ms of
            # the ~850 ms unloaded p50 on the rig tunnel (bench_serve
            # decompose; same class as the bench_pixels weight fix)
            # fine-tuned (4-group) snapshots: a 3-group template drops
            # the extra group, so the head restores cleanly either way —
            # but image requests should use the TRAINED backbone, not the
            # original torchvision weights.  Adopt it from the snapshot
            # unless the operator passed one explicitly.
            self.params = jax.device_put(
                {g: tree["params"][g] for g in ("embed", "rnn", "mult")})
            if (bb_params is None and meta.get("train_backbone")
                    and meta.get("backbone")):
                from rau_vqa_tpu.utils.checkpoint import load_backbone_group
                backbone = meta["backbone"]
                bb_params = jax.device_put(
                    load_backbone_group(checkpoint, backbone))
            # fine-tuned with the RMS-normalized feature interface: serve
            # must featurize the same way or features are off-distribution
            self.feat_norm = bool(meta.get("backbone_feat_norm", False))
            # length buckets cut single-question latency: a short question
            # encodes in 8 scan steps instead of seq_len (exact —
            # predict.py)
            self.predict = make_predict_step(self.mcfg, fused=fused,
                                             buckets=tuple(buckets))
        self.backbone = backbone
        self.bb_params = bb_params
        self.pixels_artifact = getattr(self, "pixels_artifact", False)
        if self.pixels_artifact:
            # the artifact's input shape is authoritative
            self.image_size = int(runner.meta["image_size"])
        else:
            # decode size follows the checkpoint's feature grid: stride-32
            # conv backbones give cnn_w = size/32; ViT-L/14 gives size/14
            patch = 14 if backbone == "vit" else 32
            self.image_size = self.mcfg.cnn_w * patch

        # feat_dirs may be empty: a pixels-artifact or image-only service
        # answers image_b64 requests and never resolves feat_name
        from rau_vqa_tpu.cli import _make_feature_source
        self.source = (_make_feature_source(list(feat_dirs), self.mcfg)
                       if feat_dirs else None)
        if self.source is not None \
                and not getattr(self, "pixels_artifact", False):
            # a packed shard records its feature interface: refuse to
            # serve RMS rows to a raw-trained head (or vice versa)
            from rau_vqa_tpu.data.features import check_feat_interface
            check_feat_interface(self.source,
                                 bool(getattr(self, "feat_norm", False)),
                                 "serve")
        self.lock = threading.Lock()
        # dynamic micro-batcher state (started lazily by answer())
        self._queue: "list" = []
        self._qcond = threading.Condition()
        self._batcher: Optional[threading.Thread] = None
        self.max_batch = int(max_batch)
        # 0 disables lingering: a group dispatches as soon as it is drained
        self.max_wait_ms = float(max_wait_ms)
        # the rig tunnel can HANG outright (device call never returns,
        # never raises — CLAUDE.md, observed 2026-08-17): without a wait
        # bound every request thread wedges forever while /healthz stays
        # green.  Sized to the remote-compile lottery ceiling (731 s
        # observed; benches budget 2400-2600 s).  0 disables.
        self.request_timeout_s = float(request_timeout_s)
        self._dispatch_started: Optional[float] = None
        self._total_requests = 0       # lifetime (stats deque is windowed)
        self._total_dispatches = 0
        from collections import OrderedDict, deque
        self._batch_sizes_served = deque(maxlen=1000)  # for tests/metrics
        self._stats_lock = threading.Lock()   # appender vs GET /stats
        # LRU image-feature cache (see _featurize_image); size it to RAM —
        # a ResNet entry is [1, 196, 2048] f32 ≈ 1.6 MB
        self.feat_cache_size = int(feat_cache_size)
        self._feat_cache: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._feat_inflight: Dict[str, threading.Event] = {}
        self._feat_cache_lock = threading.Lock()
        # DEVICE-resident per-image feature LRU (live-params path): repeat
        # requests about a known image upload ZERO feature bytes (~0.4 MB
        # = ~27 ms of tunnel time per bucket-1 dispatch; the 784 ms the
        # decompose phase measured was the numpy PARAMS re-staging, fixed
        # at load with device_put); production serving keeps hot features
        # in HBM either way
        self._dev_feat_cache: "OrderedDict[tuple, object]" = OrderedDict()
        self._zero_feat = None     # device zeros for bucket padding

    def _featurize_image(self, image_bytes: bytes,
                         key: Optional[str] = None) -> np.ndarray:
        import hashlib

        from PIL import Image

        from rau_vqa_tpu.data.images import decode_scale_center_crop
        from rau_vqa_tpu.models.pipeline import extract_features

        if not self.pixels_artifact and (self.backbone is None
                                         or self.bb_params is None):
            raise ValueError("no visual backbone configured; send feat_name")
        # VQA asks ~3 questions per image: cache features by content hash
        # so repeat questions about one image pay the backbone once
        # (callers that already hashed the bytes pass the digest through)
        key = key or hashlib.sha256(image_bytes).hexdigest()
        while True:
            with self._feat_cache_lock:
                if key in self._feat_cache:
                    self._feat_cache.move_to_end(key)
                    return self._feat_cache[key]
                inflight = self._feat_inflight.get(key)
                if inflight is None:
                    # this thread computes; concurrent same-image requests
                    # (the ~3-questions pattern) wait instead of each
                    # running the backbone
                    self._feat_inflight[key] = threading.Event()
                    break
            inflight.wait()
        # EVERYTHING from here runs under the in-flight guard: a decode
        # failure must release the waiters too, or a retried corrupt image
        # would deadlock every later request with the same bytes
        try:
            # decode through the SAME native path as the train/eval loader
            # (point-sampled Catmull-Rom) so serve-time features match
            # eval-sweep features bit-for-bit; PIL only as last resort
            size = self.image_size
            try:
                import tempfile

                from rau_vqa_tpu.data.native import decode_image_batch
                with tempfile.NamedTemporaryFile(suffix=".img") as f:
                    f.write(image_bytes)
                    f.flush()
                    arr = decode_image_batch([f.name], size, n_threads=1)
            except Exception:  # noqa: BLE001 — non-JPEG or no toolchain
                with Image.open(io.BytesIO(image_bytes)) as img:
                    arr = decode_scale_center_crop(img, size)[None]
            if self.pixels_artifact:
                # the artifact runs the backbone itself: the cached value
                # is the decoded uint8 image (448^2*3 ~ 0.6 MB/entry,
                # same order as a feature entry)
                feats = np.asarray(arr, np.uint8)
            else:
                feats = np.asarray(
                    extract_features(self.backbone, self.bb_params, arr,
                                     feat_norm=getattr(self, "feat_norm",
                                                       False)))
            with self._feat_cache_lock:
                self._feat_cache[key] = feats
                while len(self._feat_cache) > self.feat_cache_size:
                    self._feat_cache.popitem(last=False)
        finally:
            with self._feat_cache_lock:
                ev = self._feat_inflight.pop(key, None)
            if ev is not None:
                ev.set()
        return feats

    # -- dynamic micro-batching ----------------------------------------

    def _ensure_batcher(self):
        with self._qcond:   # check-then-act must be atomic: ONE collector
            if self._batcher is None or not self._batcher.is_alive():
                self._batcher = threading.Thread(target=self._batch_loop,
                                                 daemon=True)
                self._batcher.start()

    def _batch_loop(self):
        while True:
            with self._qcond:
                while not self._queue:
                    self._qcond.wait()
                # linger briefly so concurrent arrivals share the dispatch
                deadline = self.max_wait_ms / 1e3
                while len(self._queue) < self.max_batch and deadline > 0:
                    import time
                    t0 = time.monotonic()
                    self._qcond.wait(timeout=deadline)
                    deadline -= time.monotonic() - t0
                group = self._queue[:self.max_batch]
                del self._queue[:len(group)]
            try:
                self._run_group(group)
            except BaseException as e:  # noqa: BLE001 — fail the whole group
                # BaseException too (KeyboardInterrupt/SystemExit): the
                # waiters must be released either way, or every in-flight
                # answer() blocks forever on a dead batcher thread
                for item in group:
                    item["error"] = e
                    item["done"].set()
                if not isinstance(e, Exception):
                    raise

    def _run_group(self, group):
        import time

        import jax.numpy as jnp

        # wedge detection: health() compares this mark against
        # request_timeout_s (a hung tunnel blocks inside the device call
        # below without raising; only the single batcher thread writes it)
        self._dispatch_started = time.monotonic()
        try:
            self._run_group_inner(group)
        finally:
            self._dispatch_started = None

    def _run_group_inner(self, group):
        import jax.numpy as jnp

        n = len(group)
        # pad to a fixed bucket: bounded compile count, shared programs
        bucket = next(b for b in (1, 4, 8, self.max_batch) if b >= n)
        tokens = np.zeros((bucket, self.mcfg.seq_len), np.int32)
        lengths = np.ones((bucket,), np.int32)
        for i, item in enumerate(group):
            tokens[i] = item["tokens"]
            lengths[i] = item["length"]
        with self.lock:
            if self.params is None:
                # AOT artifact: ExportedPredict consumes NUMPY operands
                # (its program does the single device_put itself) — a
                # jnp.asarray here would round-trip the whole batch
                # host->device->host first, tripling tunnel traffic on
                # the request hot path (worst for uint8 pixel batches)
                if self.pixels_artifact:
                    # the micro-batch visual operand is raw pixels; the
                    # artifact runs preprocess + backbone + RAU in one call
                    feats = np.zeros(
                        (bucket, self.image_size, self.image_size, 3),
                        np.uint8)
                else:
                    feats = np.zeros(
                        (bucket, self.mcfg.cnn_spat, self.mcfg.cnn_dim),
                        np.float32)
                for i, item in enumerate(group):
                    feats[i] = item["feats"]
                tab_pred, tab_att = self.predict(self.params, tokens,
                                                 lengths, feats)
            else:
                # live path: per-image feats are DEVICE-resident (LRU in
                # _feats_for) — the batch is stacked on device, so the
                # dispatch uploads only the [bucket, seq] token block
                # (saves the ~0.4 MB/question feature upload; the big
                # 784-of-851-ms win was the params device_put at load).
                if self._zero_feat is None:
                    import jax
                    self._zero_feat = jax.device_put(np.zeros(
                        (self.mcfg.cnn_spat, self.mcfg.cnn_dim),
                        np.float32))
                fs = [item["feats"] for item in group]
                fs += [self._zero_feat] * (bucket - n)
                # tokens stay NUMPY: with a live bucket ladder the step fn
                # slices tokens[:, :T] BEFORE the jit call — on a device
                # array that slice is its own eager dispatch (~30 ms RTT
                # + a first-time remote compile per (bucket, T) shape);
                # the host upload of [bucket, seq] int32 is negligible
                tab_pred, tab_att = self.predict(
                    self.params, tokens, lengths, jnp.stack(fs))
        tab = np.asarray(tab_pred)                 # [H+2, bucket, A]
        # fetch attention only if someone in the group asked (a second
        # host transfer of [H+2, bucket, S] otherwise wasted)
        att = (np.asarray(tab_att)
               if any(it.get("attention") for it in group) else None)
        with self._stats_lock:
            self._batch_sizes_served.append(n)
            self._total_requests += n
            self._total_dispatches += 1
        for i, item in enumerate(group):
            item["tab"] = tab[:, i]
            if att is not None and item.get("attention"):
                item["att"] = att[:, i]
            item["done"].set()

    def _device_feats(self, key: tuple, load) -> "object":
        """Device-resident feature LRU (live-params path only).  On a hit
        the request uploads no feature bytes at all; on a miss ``load()``
        produces the host array, staged once with device_put."""
        import jax

        with self._feat_cache_lock:
            hit = self._dev_feat_cache.get(key)
            if hit is not None:
                self._dev_feat_cache.move_to_end(key)
                return hit
        arr = jax.device_put(load())
        with self._feat_cache_lock:
            self._dev_feat_cache[key] = arr
            while len(self._dev_feat_cache) > self.feat_cache_size:
                self._dev_feat_cache.popitem(last=False)
        return arr

    def _feats_for(self, feat_name: Optional[str],
                   image_b64: Optional[str],
                   datatype: int = 1):
        if self.pixels_artifact and feat_name is not None:
            raise ValueError(
                "this service runs a from-pixels artifact (backbone baked "
                "into the program): send image_b64, not feat_name")
        live = self.params is not None   # artifacts consume NUMPY operands

        if feat_name is not None:
            if self.source is None:
                raise ValueError(
                    "no --feat-dir configured: this service cannot "
                    "resolve feat_name requests — send image_b64")

            def load():
                from rau_vqa_tpu.data.features import QuantFeats
                # datatype routes multi-dir feature sources (the test2015
                # mixed train2014+val2014 layout,
                # vqa_prepro_loader.lua:876); single-dir/packed ignore it
                feats = self.source.get_batch([feat_name], [int(datatype)])
                if isinstance(feats, QuantFeats):
                    # raw_int8 stores hand back values+scales; serving
                    # wants plain floats (single-question batches)
                    feats = feats.dequantize()
                return feats[0]
            if live:
                return self._device_feats(
                    ("f", feat_name, int(datatype)), load)
            return load()
        if image_b64 is not None:
            raw = base64.b64decode(image_b64)
            if live:
                import hashlib
                sha = hashlib.sha256(raw).hexdigest()
                # the host copy stays cached too: popping it after the
                # device_put races _featurize_image's in-flight dedupe (a
                # concurrent same-image miss would re-run the backbone)
                # and turns every device-LRU eviction into a full backbone
                # recompute — the ~1.6 MB/entry host RAM is the cheaper
                # side of that trade
                return self._device_feats(
                    ("i", sha),
                    lambda: self._featurize_image(raw, key=sha)[0])
            return self._featurize_image(raw)[0]
        raise ValueError("need feat_name or image_b64")

    def answer_many(self, questions, *, feat_name: Optional[str] = None,
                    image_b64: Optional[str] = None, topk: int = 5,
                    attention: bool = False, datatype: int = 1):
        """Several questions about ONE image — the VQA pattern (~3
        questions/image).  Features are fetched/computed once; the
        questions ride the micro-batcher as one arrival burst (typically
        one device dispatch)."""
        feats = self._feats_for(feat_name, image_b64, datatype)
        self._ensure_batcher()
        # tokenize BEFORE taking the batcher condition: the collector
        # lingers on the same lock, so tokenizing a large burst under it
        # would stall every concurrent request's dispatch
        items = []
        for q in questions:
            tokens, length = self.data.question_to_tokens(q, normalize=True)
            items.append({"tokens": tokens, "length": length, "feats": feats,
                          "done": threading.Event(), "question": q,
                          "attention": attention})
        with self._qcond:
            self._queue.extend(items)
            self._qcond.notify_all()
        out = []
        for item in items:
            self._wait_done(item)
            out.append(self._format_answer(item["question"], item["tab"],
                                           topk, att=item.get("att")))
        return out

    def _format_answer(self, question: str, tab: np.ndarray,
                       topk: int, att: Optional[np.ndarray] = None) -> Dict:
        final = tab[-1]                            # "select" aggregate
        order = np.argsort(final)[::-1][:topk]
        out = {
            "question": question,
            "answers": [{"answer": self.data.answers[int(i)],
                         "score": float(final[i])} for i in order],
            "per_hop": [self.data.answers[int(tab[h].argmax())]
                        for h in range(tab.shape[0] - 2)],
        }
        if att is not None:
            # the reference dumps these as per-hop heat maps
            # (Ours_SS/...lua:926-932 / visatt.py); rows are the nHop hop
            # attentions then the uniform and select aggregates, each a
            # w*h spatial softmax over the feature grid
            out["attention"] = {
                "grid": [int(self.mcfg.cnn_w), int(self.mcfg.cnn_h)],
                "rows": [[round(float(v), 6) for v in att[h]]
                         for h in range(att.shape[0])],
            }
        return out

    def answer(self, question: str, *, feat_name: Optional[str] = None,
               image_b64: Optional[str] = None, topk: int = 5,
               attention: bool = False, datatype: int = 1) -> Dict:
        tokens, length = self.data.question_to_tokens(question, normalize=True)
        feats = self._feats_for(feat_name, image_b64, datatype)
        self._ensure_batcher()
        item = {"tokens": tokens, "length": length, "feats": feats,
                "done": threading.Event(), "attention": attention}
        with self._qcond:
            self._queue.append(item)
            self._qcond.notify_all()
        self._wait_done(item)
        return self._format_answer(question, item["tab"], topk,
                                   att=item.get("att"))

    def _wait_done(self, item) -> None:
        """Bounded wait on a queued request (re-raising its error).  An
        unbounded wait would wedge every request thread forever on the
        tunnel's documented hang mode while /healthz stayed green."""
        t = self.request_timeout_s
        if not item["done"].wait(t if t > 0 else None):
            raise RuntimeError(
                f"serving dispatch timed out after {t:.0f}s — the "
                f"device/tunnel may be hung (run `rau-vqa doctor`); "
                f"GET /healthz now reports wedged")
        if "error" in item:
            raise item["error"]

    def health(self) -> Dict:
        """Liveness that actually covers the device path: 'wedged' once a
        dispatch has been stuck past request_timeout_s (the tunnel's
        hang mode blocks without raising, so only elapsed time sees it)."""
        started = self._dispatch_started
        if started is not None and self.request_timeout_s > 0:
            import time
            stuck = time.monotonic() - started
            if stuck > self.request_timeout_s:
                return {"status": "wedged",
                        "dispatch_stuck_s": round(stuck, 1)}
        return {"status": "ok"}

    def stats(self) -> Dict:
        """Operator metrics for GET /stats."""
        with self._stats_lock:
            # snapshot under the lock: the batcher thread's append (plus
            # maxlen eviction) mutates the deque mid-iteration otherwise
            sizes = list(self._batch_sizes_served)
            total_req = self._total_requests
            total_disp = self._total_dispatches
        with self._feat_cache_lock:
            cache_entries = len(self._feat_cache)
            dev_cache_entries = len(self._dev_feat_cache)
        return {
            # lifetime monotonic counters (the deque is a sliding
            # 1000-dispatch window — summing it would plateau under load)
            "requests_served": int(total_req),
            "dispatches": int(total_disp),
            "mean_batch": round(float(np.mean(sizes)), 3) if sizes else 0.0,
            "max_batch_seen": int(max(sizes)) if sizes else 0,
            "feat_cache_entries": cache_entries,
            "device_feat_cache_entries": dev_cache_entries,
            "pixels_artifact": bool(self.pixels_artifact),
            "image_size": int(self.image_size),
            "max_batch": self.max_batch,
            "max_wait_ms": self.max_wait_ms,
        }


def make_handler(service: RAUService):
    class Handler(BaseHTTPRequestHandler):
        # TCP_NODELAY: with Nagle on, a small JSON response can sit in
        # the kernel until the peer's delayed ACK (tens of ms on some
        # stacks) — never acceptable on a latency-measured service
        disable_nagle_algorithm = True

        def log_message(self, *args):
            pass

        def _send(self, code: int, payload: Dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                h = service.health()
                self._send(200 if h["status"] == "ok" else 503, h)
            elif self.path == "/stats":
                self._send(200, service.stats())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path not in ("/answer", "/answer_many"):
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                if self.path == "/answer_many":
                    # several questions about ONE image (~3/image in VQA):
                    # features once, one micro-batch dispatch
                    result = {"results": service.answer_many(
                        req["questions"],
                        feat_name=req.get("feat_name"),
                        image_b64=req.get("image_b64"),
                        topk=int(req.get("topk", 5)),
                        attention=bool(req.get("attention", False)),
                        datatype=int(req.get("datatype", 1)))}
                else:
                    result = service.answer(
                        req["question"],
                        feat_name=req.get("feat_name"),
                        image_b64=req.get("image_b64"),
                        topk=int(req.get("topk", 5)),
                        attention=bool(req.get("attention", False)),
                        datatype=int(req.get("datatype", 1)))
                self._send(200, result)
            except Exception as e:  # noqa: BLE001 — service boundary
                self._send(400, {"error": str(e)})

    return Handler


class _Server(ThreadingHTTPServer):
    # default listen backlog is 5: a 32-client burst overflows it and the
    # kernel RSTs the overflow (measured: 5x ConnectionResetError in the
    # round-4 rig bench).  The batcher absorbs bursts fine once accepted.
    request_queue_size = 128


def serve(service: RAUService, port: int = 8080) -> ThreadingHTTPServer:
    server = _Server(("0.0.0.0", port), make_handler(service))
    print(f"rau-vqa inference service on :{port}")
    return server
