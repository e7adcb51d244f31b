"""End-to-end serving benchmark: VQA questions/sec/chip.

Measures the flagship Ours_MS model (8 recurrent answering units over
14x14x512 VGG-pool5-448 features): jitted forward producing all nHop+2
prediction sets + OE argmax, pipelined dispatch over distinct device-resident
batches (the steady state of a double-buffered input pipeline), with every
answer tensor read back to the host at the end so all work is forced.

Host->device feature streaming is excluded deliberately: this environment
reaches the chip through a network tunnel (~15 MB/s under load, ~30 ms RTT)
which would measure the tunnel, not the chip — a real v5e host moves a
200 MB batch over PCIe in ~10 ms, far faster than the model consumes it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver north star of 5,000 questions/sec/chip on TPU v5e
(BASELINE.json; the Torch reference publishes no throughput — SURVEY.md §6).
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


NORTH_STAR_QPS = 5000.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.eval.predict import predict, predict_fused
    from rau_vqa_tpu.models.rau import init_params

    on_tpu = jax.devices()[0].platform not in ("cpu",)

    # bf16 MXU passes for serving; parity mode is exercised by the test suite
    cfg = dataclasses.replace(get_preset("ours_ms").model,
                              matmul_precision="default",
                              compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)

    B = 512
    n_batches = 2      # distinct device-resident input batches, cycled
    n_iters = 16
    rs = np.random.RandomState(0)

    log(f"bench: staging {n_batches} batches of {B} on device")
    batches = []
    for i in range(n_batches):
        batches.append((
            jnp.asarray(rs.randint(1, cfg.vocab_size,
                                   (B, cfg.seq_len)).astype(np.int32)),
            jnp.asarray(rs.randint(1, cfg.seq_len + 1, B).astype(np.int32)),
            jnp.asarray(rs.randn(B, cfg.cnn_spat,
                                 cfg.cnn_dim).astype(np.float32)),
        ))
    jax.block_until_ready(batches)

    fwd = predict_fused if on_tpu else predict  # fused Pallas hop loop on TPU

    @jax.jit
    def serve(params, tokens, lengths, feats, salt):
        # salt makes every dispatch unique work (defeats any result caching
        # between identical calls in the remote-execution path)
        tokens = jnp.where(tokens > 0, (tokens + salt) % cfg.vocab_size, 0)
        tab_pred, _ = fwd(params, cfg, tokens, lengths, feats)
        return jnp.argmax(tab_pred, axis=-1)  # [H+2, B] answer ids

    log("bench: compiling")
    t0 = time.perf_counter()
    np.asarray(serve(params, *batches[0], jnp.int32(0)))
    log(f"bench: compile+first {time.perf_counter() - t0:.1f}s")

    # warmup
    for k in range(2):
        np.asarray(serve(params, *batches[k % n_batches], jnp.int32(k + 1)))

    log(f"bench: timing {n_iters} iterations")
    t0 = time.perf_counter()
    outs = []
    for k in range(n_iters):
        outs.append(serve(params, *batches[k % n_batches],
                          jnp.int32(100 + k)))
    results = [np.asarray(o) for o in outs]   # force ALL answers to host
    dt = time.perf_counter() - t0

    assert all(r.shape == (cfg.n_hops + 2, B) for r in results)
    qps = n_iters * B / dt
    log(f"bench: {dt / n_iters * 1e3:.1f} ms/batch")
    print(json.dumps({
        "metric": "vqa_questions_per_sec_per_chip",
        "value": round(qps, 1),
        "unit": "questions/sec",
        "vs_baseline": round(qps / NORTH_STAR_QPS, 3),
    }))


if __name__ == "__main__":
    main()
