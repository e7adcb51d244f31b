"""Block-size sweep for the fused hop kernels vs the XLA hop loop, on the
real chip (VERDICT r1 #2/#9 evidence; BACKLOG #4).

Round-1 context: at block_b 16/32 the Pallas eval kernel lost to XLA (6.1-6.5
vs 3.8 ms/batch-512) and block_b=64 was recorded as "exceeds VMEM".  A VMEM
probe (round 2) shows ~96-128 MB usable on this v5e, so large batch tiles
(64/128/256) that feed the MXU full 128-row blocks are reachable after all —
this sweep settles whether they flip the verdict.

Protocol per CLAUDE.md: K iterations chained in one dispatch with a data
dependence (rotating salt on q), outputs forced to host.

Usage: python scripts/sweep_hop_kernel.py [--batch 512] [--blocks 32,64,128]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[512])
    ap.add_argument("--blocks", type=str, default="xla,32,64,128")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--resnet", action="store_true",
                    help="use ours_resnet shapes (cnn_dim 2048)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.models.rau import embed_image, init_params
    from rau_vqa_tpu.ops.rau_hops import rau_hops_pallas, rau_hops_reference

    preset = get_preset("ours_resnet" if args.resnet else "ours_ms")
    cfg = dataclasses.replace(preset.model, matmul_precision="default",
                              compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    mp = params["mult"]

    results = {}
    for B in args.batch:
        rs = np.random.RandomState(0)
        q0 = jnp.asarray(rs.randn(B, cfg.rnnout_dim).astype(np.float32))
        feats = jnp.asarray(rs.randn(B, cfg.cnn_spat,
                                     cfg.cnn_dim).astype(np.float32))
        ifeat, iatt = jax.jit(lambda m, f: embed_image(m, cfg, f))(mp, feats)
        ifeat = jax.block_until_ready(ifeat)

        for variant in args.blocks.split(","):
            if variant == "xla":
                def hop_fn(m, q, a, b):
                    return rau_hops_reference(m, cfg, q, a, b,
                                              dot_dtype=jnp.bfloat16)
            else:
                bb = int(variant)
                if B % bb:
                    log(f"[skip] B={B} not divisible by block {bb}")
                    continue

                def hop_fn(m, q, a, b, _bb=bb):
                    return rau_hops_pallas(m, cfg, q, a, b, block_b=_bb)

            K = args.steps

            @jax.jit
            def chain(mp_, q_, ifeat_, iatt_, salt0):
                def body(k, carry):
                    salt, acc = carry
                    q_k = q_ * (1.0 + 0.001 * salt.astype(jnp.float32))
                    s, d, a = hop_fn(mp_, q_k, ifeat_, iatt_)
                    ans = jnp.argmax(s, axis=-1)
                    salt = salt + 1 + ans[0, 0].astype(jnp.int32) % 3
                    return salt, acc + ans[:, :8].astype(jnp.int32)
                zero = jnp.zeros((cfg.n_hops, 8), jnp.int32)
                return jax.lax.fori_loop(0, K, body, (jnp.int32(salt0), zero))

            try:
                t0 = time.perf_counter()
                np.asarray(chain(mp, q0, ifeat, iatt, 0)[1])
                log(f"[{variant} B={B}] compile+first "
                    f"{time.perf_counter()-t0:.1f}s")
                np.asarray(chain(mp, q0, ifeat, iatt, 7)[1])
                t0 = time.perf_counter()
                for r in range(args.rounds):
                    np.asarray(chain(mp, q0, ifeat, iatt, 100 + r)[1])
                dt = time.perf_counter() - t0
                ms = dt / (args.rounds * K) * 1e3
                log(f"[{variant} B={B}] {ms:.3f} ms/hop-loop")
                results[f"{variant}_b{B}"] = round(ms, 3)
            except Exception as e:
                log(f"[{variant} B={B}] FAILED: {str(e)[:300]}")
                results[f"{variant}_b{B}"] = None

    print(json.dumps(results))


if __name__ == "__main__":
    main()
