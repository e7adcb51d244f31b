"""The tunnel-proof serving measurement programs, shared by the live
benches and their AOT artifacts.

On this rig a per-dispatch timing loop measures the ~30 ms network-tunnel
RTT, not the device; identical dispatches can additionally be served from
a cache (CLAUDE.md "MEASURING on this rig").  Both benches therefore time
ONE jitted program that chains K full serving steps with a data dependence
between rounds (each round's tokens derive from the previous round's
answers, so nothing can be elided) — bench.py for the questions path,
bench_pixels.py for images+questions.

This module is the single definition of those chained programs so that

  * the live benches jit them directly, and
  * ``eval/export.py`` serializes the SAME trace to a StableHLO artifact
    (kinds ``serve_chain`` / ``pixels_chain``), letting a measurement
    window skip Python tracing entirely and — combined with the
    persistent compilation cache — skip the 3-460 s remote-compile
    lottery on every run after the first.

Parameters ride as call OPERANDS, not baked constants: weights as HLO
constants were measured to re-upload ~100 MB through the ~15 MB/s tunnel
per compile (BASELINE.md, round-3 jit-args refactor), and operand weights
keep the artifact files tiny.
"""

from __future__ import annotations

from typing import Callable, Optional


def make_serve_chain(cfg, K: int, n_acc: int = 8) -> Callable:
    """bench.py's program: K chained question-path serving steps.

    Returns ``fn(params, tokens[B,T] i32, lengths[B] i32, feats[B,S,D]
    f32, salt0 i32) -> (salt, acc[H+2, min(n_acc, B)] i32)``.  n_acc is
    clamped to the batch at trace time (the RAU_BENCH_B CPU-smoke knob
    can shrink B below 8; an unclamped ans[:, :8] slice then
    shape-mismatches the fori_loop carry).
    """
    import jax
    import jax.numpy as jnp

    from rau_vqa_tpu.eval.predict import predict

    def serve_chain(params, tokens, lengths, feats, salt0):
        na = min(n_acc, tokens.shape[0])

        def body(k, carry):
            salt, acc = carry
            toks = jnp.where(tokens > 0, (tokens + salt) % cfg.vocab_size, 0)
            tab_pred, _ = predict(params, cfg, toks, lengths, feats)
            ans = jnp.argmax(tab_pred, axis=-1)        # [H+2, B]
            # data dependence: next round's tokens derive from this answer
            salt = salt + 1 + ans[0, 0].astype(jnp.int32) % 3
            return salt, acc + ans[:, :na].astype(jnp.int32)
        zero = jnp.zeros((cfg.n_hops + 2, na), jnp.int32)
        # jnp.int32(salt0): a plain-int salt0 traces as a weak-typed carry
        # whose body output is strong int32 — fori_loop rejects the
        # mismatch (pixels_chain below has the same guard)
        return jax.lax.fori_loop(0, K, body, (jnp.int32(salt0), zero))

    return serve_chain


def make_pixels_chain(cfg, backbone: str, K: int, qpi: int, n_acc: int,
                      feat_dtype=None,
                      apply_override: Optional[Callable] = None,
                      vit_cfg=None, fused_stages=(),
                      fused_block_b: int = 0,
                      feat_norm: bool = False) -> Callable:
    """bench_pixels.py's program: K chained images+questions->answers steps.

    Returns ``fn(bb, params, images[B,s,s,3] u8, tokens[B*qpi,T] i32,
    lengths[B*qpi] i32, salt0 i32) -> (salt, acc[H+2, n_acc] i32)``.

    ``apply_override`` (the int8 backbone path) substitutes for
    ``extract_features``; backbone variants like BN folding and s2d are
    encoded in the TREE STRUCTURE of ``bb`` (models/backbones/resnet.py),
    so the same program serves them.
    """
    import jax
    import jax.numpy as jnp

    from rau_vqa_tpu.eval.predict import predict
    from rau_vqa_tpu.models.pipeline import extract_features

    feat_dt = feat_dtype if feat_dtype is not None else (
        jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32)

    def one_step(bb, params, images_u8, toks, lengths):
        if apply_override is not None:
            from rau_vqa_tpu.ops import transforms as T
            x = images_u8.astype(jnp.float32) / 255.0
            feats = apply_override(bb, T.color_normalize(x))
        else:
            feats = extract_features(backbone, bb, images_u8,
                                     vit_cfg=vit_cfg,
                                     fused_stages=tuple(fused_stages),
                                     fused_block_b=fused_block_b,
                                     feat_norm=feat_norm)
        featsq = jnp.repeat(feats, qpi, axis=0)     # qpi questions/image
        # hand the head its compute dtype directly — an f32 detour would
        # double the HBM traffic of the biggest activation
        tab_pred, _ = predict(params, cfg, toks, lengths,
                              featsq.astype(feat_dt))
        return jnp.argmax(tab_pred, axis=-1)        # [H+2, B*qpi]

    def pixels_chain(bb, params, images, tokens, lengths, salt0):
        na = min(n_acc, tokens.shape[0])   # clamp like make_serve_chain

        def body(k, carry):
            salt, acc = carry
            imgs = images + salt.astype(jnp.uint8)  # wraps mod 256
            toks = jnp.where(tokens > 0,
                             (tokens + salt) % cfg.vocab_size, 0)
            ans = one_step(bb, params, imgs, toks, lengths)
            salt = salt + 1 + ans[0, 0].astype(jnp.int32) % 3
            return salt, acc + ans[:, :na].astype(jnp.int32)
        zero = jnp.zeros((cfg.n_hops + 2, na), jnp.int32)
        return jax.lax.fori_loop(0, K, body, (jnp.int32(salt0), zero))

    return pixels_chain
