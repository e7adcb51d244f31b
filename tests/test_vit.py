"""ViT stretch backbone: shapes, timm-state conversion, one-block torch
equivalence, RAU integration over patch tokens."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from rau_vqa_tpu.models.backbones.vit import (
    ViTConfig,
    vit_apply,
    vit_from_timm_state,
    vit_init,
)

TINY_VIT = ViTConfig(image_size=16, patch=4, dim=32, depth=2, heads=4,
                     mlp_ratio=2.0)


@pytest.mark.slow
def test_vit_shapes():
    params = vit_init(jax.random.PRNGKey(0), TINY_VIT)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 16, 16, 3).astype(np.float32))
    out = vit_apply(params, TINY_VIT, x)
    assert out.shape == (2, TINY_VIT.seq, TINY_VIT.dim)
    assert np.all(np.isfinite(np.asarray(out)))


class TorchBlock(nn.Module):
    """Standard timm-style pre-LN ViT block."""

    def __init__(self, dim, heads, mlp_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, mlp_dim)
        self.fc2 = nn.Linear(mlp_dim, dim)
        self.heads = heads

    def forward(self, x):
        B, S, D = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(B, S, 3, self.heads, D // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = torch.softmax(q @ k.transpose(-2, -1)
                            / (D // self.heads) ** 0.5, dim=-1)
        h = (att @ v).transpose(1, 2).reshape(B, S, D)
        x = x + self.proj(h)
        h = self.norm2(x)
        h = self.fc2(torch.nn.functional.gelu(self.fc1(h)))
        return x + h


def test_vit_block_matches_torch():
    cfg = ViTConfig(image_size=16, patch=4, dim=32, depth=1, heads=4,
                    mlp_ratio=2.0)
    torch.manual_seed(0)
    blk = TorchBlock(32, 4, 64).eval().double()
    state = {
        "pos_embed": np.zeros((1, cfg.seq + 1, 32), np.float32),
        "patch_embed.proj.weight": np.zeros((32, 3, 4, 4), np.float32),
        "patch_embed.proj.bias": np.zeros((32,), np.float32),
        "norm.weight": np.ones((32,), np.float32),
        "norm.bias": np.zeros((32,), np.float32),
    }
    for ours, theirs in [("norm1", "norm1"), ("norm2", "norm2")]:
        state[f"blocks.0.{ours}.weight"] = getattr(blk, theirs).weight.detach().numpy()
        state[f"blocks.0.{ours}.bias"] = getattr(blk, theirs).bias.detach().numpy()
    for name in ("qkv", "proj", "fc1", "fc2"):
        mod = getattr(blk, name)
        pre = "attn." if name in ("qkv", "proj") else "mlp."
        state[f"blocks.0.{pre}{name}.weight"] = mod.weight.detach().numpy()
        state[f"blocks.0.{pre}{name}.bias"] = mod.bias.detach().numpy()

    params = vit_from_timm_state(state, cfg)
    rs = np.random.RandomState(1)
    x = rs.randn(2, cfg.seq, 32).astype(np.float32)

    # run just the block part of vit_apply by zeroing patch/pos and feeding
    # tokens directly through the internal helpers
    from rau_vqa_tpu.models.backbones.vit import _ln, _mhsa
    xt = jnp.asarray(x)
    blk_p = params["blocks"][0]
    y = xt + _mhsa(_ln(xt, blk_p["ln1"], cfg.ln_eps), blk_p, cfg.heads)
    h = _ln(y, blk_p["ln2"], cfg.ln_eps)
    h = jax.nn.gelu(h @ blk_p["fc1"]["w"] + blk_p["fc1"]["b"],
                    approximate=False)
    got = np.asarray(y + (h @ blk_p["fc2"]["w"] + blk_p["fc2"]["b"]))

    with torch.no_grad():
        want = blk(torch.as_tensor(x, dtype=torch.float64)).numpy()
    # tight: torch nn.functional.gelu is erf-exact, and so is ours — the
    # earlier 2e-3 rtol was hiding a tanh-approximation delta
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_vit_feeds_rau():
    """ViT patch tokens as the RAU feature map (the stretch config)."""
    from rau_vqa_tpu.config import ModelConfig
    from rau_vqa_tpu.models.pipeline import answer_pixels
    from rau_vqa_tpu.models.rau import init_params

    cfg = ModelConfig(
        vocab_size=30, answer_size=7, seq_len=6, embed_dim=8, rnn_size=16,
        rnn_layers=2, cnn_dim=TINY_VIT.dim, cnn_w=TINY_VIT.grid,
        cnn_h=TINY_VIT.grid, multfeat_dim=16, attfeat_dim=8,
        att_rnn_size=16, n_hops=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    bb = vit_init(jax.random.PRNGKey(1), TINY_VIT)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.randint(0, 255, (2, 16, 16, 3), np.uint8))
    tokens = jnp.asarray(rs.randint(1, 30, (2, 6)), jnp.int32)
    lengths = jnp.asarray([2, 6], jnp.int32)
    # answer_pixels routes "vit" via extract_features with the tiny config
    from rau_vqa_tpu.models.pipeline import pixels_forward
    import functools
    from rau_vqa_tpu.models import rau
    from rau_vqa_tpu.models.pipeline import extract_features
    feats = extract_features("vit", bb, images, vit_cfg=TINY_VIT)
    assert feats.shape == (2, TINY_VIT.seq, TINY_VIT.dim)
    out = rau.rau_forward(params, cfg, tokens, lengths, feats)
    assert out.scores.shape == (2, 2, 7)
    assert np.all(np.isfinite(np.asarray(out.scores)))


def test_vit_preset():
    from rau_vqa_tpu.config import get_preset

    exp = get_preset("ours_vit")
    assert exp.model.cnn_dim == 1024
    assert exp.model.cnn_spat == 256
