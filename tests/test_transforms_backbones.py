"""On-device transforms and visual backbones: shape/semantics tests plus
cross-framework equivalence against hand-built PyTorch modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from rau_vqa_tpu.ops import transforms as T
from rau_vqa_tpu.models.backbones.vgg import (
    VGG16_CFG,
    vgg16_from_torch_state,
    vgg16_pool5_apply,
    vgg16_pool5_init,
)
from rau_vqa_tpu.models.backbones.resnet import (
    resnet101_apply,
    resnet101_init,
    resnet_from_torch_state,
)


def imgs(B=2, H=32, W=48, C=3, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(B, H, W, C)
                       .astype(np.float32))


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def test_color_normalize_and_vgg_preprocess():
    x = imgs()
    y = T.color_normalize(x)
    want = (np.asarray(x) - np.array(T.IMAGENET_MEAN)) / np.array(T.IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-6)
    z = np.asarray(T.vgg_preprocess(x))
    np.testing.assert_allclose(
        z[..., 0], np.asarray(x)[..., 2] * 255.0 - 103.939, rtol=1e-4)


def test_scale_center_crop_shapes():
    x = imgs(H=32, W=48)
    y = T.scale_shorter_side(x, 64)
    assert y.shape == (2, 64, 96, 3)
    c = T.center_crop(y, 56)
    assert c.shape == (2, 56, 56, 3)


def test_random_crop_and_flip():
    x = imgs(H=40, W=40)
    rng = jax.random.PRNGKey(0)
    c = T.random_crop(x, rng, 32)
    assert c.shape == (2, 32, 32, 3)
    # deterministic given the key
    c2 = T.random_crop(x, rng, 32)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c2))
    f = T.horizontal_flip(x, rng, prob=1.0)
    np.testing.assert_allclose(np.asarray(f), np.asarray(x)[:, :, ::-1, :])


def test_ten_crop():
    x = imgs(H=40, W=40)
    tc = T.ten_crop(x, 32)
    assert tc.shape == (10, 2, 32, 32, 3)
    # crop 0 is the center crop; crop 5 its mirror
    np.testing.assert_allclose(np.asarray(tc[5]),
                               np.asarray(tc[0])[:, :, ::-1, :])


@pytest.mark.slow
def test_photometric_jittable():
    x = imgs()
    rng = jax.random.PRNGKey(1)
    for fn in (lambda: T.saturation(x, rng, 0.4),
               lambda: T.brightness(x, rng, 0.4),
               lambda: T.contrast(x, rng, 0.4),
               lambda: T.lighting(x, rng),
               lambda: T.color_jitter(x, rng),
               lambda: T.rotation(x, rng, 10.0),
               lambda: T.random_sized_crop(x, rng, 24)):
        y = jax.jit(fn)()
        assert np.all(np.isfinite(np.asarray(y)))
    assert T.random_sized_crop(x, rng, 24).shape == (2, 24, 24, 3)


def test_compose_threads_rng():
    x = imgs(H=40, W=40)
    pipeline = T.compose(
        lambda im, r: T.random_crop(im, r, 32),
        lambda im, r: T.horizontal_flip(im, r),
        lambda im, r: T.color_normalize(im),
    )
    y = pipeline(x, jax.random.PRNGKey(2))
    assert y.shape == (2, 32, 32, 3)


# ---------------------------------------------------------------------------
# VGG16: full pool5 equivalence vs a hand-built torch Sequential
# ---------------------------------------------------------------------------

def torch_vgg16_features():
    layers = []
    c_in = 3
    for v in VGG16_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(c_in, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            c_in = v
    return nn.Sequential(*layers)


@pytest.mark.slow
def test_vgg16_matches_torch():
    torch.manual_seed(0)
    net = torch_vgg16_features().double().eval()
    # torchvision-style keys: conv indices within `features`
    state = {}
    conv_idx = [i for i, m in enumerate(net) if isinstance(m, nn.Conv2d)]
    for i in conv_idx:
        state[f"features.{i}.weight"] = net[i].weight.detach().numpy()
        state[f"features.{i}.bias"] = net[i].bias.detach().numpy()
    params = vgg16_from_torch_state(state)

    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    got = np.asarray(vgg16_pool5_apply(params, jnp.asarray(x)))
    with torch.no_grad():
        want = net(torch.as_tensor(x.transpose(0, 3, 1, 2), dtype=torch.float64))
    want = want.numpy().reshape(2, 512, -1).transpose(0, 2, 1)  # [B, S, D]
    assert got.shape == (2, 4, 512)   # 64/32 = 2x2 spatial
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_vgg16_448_shape():
    params = vgg16_pool5_init(jax.random.PRNGKey(0))
    # 448 input must give the 14x14x512 grid of the released features
    shape = jax.eval_shape(
        lambda p, x: vgg16_pool5_apply(p, x), params,
        jax.ShapeDtypeStruct((1, 448, 448, 3), jnp.float32))
    assert shape.shape == (1, 196, 512)


# ---------------------------------------------------------------------------
# ResNet-101
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_resnet101_shape_and_converter_keys():
    params = resnet101_init(jax.random.PRNGKey(0))
    shape = jax.eval_shape(
        lambda p, x: resnet101_apply(p, x), params,
        jax.ShapeDtypeStruct((1, 448, 448, 3), jnp.float32))
    assert shape.shape == (1, 196, 2048)   # 14x14x2048 pre-avgpool
    # stage structure: [3, 4, 23, 3] bottlenecks
    assert [len(s) for s in params["stages"]] == [3, 4, 23, 3]


def test_resnet_bottleneck_matches_torch():
    """One bottleneck block (with downsample) vs hand-built torch."""

    class Bottleneck(nn.Module):
        def __init__(self, c_in, width, stride):
            super().__init__()
            c_out = width * 4
            self.conv1 = nn.Conv2d(c_in, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, c_out, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(c_out)
            self.downsample = nn.Sequential(
                nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                nn.BatchNorm2d(c_out))

        def forward(self, x):
            y = torch.relu(self.bn1(self.conv1(x)))
            y = torch.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return torch.relu(self.downsample(x) + y)

    torch.manual_seed(1)
    blk = Bottleneck(16, 8, 2).eval()
    # randomize BN stats so the test isn't trivially mean-0/var-1
    for bn in (blk.bn1, blk.bn2, blk.bn3, blk.downsample[1]):
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 1.5)
        bn.weight.data.normal_(1, 0.2)
        bn.bias.data.normal_(0, 0.2)

    prefix = "layer1.0"
    state = {
        # dummy stem (the converter reads the full network)
        "conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
        "bn1.weight": np.ones(64, np.float32),
        "bn1.bias": np.zeros(64, np.float32),
        "bn1.running_mean": np.zeros(64, np.float32),
        "bn1.running_var": np.ones(64, np.float32),
        f"{prefix}.conv1.weight": blk.conv1.weight.detach().numpy(),
        f"{prefix}.conv2.weight": blk.conv2.weight.detach().numpy(),
        f"{prefix}.conv3.weight": blk.conv3.weight.detach().numpy(),
        f"{prefix}.downsample.0.weight":
            blk.downsample[0].weight.detach().numpy(),
    }
    for name, bn in [("bn1", blk.bn1), ("bn2", blk.bn2), ("bn3", blk.bn3),
                     ("downsample.1", blk.downsample[1])]:
        state[f"{prefix}.{name}.weight"] = bn.weight.detach().numpy()
        state[f"{prefix}.{name}.bias"] = bn.bias.detach().numpy()
        state[f"{prefix}.{name}.running_mean"] = bn.running_mean.numpy()
        state[f"{prefix}.{name}.running_var"] = bn.running_var.numpy()

    from rau_vqa_tpu.models.backbones.resnet import _bottleneck
    params = resnet_from_torch_state(state, blocks=(1,))
    x = np.random.RandomState(2).randn(2, 10, 10, 16).astype(np.float32)
    got = np.asarray(_bottleneck(jnp.asarray(x),
                                 params["stages"][0][0], stride=2))
    with torch.no_grad():
        want = blk(torch.as_tensor(x.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def _np_point_bilinear(img, ys, xs):
    """Plain (non-antialiased) bilinear point sampling — torch image.scale
    semantics, unlike jax.image.resize which low-pass-filters downscales."""
    B, H, W, C = img.shape
    out = np.zeros((B, ys.shape[1], xs.shape[1], C), np.float32)
    for b in range(B):
        yy = np.clip(ys[b], 0, H - 1)
        xx = np.clip(xs[b], 0, W - 1)
        y0 = np.floor(yy).astype(int); y1 = np.minimum(y0 + 1, H - 1)
        x0 = np.floor(xx).astype(int); x1 = np.minimum(x0 + 1, W - 1)
        wy = (yy - y0)[:, None, None]
        wx = (xx - x0)[None, :, None]
        im = img[b]
        top = im[y0][:, x0] * (1 - wx) + im[y0][:, x1] * wx
        bot = im[y1][:, x0] * (1 - wx) + im[y1][:, x1] * wx
        out[b] = top * (1 - wy) + bot * wy
    return out


def test_bilinear_sample_matches_numpy_oracle():
    rs = np.random.RandomState(0)
    img = rs.rand(2, 17, 23, 3).astype(np.float32)
    out_s = 11
    i = np.arange(out_s, dtype=np.float32)
    ys = np.broadcast_to((i + 0.5) * (17 / out_s) - 0.5, (2, out_s))
    xs = np.broadcast_to((i + 0.5) * (23 / out_s) - 0.5, (2, out_s))
    got = T._bilinear_sample(jnp.asarray(img), jnp.asarray(ys),
                             jnp.asarray(xs))
    want = _np_point_bilinear(img, ys, xs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_random_scale_crop_degenerate_is_resize():
    """minsize == maxsize == crop size on a square image leaves no crop
    freedom: the result must equal a plain point-bilinear resize."""
    rs = np.random.RandomState(1)
    img = rs.rand(3, 32, 32, 3).astype(np.float32)
    got = T.random_scale_crop(jnp.asarray(img), jax.random.PRNGKey(0),
                              16, 16, 16)
    i = np.arange(16, dtype=np.float32)
    grid = np.broadcast_to((i + 0.5) * 2.0 - 0.5, (3, 16))
    want = _np_point_bilinear(img, grid, grid)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_random_scale_crop_shapes_and_scale_variation():
    rs = np.random.RandomState(2)
    img = jnp.asarray(rs.rand(4, 40, 30, 3), jnp.float32)  # W < H
    out = T.random_scale_crop(img, jax.random.PRNGKey(3), 20, 36, 18)
    assert out.shape == (4, 18, 18, 3)
    assert bool(jnp.isfinite(out).all())
    # different key -> different scales/crops
    out2 = T.random_scale_crop(img, jax.random.PRNGKey(4), 20, 36, 18)
    assert (np.asarray(out) != np.asarray(out2)).any()
    with pytest.raises(ValueError):
        T.random_scale_crop(img, jax.random.PRNGKey(0), 10, 36, 18)


def test_random_sized_crop_matches_window_oracle():
    """Replicate the function's RNG draws to get each example's window,
    then point-bilinear-sample that window in numpy and compare."""
    rs = np.random.RandomState(3)
    B, H, W, size = 2, 28, 24, 14
    img = rs.rand(B, H, W, 3).astype(np.float32)
    rng = jax.random.PRNGKey(0)
    got = np.asarray(T.random_sized_crop(jnp.asarray(img), rng, size))

    k1, k2, k3, k4 = jax.random.split(rng, 4)
    area = np.asarray(jax.random.uniform(k1, (B,), minval=0.08, maxval=1.0))
    ratio = np.exp(np.asarray(jax.random.uniform(
        k2, (B,), minval=np.log(3 / 4), maxval=np.log(4 / 3))))
    th = np.clip(np.sqrt(area * H * W / ratio), 8.0, H)
    tw = np.clip(np.sqrt(area * H * W / ratio) * ratio, 8.0, W)
    y0 = np.asarray(jax.random.uniform(k3, (B,))) * (H - th)
    x0 = np.asarray(jax.random.uniform(k4, (B,))) * (W - tw)
    i = np.arange(size, dtype=np.float32)
    ys = y0[:, None] + (i[None, :] + 0.5) * (th[:, None] / size) - 0.5
    xs = x0[:, None] + (i[None, :] + 0.5) * (tw[:, None] / size) - 0.5
    want = _np_point_bilinear(img, ys, xs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
