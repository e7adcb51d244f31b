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


@pytest.mark.slow
def test_fold_batchnorm_matches_unfolded():
    """fold_batchnorm is the same affine map: a tiny ResNet with randomized
    BN statistics must produce identical features folded vs not."""
    from rau_vqa_tpu.models.backbones import resnet as R

    rs = np.random.RandomState(0)
    params = R.resnet101_init(jax.random.PRNGKey(2))
    # shrink: keep only 1 block per stage for speed, randomize BN stats
    params["stages"] = [blocks[:1] for blocks in params["stages"]]

    def randomize_bn(bn):
        bn["mean"] = jnp.asarray(rs.normal(0, 0.5, bn["mean"].shape),
                                 jnp.float32)
        bn["var"] = jnp.asarray(rs.uniform(0.5, 1.5, bn["var"].shape),
                                jnp.float32)
        bn["scale"] = jnp.asarray(rs.normal(1, 0.2, bn["scale"].shape),
                                  jnp.float32)
        bn["offset"] = jnp.asarray(rs.normal(0, 0.2, bn["offset"].shape),
                                   jnp.float32)

    randomize_bn(params["bn1"])
    for blocks in params["stages"]:
        for blk in blocks:
            for k in list(blk):
                if k.startswith("bn") or k == "down_bn":
                    randomize_bn(blk[k])

    x = jnp.asarray(rs.rand(2, 64, 64, 3), jnp.float32)
    want = np.asarray(R.resnet101_apply(params, x))
    got = np.asarray(R.resnet101_apply(R.fold_batchnorm(params), x))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_int8_resnet_tracks_f32():
    """The experimental int8 serving mode (per-channel weights, dynamic
    per-tensor activations, s8s8s32 convs) must track the f32 features
    closely on a shrunk net — quantization noise, not wrong math."""
    from rau_vqa_tpu.models.backbones import resnet as R

    rs = np.random.RandomState(4)
    params = R.resnet101_init(jax.random.PRNGKey(5))
    params["stages"] = [blocks[:1] for blocks in params["stages"]]
    folded = R.fold_batchnorm(params)
    x = jnp.asarray(rs.rand(2, 64, 64, 3), jnp.float32)
    ref = np.asarray(R.resnet101_apply(folded, x)).ravel()
    got = np.asarray(R.resnet101_apply_int8(R.quantize_resnet(folded),
                                            x)).ravel()
    corr = np.corrcoef(ref, got)[0, 1]
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert corr > 0.995 and rel < 0.1, (corr, rel)


def test_space_to_depth_stem_matches_conv1():
    """The s2d stem rewrite (4x4/1 conv on a 2x2-s2d grid, pad (2,1)) is
    EXACTLY the 7x7/2 pad-3 conv1 — the MXU-friendly ResNet stem."""
    from rau_vqa_tpu.models.backbones import resnet as R

    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(7, 7, 3, 16).astype(np.float32) * 0.1)
    b = jnp.asarray(rs.randn(16).astype(np.float32) * 0.1)
    x = jnp.asarray(rs.randn(2, 32, 32, 3).astype(np.float32))
    ref = jax.nn.relu(R._conv(x, w, stride=2) + b)
    p2 = R.space_to_depth_stem({"conv1": {"w": w, "b": b}})
    y = jax.lax.conv_general_dilated(
        R._s2d(x), p2["conv1"]["w"], (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = jax.nn.relu(y + p2["conv1"]["b"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


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


def _np_point_cubic(img, ys, xs):
    """Independent numpy Catmull-Rom (a=-0.5) sampler with edge-replicated
    taps — pins T._cubic_sample against the kernel torch image.scale
    'bicubic' evaluates (the reference's pinned filter,
    transforms.lua:39,127,158)."""
    B, H, W, C = img.shape
    out = np.zeros((B, ys.shape[1], xs.shape[1], C), np.float32)

    def weights(t):
        t2, t3 = t * t, t ** 3
        return np.stack([0.5 * (-t + 2 * t2 - t3),
                         0.5 * (2 - 5 * t2 + 3 * t3),
                         0.5 * (t + 4 * t2 - 3 * t3),
                         0.5 * (-t2 + t3)])

    for b in range(B):
        yy = np.clip(ys[b], 0, H - 1)
        xx = np.clip(xs[b], 0, W - 1)
        y0 = np.floor(yy).astype(int)
        x0 = np.floor(xx).astype(int)
        wy = weights(yy - y0)                      # [4, S]
        wx = weights(xx - x0)
        for j in range(4):
            yt = np.clip(y0 + j - 1, 0, H - 1)
            for i in range(4):
                xt = np.clip(x0 + i - 1, 0, W - 1)
                out[b] += (img[b][yt][:, xt]
                           * wy[j][:, None, None] * wx[i][None, :, None])
    return out


def test_cubic_sample_matches_numpy_oracle():
    rs = np.random.RandomState(7)
    img = rs.rand(2, 19, 21, 3).astype(np.float32)
    ys = rs.rand(2, 9).astype(np.float32) * 18.0
    xs = rs.rand(2, 9).astype(np.float32) * 20.0
    got = np.asarray(T._cubic_sample(jnp.asarray(img), jnp.asarray(ys),
                                     jnp.asarray(xs)))
    want = _np_point_cubic(img, ys, xs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cubic_upscale_matches_pil_bicubic():
    """Independent golden cross-check: on an UPSCALE (where PIL applies no
    antialias, so its BICUBIC is exactly point-sampled Catmull-Rom at the
    half-pixel grid) our sampler must match PIL.Image BICUBIC on the
    INTERIOR.  (Edge policies differ by design: PIL drops out-of-range taps
    and renormalizes; we replicate the edge row/col like torch image.)"""
    from PIL import Image

    rs = np.random.RandomState(3)
    src = rs.rand(12, 10).astype(np.float32)
    out_h, out_w = 24, 20
    want = np.asarray(Image.fromarray(src, mode="F").resize(
        (out_w, out_h), Image.BICUBIC))
    iy = np.arange(out_h, dtype=np.float32)
    ix = np.arange(out_w, dtype=np.float32)
    ys = ((iy + 0.5) * (12 / out_h) - 0.5)[None]
    xs = ((ix + 0.5) * (10 / out_w) - 0.5)[None]
    got = np.asarray(T._cubic_sample(
        jnp.asarray(src[None, :, :, None]), jnp.asarray(ys),
        jnp.asarray(xs)))[0, :, :, 0]
    # interior = dst pixels whose 4x4 tap window stays in range
    np.testing.assert_allclose(got[4:-4, 4:-4], want[4:-4, 4:-4],
                               rtol=1e-3, atol=2e-4)


@pytest.mark.slow   # fast-loop budget (VERDICT r4 #5); full suite runs it
def test_random_scale_crop_degenerate_is_resize():
    """minsize == maxsize == crop size on a square image leaves no crop
    freedom: the result must equal a plain point-bicubic resize."""
    rs = np.random.RandomState(1)
    img = rs.rand(3, 32, 32, 3).astype(np.float32)
    got = T.random_scale_crop(jnp.asarray(img), jax.random.PRNGKey(0),
                              16, 16, 16)
    i = np.arange(16, dtype=np.float32)
    grid = np.broadcast_to((i + 0.5) * 2.0 - 0.5, (3, 16))
    want = _np_point_cubic(img, grid, grid)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow   # >5 s: fast-loop budget (CLAUDE.md)
def test_random_scale_crop_integer_origins():
    """Crop origins are integers in the virtual image (torch.random(0, n),
    transforms.lua:80): with min==max the sampled grid offset of every
    example must be an integer multiple of the scale step."""
    rs = np.random.RandomState(5)
    img = jnp.asarray(rs.rand(8, 48, 48, 3), jnp.float32)
    minsize = maxsize = 24
    size = 16
    # replicate the function's draws
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    y0 = np.asarray(T._randint_traced(k2, (8,),
                                      jnp.full((8,), float(24 - size))))
    assert y0.dtype == np.int32 and (y0 <= 24 - size).all() and (y0 >= 0).all()
    out = T.random_scale_crop(img, jax.random.PRNGKey(9), minsize,
                              maxsize, size)
    assert out.shape == (8, size, size, 3)


@pytest.mark.slow   # fast-loop budget (VERDICT r4 #5); full suite runs it
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


@pytest.mark.slow   # fast-loop budget (VERDICT r4 #5); full suite runs it
def test_random_sized_crop_matches_window_oracle():
    """Replicate the function's RNG draws to get each example's first
    fitting window (reference rejection-loop semantics,
    transforms.lua:137-154), then point-bicubic-sample it in numpy."""
    rs = np.random.RandomState(3)
    B, H, W, size, A = 4, 28, 24, 14, 10
    img = rs.rand(B, H, W, 3).astype(np.float32)
    rng = jax.random.PRNGKey(0)
    got = np.asarray(T.random_sized_crop(jnp.asarray(img), rng, size))

    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    area = np.asarray(jax.random.uniform(
        k1, (B, A), minval=0.08, maxval=1.0)) * (H * W)
    aspect = np.asarray(jax.random.uniform(
        k2, (B, A), minval=3 / 4, maxval=4 / 3))
    w = np.floor(np.sqrt(area * aspect) + 0.5)      # torch.round semantics
    h = np.floor(np.sqrt(area / aspect) + 0.5)
    swap = np.asarray(jax.random.uniform(k3, (B, A))) < 0.5
    w, h = np.where(swap, h, w), np.where(swap, w, h)
    valid = (h <= H) & (w <= W)
    uy = np.asarray(jax.random.uniform(k4, (B, A)))
    ux = np.asarray(jax.random.uniform(k5, (B, A)))
    y1 = np.minimum(np.floor(uy * (np.maximum(H - h, 0) + 1)),
                    np.maximum(H - h, 0))
    x1 = np.minimum(np.floor(ux * (np.maximum(W - w, 0) + 1)),
                    np.maximum(W - w, 0))
    assert valid.any(axis=1).all(), "fixture should avoid the fallback"
    first = valid.argmax(axis=1)
    sel = lambda v: v[np.arange(B), first]
    ch, cw, cy, cx = sel(h), sel(w), sel(y1), sel(x1)
    i = np.arange(size, dtype=np.float32)
    ys = cy[:, None] + (i[None, :] + 0.5) * (ch[:, None] / size) - 0.5
    xs = cx[:, None] + (i[None, :] + 0.5) * (cw[:, None] / size) - 0.5
    want = _np_point_cubic(img, ys, xs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # integer crop dims and origins, as the reference rounds/draws them
    assert np.all(ch == np.round(ch)) and np.all(cy == np.round(cy))


@pytest.mark.slow   # >5 s: fast-loop budget (CLAUDE.md)
def test_random_sized_crop_fallback_is_scale_centercrop():
    """A min_area floor of ~1.0 with extreme aspect draws can never fit?
    No — force the fallback deterministically instead: attempts=0 is not
    representable, so use a 1-attempt variant where the draw misses, by
    picking an rng whose single candidate is invalid."""
    rs = np.random.RandomState(11)
    B, H, W, size = 3, 20, 36, 16
    img = rs.rand(B, H, W, 3).astype(np.float32)
    # find a key whose single attempt fails for every example
    for seed in range(200):
        rng = jax.random.PRNGKey(seed)
        k1, k2, k3, _, _ = jax.random.split(rng, 5)
        area = np.asarray(jax.random.uniform(
            k1, (B, 1), minval=0.08, maxval=1.0)) * (H * W)
        aspect = np.asarray(jax.random.uniform(
            k2, (B, 1), minval=3 / 4, maxval=4 / 3))
        w = np.round(np.sqrt(area * aspect))
        h = np.round(np.sqrt(area / aspect))
        swap = np.asarray(jax.random.uniform(k3, (B, 1))) < 0.5
        w, h = np.where(swap, h, w), np.where(swap, w, h)
        if not ((h <= H) & (w <= W)).any():
            break
    else:
        pytest.skip("no all-invalid key found")
    got = np.asarray(T.random_sized_crop(jnp.asarray(img), rng, size,
                                         attempts=1))
    # oracle: Scale(size) shorter-side + CenterCrop(size) window
    vh, vw = float(size), float(round(W * size / H))
    import math
    fy = math.ceil((vh - size) / 2) * (H / vh)
    fx = math.ceil((vw - size) / 2) * (W / vw)
    i = np.arange(size, dtype=np.float32)
    ys = np.broadcast_to(fy + (i + 0.5) * (H / vh) - 0.5, (B, size))
    xs = np.broadcast_to(fx + (i + 0.5) * (W / vw) - 0.5, (B, size))
    want = _np_point_cubic(img, ys, xs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow   # fast-loop budget (VERDICT r4 #5); full suite runs it
def test_backbone_trees_are_jit_argument_safe():
    """Backbone trees must contain ONLY array leaves: a python bool flag
    (the old {'folded': True}/{'s2d': True} markers) becomes a tracer when
    the tree rides as a jit ARGUMENT — exactly how bench_pixels,
    make_sharded_pixels_predict, precompute-features, and pixels_forward
    pass it — and `if folded:` raised TracerBoolConversionError.  Flags
    now derive from static structure (keys/shapes)."""
    from rau_vqa_tpu.models.backbones import resnet as R

    bb = R.resnet101_init(jax.random.PRNGKey(0))
    folded = R.fold_batchnorm(bb)
    s2d = R.space_to_depth_stem(folded)
    int8 = R.quantize_resnet(folded)
    for tree in (bb, folded, s2d, int8):
        for leaf in jax.tree_util.tree_leaves(tree):
            assert isinstance(leaf, jax.Array), type(leaf)

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    assert jax.jit(R.resnet101_apply)(folded, x).shape == (1, 4, 2048)
    assert jax.jit(R.resnet101_apply)(s2d, x).shape == (1, 4, 2048)
    assert jax.jit(R.resnet101_apply_int8)(int8, x).shape == (1, 4, 2048)

    # the real call shape: pixels_forward takes bb_params as a jit arg
    import dataclasses

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.models.pipeline import pixels_forward
    from rau_vqa_tpu.models.rau import init_params

    cfg = dataclasses.replace(get_preset("ours_resnet").model,
                              cnn_w=2, cnn_h=2, n_hops=1, rnn_size=16,
                              embed_dim=8, multfeat_dim=16, attfeat_dim=8,
                              att_rnn_size=16, vocab_size=20,
                              answer_size=5, seq_len=4)
    params = init_params(jax.random.PRNGKey(1), cfg)
    out = pixels_forward(params, folded, cfg, "resnet101",
                         jnp.zeros((2, 64, 64, 3), jnp.uint8),
                         jnp.ones((2, 4), jnp.int32),
                         jnp.full((2,), 2, jnp.int32))
    assert out.scores.shape[1] == 2


def test_backbone_bf16_init_stays_bf16():
    """A bf16 init must produce UNIFORMLY bf16 trees end to end.  NumPy
    scalar factors (np.sqrt std) are strong f32 under jax promotion and
    silently upcast conv weights — every "bf16" resnet/vgg serving bench
    through round 3 actually moved f32 tensors (2x HBM traffic, and the
    fused-stage kernel VMEM-OOMed on f32 operands it was never meant to
    see).  eval_shape only: no FLOPs, catches the dtype graph."""
    from rau_vqa_tpu.models.backbones import resnet as R
    from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
    from rau_vqa_tpu.models.backbones.vit import VIT_L14, vit_init

    def all_dtypes(tree):
        return {str(leaf.dtype) for leaf in jax.tree_util.tree_leaves(tree)}

    key = jax.random.PRNGKey(0)
    rn_s = jax.eval_shape(lambda k: R.resnet101_init(k, dtype=jnp.bfloat16),
                          key)
    assert all_dtypes(rn_s) == {"bfloat16"}
    # fold_batchnorm is a host-numpy fold (cannot run under eval_shape);
    # exercise its dtype handling on a minimal real tree instead of the
    # 15-second full resnet101 materialization (fast-loop budget)
    def conv(ci, co, k=1):
        return {"w": jnp.zeros((k, k, ci, co), jnp.bfloat16)}
    def bn(c):
        return {"scale": jnp.ones((c,), jnp.bfloat16),
                "offset": jnp.zeros((c,), jnp.bfloat16),
                "mean": jnp.zeros((c,), jnp.bfloat16),
                "var": jnp.ones((c,), jnp.bfloat16)}
    tiny = {"conv1": conv(3, 8, 7), "bn1": bn(8),
            "stages": [[{"conv1": conv(8, 4), "bn1": bn(4),
                         "conv2": conv(4, 4, 3), "bn2": bn(4),
                         "conv3": conv(4, 8), "bn3": bn(8),
                         "down": conv(8, 8), "down_bn": bn(8)}]]}
    folded = R.fold_batchnorm(tiny)
    assert all_dtypes(folded) == {"bfloat16"}
    assert all_dtypes(jax.eval_shape(
        lambda k: vgg16_pool5_init(k, dtype=jnp.bfloat16),
        key)) == {"bfloat16"}
    vit = jax.eval_shape(
        lambda k: vit_init(k, VIT_L14, dtype=jnp.bfloat16), key)
    assert all_dtypes(vit) == {"bfloat16"}

    # apply fns must keep the param dtype (the vit attention scale was a
    # strong-f32 np scalar: scores AND every post-residual layer ran f32)
    from rau_vqa_tpu.models.backbones.vit import vit_apply
    x = jax.ShapeDtypeStruct((2, 224, 224, 3), jnp.float32)
    out = jax.eval_shape(lambda p, im: vit_apply(p, VIT_L14, im), vit, x)
    assert out.dtype == jnp.bfloat16
    xr = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    outr = jax.eval_shape(R.resnet101_apply, folded, xr)
    assert outr.dtype == jnp.bfloat16
