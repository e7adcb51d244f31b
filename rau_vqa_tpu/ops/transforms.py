"""On-device batched image transforms (jittable, [B, H, W, C] float32).

TPU-native re-design of the reference's host-side, per-image transform
library (utils/transforms.lua, the fb.resnet.torch set): every transform
here is a pure jittable function over a *batch*, randomness is an explicit
PRNG key, and random crops/flips are per-example.  The loader only ever used
Compose+ColorNormalize (vqa_prepro_loader.lua:60-62); the full surface is
provided for parity and for the on-TPU backbone path (north-star requires
on-device batched preprocessing — BASELINE.json).

Covered surface (transforms.lua:17-291): Compose, ColorNormalize, Scale
(shorter side), CenterCrop, RandomCrop, TenCrop, RandomScale,
RandomSizedCrop, HorizontalFlip, Rotation, Lighting, Saturation,
Brightness, Contrast, ColorJitter — plus the two normalization schemes the
loader applies (BGR*255 - mean_bgr for VGG, mean/std for ResNet;
vqa_prepro_loader.lua:55-62, 1061-1067).
"""

from __future__ import annotations

import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp

Transform = Callable[..., jax.Array]

# ImageNet statistics (transforms used by fb.resnet.torch; also
# vqa_prepro_loader.lua:56-59)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# Caffe-VGG BGR means (vqa_prepro_loader.lua:55)
VGG_MEAN_BGR = (103.939, 116.779, 123.68)
# PCA lighting basis (fb.resnet.torch convention)
LIGHTING_ALPHASTD = 0.1
LIGHTING_EIGVAL = (0.2175, 0.0188, 0.0045)
LIGHTING_EIGVEC = (
    (-0.5675, 0.7192, 0.4009),
    (-0.5808, -0.0045, -0.8140),
    (-0.5836, -0.6948, 0.4203),
)


def compose(*transforms: Transform) -> Transform:
    """transforms.lua:17 Compose — right-to-left application order is NOT
    used there; it applies in list order, as here."""
    def apply(img, rng=None):
        for i, t in enumerate(transforms):
            if rng is not None:
                img = t(img, jax.random.fold_in(rng, i))
            else:
                img = t(img)
        return img
    return apply


def color_normalize(img: jax.Array,
                    mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jax.Array:
    """(x - mean) / std per channel (transforms.lua:26-35)."""
    mean = jnp.asarray(mean, img.dtype)
    std = jnp.asarray(std, img.dtype)
    return (img - mean) / std


def vgg_preprocess(img: jax.Array) -> jax.Array:
    """RGB [0,1] -> BGR * 255 - mean_bgr (the loader's VGG path,
    vqa_prepro_loader.lua:1061-1064)."""
    bgr = img[..., ::-1] * 255.0
    return bgr - jnp.asarray(VGG_MEAN_BGR, img.dtype)


def scale_shorter_side(img: jax.Array, size: int,
                       method: str = "cubic") -> jax.Array:
    """Resize so the shorter side equals ``size`` (transforms.lua:38-52;
    ``image.scale`` there defaults to 'bicubic', :39 — jax's 'cubic' is the
    same Catmull-Rom a=-0.5 kernel).  Point sampling (no antialiasing),
    matching torch image.scale.  Output spatial dims are static: both sides
    scale by size/min(H, W)."""
    B, H, W, C = img.shape
    if H <= W:
        new_h, new_w = size, max(1, round(W * size / H))
    else:
        new_h, new_w = max(1, round(H * size / W)), size
    return jax.image.resize(img, (B, new_h, new_w, C), method,
                            antialias=False)


def resize(img: jax.Array, h: int, w: int,
           method: str = "bilinear") -> jax.Array:
    B, _, _, C = img.shape
    return jax.image.resize(img, (B, h, w, C), method)


def center_crop(img: jax.Array, size: int) -> jax.Array:
    """transforms.lua:54-61."""
    B, H, W, C = img.shape
    y0 = (H - size) // 2
    x0 = (W - size) // 2
    return img[:, y0:y0 + size, x0:x0 + size, :]


def _dynamic_crop(img: jax.Array, y0, x0, size: int) -> jax.Array:
    """Per-example dynamic crop via vmap'd dynamic_slice."""
    def one(im, y, x):
        return jax.lax.dynamic_slice(im, (y, x, 0),
                                     (size, size, im.shape[-1]))
    return jax.vmap(one)(img, y0, x0)


def random_crop(img: jax.Array, rng: jax.Array, size: int,
                padding: int = 0) -> jax.Array:
    """Per-example random square crop (transforms.lua:63-87).  The reference
    zero-pads first when padding > 0."""
    if padding > 0:
        img = jnp.pad(img, ((0, 0), (padding, padding), (padding, padding),
                            (0, 0)))
    B, H, W, C = img.shape
    ky, kx = jax.random.split(rng)
    y0 = jax.random.randint(ky, (B,), 0, H - size + 1)
    x0 = jax.random.randint(kx, (B,), 0, W - size + 1)
    return _dynamic_crop(img, y0, x0, size)


def horizontal_flip(img: jax.Array, rng: jax.Array,
                    prob: float = 0.5) -> jax.Array:
    """Per-example random flip (transforms.lua:166-173)."""
    B = img.shape[0]
    flip = jax.random.bernoulli(rng, prob, (B,))
    return jnp.where(flip[:, None, None, None], img[:, :, ::-1, :], img)


def ten_crop(img: jax.Array, size: int) -> jax.Array:
    """Center + 4 corners, plus mirrored versions -> [10, B, size, size, C]
    (transforms.lua:89-112)."""
    B, H, W, C = img.shape
    corners = [((H - size) // 2, (W - size) // 2), (0, 0), (0, W - size),
               (H - size, 0), (H - size, W - size)]
    crops = [img[:, y:y + size, x:x + size, :] for y, x in corners]
    crops += [c[:, :, ::-1, :] for c in crops]
    return jnp.stack(crops)


def _bilinear_sample(img: jax.Array, ys: jax.Array,
                     xs: jax.Array) -> jax.Array:
    """Per-example bilinear sampling at fractional coordinates.

    img [B, H, W, C]; ys [B, S] row coords, xs [B, S] col coords (pixel
    centers, may be traced) -> [B, S, S, C] sampled on the ys x xs grid.
    Half-pixel convention matches jax.image.resize(method='bilinear')."""
    B, H, W, C = img.shape
    ys = jnp.clip(ys, 0.0, H - 1.0)
    xs = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[:, :, None, None]                     # [B, S, 1, 1]
    wx = (xs - x0)[:, None, :, None]                     # [B, 1, S, 1]
    b = jnp.arange(B)[:, None, None]

    def g(yy, xx):
        return img[b, yy[:, :, None], xx[:, None, :], :]  # [B, S, S, C]

    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def _catmull_rom_weights(t: jax.Array):
    """Cubic-convolution (a = -0.5, Catmull-Rom) weights for the 4 taps at
    integer offsets -1, 0, 1, 2 around a sample with fractional part ``t``.

    This is the kernel torch's ``image.scale(..., 'bicubic')`` evaluates
    (cubicInterpolate in the torch/image C sources), which the reference
    pins for Scale/RandomScale/RandomSizedCrop (transforms.lua:39,127,158).
    """
    t2 = t * t
    t3 = t2 * t
    return (0.5 * (-t + 2.0 * t2 - t3),
            0.5 * (2.0 - 5.0 * t2 + 3.0 * t3),
            0.5 * (t + 4.0 * t2 - 3.0 * t3),
            0.5 * (-t2 + t3))


def _cubic_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Per-example separable bicubic (Catmull-Rom) sampling at fractional
    coordinates — the 4x4-tap analogue of ``_bilinear_sample`` with
    edge-replicated taps.  img [B, H, W, C]; ys/xs [B, S] pixel-center
    coords -> [B, S, S, C]."""
    B, H, W, C = img.shape
    ys = jnp.clip(ys, 0.0, H - 1.0)
    xs = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = _catmull_rom_weights((ys - y0)[:, :, None, None])   # 4x [B, S, 1, 1]
    wx = _catmull_rom_weights((xs - x0)[:, None, :, None])   # 4x [B, 1, S, 1]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    b = jnp.arange(B)[:, None, None]
    xtaps = [jnp.clip(x0 + (i - 1), 0, W - 1) for i in range(4)]
    out = jnp.zeros((B, ys.shape[1], xs.shape[1], C), img.dtype)
    for j in range(4):
        yy = jnp.clip(y0 + (j - 1), 0, H - 1)
        row = jnp.zeros_like(out)
        for i in range(4):
            row = row + img[b, yy[:, :, None], xtaps[i][:, None, :], :] * wx[i]
        out = out + row * wy[j]
    return out


def _torch_round(x: jax.Array) -> jax.Array:
    """floor(x + 0.5): torch.round's half-away-from-zero for positive x.
    jnp.round is half-to-even, which shifts the virtual crop dims by 1 on
    exact-.5 products (common for rational aspect ratios like 3:2)."""
    return jnp.floor(x + 0.5)


def _randint_traced(key: jax.Array, shape, upper: jax.Array) -> jax.Array:
    """Uniform integers in [0, upper] (inclusive) with a TRACED per-element
    upper bound — torch.random(0, n) semantics for data-dependent n (the
    reference's crop-origin draws, transforms.lua:80,153-154)."""
    u = jax.random.uniform(key, shape)
    return jnp.minimum(jnp.floor(u * (upper + 1.0)), upper).astype(jnp.int32)


def random_scale(img: jax.Array, rng: jax.Array, minsize: int,
                 maxsize: int) -> jax.Array:
    """Scale shorter side to a random target (transforms.lua:114-129).

    The reference returns a VARIABLE-size image, which jit cannot express;
    this standalone form applies the max scale and a random crop of the min
    size (an approximation).  For the composition the reference actually
    uses (RandomScale -> fixed-size crop), use ``random_scale_crop`` below,
    which is distribution-exact under static shapes."""
    scaled = scale_shorter_side(img, maxsize)
    size = int(minsize)
    return random_crop(scaled, rng, size) if maxsize > minsize else scaled


def random_scale_crop(img: jax.Array, rng: jax.Array, minsize: int,
                      maxsize: int, size: int) -> jax.Array:
    """Exact static-shape equivalent of reference ``RandomScale(min, max)``
    followed by ``RandomCrop(size)`` (transforms.lua:114-129 + :63-87).

    Per example: draw the shorter-side target uniformly over the INTEGERS
    [minsize, maxsize] (torch.random semantics, :118), derive the
    aspect-preserving virtual dims (:119-124), draw an INTEGER crop origin
    uniformly over [0, virtual-size] inclusive (torch.random(0, n), :80),
    and bicubic-sample the size x size window directly from the source —
    one fused gather instead of a resize pass, same output distribution and
    the reference's Catmull-Rom kernel (:127).  Requires minsize >= size,
    as the reference composition does.  Remaining convention delta:
    sampling uses the half-pixel mapping src = (dst+0.5)*(SRC/DST)-0.5."""
    if minsize < size:
        raise ValueError(f"minsize {minsize} < crop size {size}: the "
                         f"reference composition would crash too")
    B, H, W, C = img.shape
    k1, k2, k3 = jax.random.split(rng, 3)
    target = jax.random.randint(k1, (B,), minsize, maxsize + 1)
    target = target.astype(jnp.float32)
    if W < H:
        tw = target
        th = _torch_round(H / W * tw)
    else:
        th = target
        tw = _torch_round(W / H * th)
    # integer crop origin in the virtual rescaled image (inclusive bound)
    y0 = _randint_traced(k2, (B,), th - size).astype(jnp.float32)
    x0 = _randint_traced(k3, (B,), tw - size).astype(jnp.float32)
    # map destination pixel centers back to source coordinates
    i = jnp.arange(size, dtype=jnp.float32)
    ys = (y0[:, None] + i[None, :] + 0.5) * (H / th)[:, None] - 0.5
    xs = (x0[:, None] + i[None, :] + 0.5) * (W / tw)[:, None] - 0.5
    return _cubic_sample(img, ys, xs)


def random_sized_crop(img: jax.Array, rng: jax.Array, size: int, *,
                      min_area: float = 0.08,
                      attempts: int = 10) -> jax.Array:
    """Inception-style random area+aspect crop resized to ``size``
    (transforms.lua:131-164), distribution-exact in static shapes.

    Per example, mirrors the reference's rejection loop: up to ``attempts``
    draws of (area in [min_area, 1] x source area, aspect UNIFORM in
    [3/4, 4/3], 50% w/h swap, ROUNDED integer crop dims, INTEGER crop
    origin over the inclusive valid range — :137-154); the first draw that
    fits inside the image wins.  If none fits, the reference's fallback
    ``Scale(size)`` + ``CenterCrop(size)`` window applies (:162-163).  All
    candidate windows are computed vectorized and the winner selected by
    mask — no data-dependent control flow — then the crop and the
    ``Scale(size, 'bicubic')`` resize (:158) fuse into ONE Catmull-Rom
    gather.  Remaining convention delta: half-pixel sampling grid."""
    B, H, W, C = img.shape
    A = int(attempts)
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    area = jax.random.uniform(k1, (B, A), minval=min_area,
                              maxval=1.0) * (H * W)
    aspect = jax.random.uniform(k2, (B, A), minval=3 / 4, maxval=4 / 3)
    w = _torch_round(jnp.sqrt(area * aspect))
    h = _torch_round(jnp.sqrt(area / aspect))
    swap = jax.random.uniform(k3, (B, A)) < 0.5        # :143-145
    w, h = jnp.where(swap, h, w), jnp.where(swap, w, h)
    valid = (h <= H) & (w <= W)
    # integer origins over [0, H-h] x [0, W-w] inclusive (:153-154); the
    # bound is clamped for invalid candidates (they are never selected)
    y1 = _randint_traced(k4, (B, A), jnp.maximum(H - h, 0.0))
    x1 = _randint_traced(k5, (B, A), jnp.maximum(W - w, 0.0))
    first = jnp.argmax(valid, axis=1)                  # first fitting draw
    has_valid = jnp.any(valid, axis=1)
    pick = lambda v: jnp.take_along_axis(v, first[:, None], axis=1)[:, 0]
    ch, cw = pick(h), pick(w)
    cy, cx = pick(y1).astype(jnp.float32), pick(x1).astype(jnp.float32)

    # fallback: Scale(size) + CenterCrop(size) (:162-163) expressed as a
    # source-space window: virtual dims scale the shorter side to `size`,
    # origin = ceil((virtual - size)/2) (CenterCrop, :56-57)
    if H <= W:
        vh, vw = float(size), float(max(1, round(W * size / H)))
    else:
        vh, vw = float(max(1, round(H * size / W))), float(size)
    fy = math.ceil((vh - size) / 2) * (H / vh)
    fx = math.ceil((vw - size) / 2) * (W / vw)

    # unified sampling: ys = y0 + (i + 0.5) * step - 0.5 in source coords
    y0 = jnp.where(has_valid, cy, fy)
    x0 = jnp.where(has_valid, cx, fx)
    sy = jnp.where(has_valid, ch / size, H / vh)
    sx = jnp.where(has_valid, cw / size, W / vw)
    i = jnp.arange(size, dtype=jnp.float32)
    ys = y0[:, None] + (i[None, :] + 0.5) * sy[:, None] - 0.5
    xs = x0[:, None] + (i[None, :] + 0.5) * sx[:, None] - 0.5
    return _cubic_sample(img, ys, xs)


def rotation(img: jax.Array, rng: jax.Array, deg: float) -> jax.Array:
    """Random rotation in [-deg, deg] via bilinear grid sampling
    (transforms.lua:175-183)."""
    from jax.scipy.ndimage import map_coordinates

    B, H, W, C = img.shape
    theta = jax.random.uniform(rng, (B,), minval=-deg, maxval=deg)
    theta = theta * (jnp.pi / 180.0)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    def rot_one(im, th):
        cos, sin = jnp.cos(th), jnp.sin(th)
        sy = cos * (yy - cy) - sin * (xx - cx) + cy
        sx = sin * (yy - cy) + cos * (xx - cx) + cx
        chans = [map_coordinates(im[..., c], [sy, sx], order=1)
                 for c in range(C)]
        return jnp.stack(chans, axis=-1)

    return jax.vmap(rot_one)(img, theta)


def _grayscale(img: jax.Array) -> jax.Array:
    """Luma per the fb.resnet.torch coefficients (transforms.lua:205-216)."""
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    g = jnp.sum(img * w, axis=-1, keepdims=True)
    return jnp.broadcast_to(g, img.shape)


def _blend(a: jax.Array, b: jax.Array, alpha: jax.Array) -> jax.Array:
    while alpha.ndim < a.ndim:
        alpha = alpha[..., None]
    return alpha * a + (1.0 - alpha) * b


def saturation(img: jax.Array, rng: jax.Array, var: float) -> jax.Array:
    """blend(img, gray(img), 1 + U(-var, var)) (transforms.lua:219-233)."""
    B = img.shape[0]
    alpha = 1.0 + jax.random.uniform(rng, (B,), minval=-var, maxval=var)
    return _blend(img, _grayscale(img), alpha)


def brightness(img: jax.Array, rng: jax.Array, var: float) -> jax.Array:
    """blend(img, 0, alpha) (transforms.lua:236-249)."""
    B = img.shape[0]
    alpha = 1.0 + jax.random.uniform(rng, (B,), minval=-var, maxval=var)
    return _blend(img, jnp.zeros_like(img), alpha)


def contrast(img: jax.Array, rng: jax.Array, var: float) -> jax.Array:
    """blend(img, mean(gray(img)), alpha) (transforms.lua:252-266)."""
    B = img.shape[0]
    alpha = 1.0 + jax.random.uniform(rng, (B,), minval=-var, maxval=var)
    gray_mean = jnp.mean(_grayscale(img), axis=(1, 2), keepdims=True)
    return _blend(img, jnp.broadcast_to(gray_mean, img.shape), alpha)


def lighting(img: jax.Array, rng: jax.Array,
             alphastd: float = LIGHTING_ALPHASTD) -> jax.Array:
    """AlexNet-style PCA color noise (transforms.lua:185-203)."""
    B = img.shape[0]
    alpha = jax.random.normal(rng, (B, 3)) * alphastd
    eigval = jnp.asarray(LIGHTING_EIGVAL, img.dtype)
    eigvec = jnp.asarray(LIGHTING_EIGVEC, img.dtype)
    shift = (eigvec * alpha[:, None, :] * eigval[None, None, :]).sum(-1)
    return img + shift[:, None, None, :]


def color_jitter(img: jax.Array, rng: jax.Array, *, brightness_var=0.4,
                 contrast_var=0.4, saturation_var=0.4) -> jax.Array:
    """Random-order brightness/contrast/saturation (transforms.lua:268-291).
    Static-shape variant: applies in a per-batch random permutation chosen
    from the 6 orders with lax.switch."""
    ts = [functools.partial(brightness, var=brightness_var),
          functools.partial(contrast, var=contrast_var),
          functools.partial(saturation, var=saturation_var)]
    import itertools
    orders = list(itertools.permutations(range(3)))
    k_pick, *keys = jax.random.split(rng, 4)

    def apply_order(order_idx):
        def f(x):
            y = x
            for slot, t_idx in enumerate(orders[order_idx]):
                y = ts[t_idx](y, keys[slot])
            return y
        return f

    idx = jax.random.randint(k_pick, (), 0, len(orders))
    return jax.lax.switch(idx, [apply_order(i) for i in range(6)], img)
