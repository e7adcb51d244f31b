"""Native C++ feature-loader: builds, matches the Python store bit-exact,
survives ring reuse across many batches."""

import json
import os

import numpy as np
import pytest

from rau_vqa_tpu.data.features import PackedFeatureStore, coco_feat_name, pack_feature_dir
from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture

SPEC = FixtureSpec()


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native_fixture"))
    vqa_dir = generate_fixture(root, SPEC)
    with open(os.path.join(vqa_dir, "data_prepro.json")) as f:
        info = json.load(f)
    imgs = info["unique_img_train"] + info["unique_img_test"]
    out = os.path.join(root, "packed")
    pack_feature_dir([os.path.join(root, "feat")], imgs, [1] * len(imgs),
                     out, SPEC.feat_dim, SPEC.feat_w, SPEC.feat_h)
    return out, [coco_feat_name(p) for p in imgs]


def test_native_builds_and_matches_python(packed):
    from rau_vqa_tpu.data.native import NativePackedFeatureStore

    shard, names = packed
    py_store = PackedFeatureStore(shard)
    native = NativePackedFeatureStore(shard, n_threads=3)
    rs = np.random.RandomState(0)
    for trial in range(8):
        pick = [names[i] for i in rs.randint(0, len(names), 16)]
        a = native.get_batch(pick, [1] * len(pick))
        b = py_store.get_batch(pick, [1] * len(pick))
        np.testing.assert_array_equal(a, b)
    native.close()


def test_native_in_split_iteration(packed):
    """Full epoch through SplitData.batches with the native source."""
    from rau_vqa_tpu.data.loader import load_vqa_data
    from rau_vqa_tpu.data.native import NativePackedFeatureStore

    shard, _ = packed
    vqa_dir = os.path.join(os.path.dirname(shard), "vqa_prepro")
    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                         test_batch_size=8)
    native = NativePackedFeatureStore(shard, n_threads=2)
    py_store = PackedFeatureStore(shard)

    def epoch(src, prefetch):
        d = load_vqa_data(vqa_dir, batch_size=16, split="val2014", seed=3)
        d.train_data.inorder()
        return [b.feats for b in d.train_data.batches(src, prefetch=prefetch)]

    a = epoch(native, True)
    b = epoch(py_store, False)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    native.close()


# ---------------------------------------------------------------------------
# native image decode (the torch-image role)
# ---------------------------------------------------------------------------

def _cr_taps(out_size, origin, sc, n):
    i = np.arange(out_size)
    pos = np.clip((origin + i + 0.5) * sc - 0.5, 0, n - 1)
    base = np.floor(pos).astype(int)
    t = (pos - base)[:, None]
    w4 = np.concatenate([0.5 * (-t + 2 * t * t - t ** 3),
                         0.5 * (2 - 5 * t * t + 3 * t ** 3),
                         0.5 * (t + 4 * t * t - 3 * t ** 3),
                         0.5 * (-t * t + t ** 3)], axis=1)
    idx = np.clip(base[:, None] + np.arange(-1, 3)[None], 0, n - 1)
    return idx, w4


def test_native_decode_matches_oracle(tmp_path):
    """C++ decode+resample == PIL decode (same libjpeg) followed by the
    numpy Catmull-Rom fused-window oracle — and byte-exact when the source
    is already at target size (no resample)."""
    from PIL import Image

    from rau_vqa_tpu.data.native import decode_image_batch

    rs = np.random.RandomState(0)
    size = 64
    exact = rs.randint(0, 256, (size, size, 3)).astype(np.uint8)
    p1 = str(tmp_path / "exact.jpg")
    Image.fromarray(exact).save(p1, quality=95)
    scaled = rs.randint(0, 256, (96, 130, 3)).astype(np.uint8)
    p2 = str(tmp_path / "scaled.jpg")
    Image.fromarray(scaled).save(p2, quality=95)

    out = decode_image_batch([p1, p2], size, n_threads=2)
    np.testing.assert_array_equal(out[0], np.asarray(Image.open(p1)))

    src = np.asarray(Image.open(p2)).astype(np.float32)
    h, w = src.shape[:2]
    scale = size / min(w, h)
    new_w = max(size, round(w * scale))
    new_h = max(size, round(h * scale))
    yi, yw = _cr_taps(size, (new_h - size + 1) // 2, h / new_h, h)
    xi, xw = _cr_taps(size, (new_w - size + 1) // 2, w / new_w, w)
    tmp = np.einsum("ik,ikwc->iwc", yw, src[yi])
    want = np.clip(np.rint(np.einsum("jm,ijmc->ijc", xw, tmp[:, xi])),
                   0, 255)
    np.testing.assert_array_equal(out[1].astype(np.float64), want)


def test_native_decode_reports_bad_file(tmp_path):
    from rau_vqa_tpu.data.native import decode_image_batch

    bad = str(tmp_path / "not_a.jpg")
    with open(bad, "wb") as f:
        f.write(b"definitely not a jpeg")
    with pytest.raises(OSError):
        decode_image_batch([bad], 32)


def test_native_decode_png_lossless(tmp_path):
    """PNG decodes in-pool (libpng) — byte-exact at target size since PNG
    is lossless; palette/alpha variants convert to RGB."""
    from PIL import Image

    from rau_vqa_tpu.data.native import decode_image_batch

    rs = np.random.RandomState(2)
    img = rs.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    p = str(tmp_path / "a.png")
    Image.fromarray(img).save(p)
    out = decode_image_batch([p], 64)
    np.testing.assert_array_equal(out[0], img)
    p2 = str(tmp_path / "pal.png")
    Image.fromarray(img).convert("P").save(p2)
    assert decode_image_batch([p2], 64).shape == (1, 64, 64, 3)


def test_image_dir_source_native_backend_and_fallback(tmp_path):
    """backend='native' decodes JPEG+PNG in C++; an unsupported format in
    the batch falls back to PIL PER ITEM — the native-decodable files keep
    their native pixels."""
    from PIL import Image

    from rau_vqa_tpu.data.images import ImageDirSource

    rs = np.random.RandomState(1)
    img = rs.randint(0, 256, (80, 80, 3)).astype(np.uint8)
    Image.fromarray(img).save(str(tmp_path / "a.jpg"), quality=95)
    src = ImageDirSource(str(tmp_path), size=48, backend="native")
    batch = src.get_batch(["a.jpg"])
    assert batch.shape == (1, 48, 48, 3) and batch.dtype == np.uint8

    Image.fromarray(img).save(str(tmp_path / "b.bmp"))   # not in the pool
    batch2 = src.get_batch(["a.jpg", "b.bmp"])           # per-item fallback
    assert batch2.shape == (2, 48, 48, 3)
    # the JPEG's pixels must NOT depend on its batch-mates
    np.testing.assert_array_equal(batch2[0], batch[0])


def _skip_if_toolchain_missing(build):
    """Skip ONLY on a missing sanitizer/library, judged from STDERR (make
    echoes the recipe — which contains '-fsanitize=thread', '-ljpeg' — to
    stdout, so matching combined output would classify EVERY build break
    as a toolchain skip and the TSan tests could never fail)."""
    err = build.stderr.lower()
    for marker in ("cannot find -ltsan", "cannot find -ljpeg",
                   "cannot find -lpng", "libtsan",
                   "unrecognized command-line option",
                   "unsupported option '-fsanitize"):
        if marker in err:
            pytest.skip("toolchain unavailable: " + build.stderr[-200:])


@pytest.mark.slow
def test_ring_pool_tsan_clean(tmp_path):
    """ThreadSanitizer stress harness over the ring + worker pool (the
    race-detection subsystem, SURVEY.md §5): 200 batches over 3 slots with
    depth-3 pipelining plus 3 concurrent sync-gather threads, every byte
    verified, zero TSan reports.  Skips where g++/libtsan is unavailable."""
    import shutil
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    native_dir = os.path.join(repo, "native")
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    build = subprocess.run(["make", "-C", native_dir, "race_test"],
                           capture_output=True, text=True, timeout=300)
    if build.returncode != 0:
        _skip_if_toolchain_missing(build)
        raise AssertionError("race_test build failed:\n" + build.stderr)

    row_bytes, n_rows = 257, 512          # must match race_test.cpp
    arr = ((np.arange(row_bytes)[None, :]
            + 31 * np.arange(n_rows)[:, None]) & 0xFF).astype(np.uint8)
    path = str(tmp_path / "rows.bin")
    arr.tofile(path)
    run = subprocess.run([os.path.join(native_dir, "race_test"), path],
                         capture_output=True, text=True, timeout=600)
    assert run.returncode == 0, (
        f"race_test rc={run.returncode}\n{run.stdout}\n{run.stderr[-3000:]}")
    assert "race_test ok" in run.stdout


@pytest.mark.slow
def test_decode_pool_tsan_clean(tmp_path):
    """TSan harness for the image-decode pool: 8-thread decode of a mixed
    jpg/png/corrupt batch is byte-identical to single-threaded, 5 rounds,
    zero TSan reports."""
    import shutil
    import subprocess

    from PIL import Image

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    native_dir = os.path.join(repo, "native")
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    build = subprocess.run(["make", "-C", native_dir, "decode_race_test"],
                           capture_output=True, text=True, timeout=300)
    if build.returncode != 0:
        _skip_if_toolchain_missing(build)
        raise AssertionError("decode_race_test build failed:\n"
                             + build.stderr)

    rs = np.random.RandomState(0)
    paths = []
    for i in range(16):
        arr = rs.randint(0, 256, (80 + 7 * i, 95 + 5 * i, 3), dtype=np.uint8)
        p = str(tmp_path / f"i{i}.jpg")
        Image.fromarray(arr).save(p, quality=80)
        paths.append(p)
    png = str(tmp_path / "x.png")
    Image.fromarray(rs.randint(0, 256, (50, 60, 3), dtype=np.uint8)).save(png)
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8garbage")
    run = subprocess.run(
        [os.path.join(native_dir, "decode_race_test"), "64"]
        + paths + [png, bad],
        capture_output=True, text=True, timeout=600)
    assert run.returncode == 0, (
        f"rc={run.returncode}\n{run.stdout}\n{run.stderr[-3000:]}")
    assert "decode_race_test ok" in run.stdout
