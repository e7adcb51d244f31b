// Native image-decode core: JPEG decode (libjpeg) + fused Catmull-Rom
// shorter-side resize + center crop into a uint8 batch canvas — the role
// torch-image (C) plays in the reference's from-image path
// (utils/vqa_prepro_loader.lua:1045-1068), parallelized across a thread
// pool per batch.  The sampling kernel deliberately matches the on-device
// transforms (rau_vqa_tpu/ops/transforms._cubic_sample): cubic convolution
// a = -0.5 (the kernel torch image.scale 'bicubic' evaluates), half-pixel
// source grid, edge-clamped taps — so host-decoded and device-resized
// pixels share one semantics.
//
// C ABI (ctypes-friendly):
//   id_decode_batch(paths, n, size, n_threads, out, status) -> 0 on
//     success, or the 1-based index of the first image that failed.
//     paths:  array of n NUL-terminated file paths (JPEG or PNG).
//     out:    n * size * size * 3 bytes, RGB row-major.
//     status: optional (nullable) n bytes — per-item 1=decoded 0=failed;
//             successes keep their pixels in `out` even when others fail,
//             so callers re-decode ONLY the failures.
//
// Build: make -C native   (produces libimage_decode.so, links -ljpeg)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);  // libjpeg's default handler would exit()
}

// Catmull-Rom (cubic convolution a = -0.5) weights for taps at offsets
// -1, 0, 1, 2 around fractional position t.
inline void cr_weights(float t, float w[4]) {
  const float t2 = t * t, t3 = t2 * t;
  w[0] = 0.5f * (-t + 2.f * t2 - t3);
  w[1] = 0.5f * (2.f - 5.f * t2 + 3.f * t3);
  w[2] = 0.5f * (t + 4.f * t2 - 3.f * t3);
  w[3] = 0.5f * (-t2 + t3);
}

struct Taps {
  std::vector<int> idx;      // 4 per output position, edge-clamped
  std::vector<float> w;      // 4 per output position
};

// Output position i samples source at (origin + i + 0.5) * scale - 0.5,
// where origin is the integer center-crop offset in the virtual resized
// image and scale = src / resized.
Taps make_taps(int out_size, int origin, double scale, int src_size) {
  Taps t;
  t.idx.resize(out_size * 4);
  t.w.resize(out_size * 4);
  for (int i = 0; i < out_size; ++i) {
    double pos = (origin + i + 0.5) * scale - 0.5;
    pos = std::min(std::max(pos, 0.0), double(src_size - 1));
    const int base = int(std::floor(pos));
    float w[4];
    cr_weights(float(pos - base), w);
    for (int k = 0; k < 4; ++k) {
      t.idx[i * 4 + k] =
          std::min(std::max(base + k - 1, 0), src_size - 1);
      t.w[i * 4 + k] = w[k];
    }
  }
  return t;
}

bool decode_jpeg(const char* path, std::vector<uint8_t>& pixels,
                 int& w, int& h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  // grayscale -> RGB in-decoder.  CMYK/YCCK sources are NOT convertible
  // by libjpeg (start_decompress ERREXITs) -> status=0; callers fall back
  // to the PIL decoder for those images
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  pixels.resize(size_t(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels.data() + size_t(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return w > 0 && h > 0;
}

bool decode_png_file(const char* path, std::vector<uint8_t>& pixels,
                     int& w, int& h) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return false;
  image.format = PNG_FORMAT_RGB;     // palette/alpha/gray -> RGB
  w = int(image.width);
  h = int(image.height);
  pixels.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, pixels.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return w > 0 && h > 0;
}

bool decode_one(const char* path, int size, uint8_t* out) {
  // format sniff by magic bytes: JPEG FF D8, PNG 89 'P' 'N' 'G'
  uint8_t magic[4] = {0, 0, 0, 0};
  if (FILE* f = std::fopen(path, "rb")) {
    size_t got = std::fread(magic, 1, 4, f);
    std::fclose(f);
    if (got < 2) return false;
  } else {
    return false;
  }
  std::vector<uint8_t> pixels;
  int w = 0, h = 0;
  bool ok = false;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(path, pixels, w, h);
  } else if (magic[0] == 0x89 && magic[1] == 'P' && magic[2] == 'N'
             && magic[3] == 'G') {
    ok = decode_png_file(path, pixels, w, h);
  }
  if (!ok) return false;

  // shorter-side resize target (matches data/images.decode_scale_center_crop:
  // scale = size/min(w,h); new = max(size, round(dim * scale)))
  // half-to-even rounding, matching Python round() in
  // data/images.decode_scale_center_crop (lround would disagree on
  // exact-.5 products and shift the virtual dims by one)
  const double scale = double(size) / std::min(w, h);
  const int new_w = std::max(size, int(std::nearbyint(w * scale)));
  const int new_h = std::max(size, int(std::nearbyint(h * scale)));
  // ceil origin, like the reference CenterCrop (transforms.lua:56-57)
  const int x0 = (new_w - size + 1) / 2;
  const int y0 = (new_h - size + 1) / 2;
  const Taps ty = make_taps(size, y0, double(h) / new_h, h);
  const Taps tx = make_taps(size, x0, double(w) / new_w, w);

  // separable resample with a lazy horizontal-pass cache: adjacent output
  // rows share up to 3 of their 4 vertical-tap source rows, so each source
  // row is horizontally resampled ONCE (vs 4x redundant work)
  std::vector<std::vector<float>> hcache(h);
  auto hrow = [&](int sr) -> const std::vector<float>& {
    std::vector<float>& band = hcache[sr];
    if (band.empty()) {
      band.resize(size_t(size) * 3);
      const uint8_t* src_row = pixels.data() + size_t(sr) * w * 3;
      for (int j = 0; j < size; ++j) {
        float r = 0.f, g = 0.f, b = 0.f;
        for (int m = 0; m < 4; ++m) {
          const uint8_t* p = src_row + size_t(tx.idx[j * 4 + m]) * 3;
          const float wx = tx.w[j * 4 + m];
          r += wx * p[0];
          g += wx * p[1];
          b += wx * p[2];
        }
        band[size_t(j) * 3 + 0] = r;
        band[size_t(j) * 3 + 1] = g;
        band[size_t(j) * 3 + 2] = b;
      }
    }
    return band;
  };
  std::vector<float> acc(size_t(size) * 3);
  for (int i = 0; i < size; ++i) {
    std::fill(acc.begin(), acc.end(), 0.f);
    for (int k = 0; k < 4; ++k) {
      const std::vector<float>& band = hrow(ty.idx[i * 4 + k]);
      const float wy = ty.w[i * 4 + k];
      for (int j = 0; j < size * 3; ++j) acc[j] += wy * band[j];
    }
    uint8_t* dst = out + size_t(i) * size * 3;
    for (int j = 0; j < size * 3; ++j) {
      // half-to-even, like np.rint in the pinned byte-exact oracle
      dst[j] = uint8_t(std::min(std::max(int(std::nearbyint(acc[j])), 0),
                                255));
    }
  }
  return true;
}

}  // namespace

extern "C" {

int64_t id_decode_batch(const char** paths, int64_t n, int32_t size,
                        int32_t n_threads, uint8_t* out, uint8_t* status) {
  std::atomic<int64_t> failed{0};   // first 1-based failing index, 0 = ok
  const int threads =
      std::max(1, std::min<int>(n_threads, int(std::min<int64_t>(n, 64))));
  const size_t img_bytes = size_t(size) * size * 3;
  std::atomic<int64_t> next{0};
  auto work = [&] {
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) return;
      bool ok = false;
      try {
        ok = decode_one(paths[i], size, out + size_t(i) * img_bytes);
      } catch (...) {
        // e.g. std::bad_alloc from a corrupt header claiming huge dims:
        // an uncaught throw in this thread would std::terminate the whole
        // process; the contract is status[i]=0 and the batch continues
        ok = false;
      }
      if (status) status[i] = ok ? 1 : 0;
      if (!ok) {
        int64_t expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
      }
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(threads - 1);
  for (int t = 1; t < threads; ++t) pool.emplace_back(work);
  work();
  for (auto& th : pool) th.join();
  return failed.load();
}

}  // extern "C"
