// ThreadSanitizer stress harness for the native image-decode pool
// (id_decode_batch in image_decode.cpp).  Built with -fsanitize=thread
// (make -C native decode_race_test) and run by tests/test_native_loader.py.
//
// Protocol: decode the given image paths twice — single-threaded (the
// oracle) and with an 8-thread pool, repeated a few rounds — and require
// byte-identical outputs and statuses.  Decode is deterministic per
// image, so any divergence means cross-thread interference; TSan
// additionally reports any data race in the counter/status protocol,
// including on the intentionally mixed ok/corrupt inputs.
//
// Usage: decode_race_test <size> <path>...

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
int64_t id_decode_batch(const char** paths, int64_t n, int32_t size,
                        int32_t n_threads, uint8_t* out, uint8_t* status);
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: decode_race_test <size> <path>...\n");
    return 2;
  }
  const int32_t size = std::atoi(argv[1]);
  std::vector<const char*> paths(argv + 2, argv + argc);
  const int64_t n = int64_t(paths.size());
  const size_t img_bytes = size_t(size) * size * 3;

  std::vector<uint8_t> ref(n * img_bytes), out(n * img_bytes);
  std::vector<uint8_t> ref_status(n), out_status(n);
  id_decode_batch(paths.data(), n, size, 1, ref.data(), ref_status.data());

  for (int round = 0; round < 5; ++round) {
    std::memset(out.data(), 0xAA, out.size());
    id_decode_batch(paths.data(), n, size, 8, out.data(), out_status.data());
    if (std::memcmp(ref_status.data(), out_status.data(), n) != 0) {
      std::fprintf(stderr, "status diverged on round %d\n", round);
      return 1;
    }
    for (int64_t i = 0; i < n; ++i) {
      if (!ref_status[i]) continue;   // failed decodes leave out undefined
      if (std::memcmp(ref.data() + i * img_bytes, out.data() + i * img_bytes,
                      img_bytes) != 0) {
        std::fprintf(stderr, "image %lld diverged on round %d\n",
                     (long long)i, round);
        return 1;
      }
    }
  }
  int64_t ok = 0;
  for (int64_t i = 0; i < n; ++i) ok += ref_status[i];
  std::printf("decode_race_test ok: %lld images (%lld decodable) x 5 "
              "rounds, pool == single-thread\n",
              (long long)n, (long long)ok);
  return 0;
}
