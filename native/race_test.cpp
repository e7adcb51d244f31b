// ThreadSanitizer stress harness for the native data-loader concurrency
// (the prefetch ring + worker pool in feature_loader.cpp) — the "race
// detection" auxiliary subsystem (SURVEY.md §5).  Built with
// -fsanitize=thread and run by tests/test_native_loader.py (slow mark);
// a data race inside the pool/ring turns into a nonzero exit here
// instead of a silent corruption under load.
//
// Exercises the documented client contract:
//   - depth-K pipelined submits (K == n_slots), waits in order, verifies
//     every gathered byte against the ground-truth row pattern
//   - slot reuse across many generations (n_batches >> n_slots)
//   - concurrent synchronous fl_gather calls from several threads while
//     the ring is busy (the Trainer's sync path and the ring share the
//     mmap but not the pool)
//
// Usage: race_test <packed_file>   (file laid out as n_rows rows of
// row_bytes, each row filled with pattern byte (row * 31 + j) & 0xff)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void* fl_open(const char* path, uint64_t data_offset, uint64_t row_bytes,
              uint64_t n_rows);
void fl_close(void* handle);
void fl_gather(void* handle, const int64_t* rows, uint64_t n, uint8_t* out);
void* fl_ring_create(void* handle, uint64_t batch_rows, uint64_t n_slots,
                     int n_threads);
void fl_ring_submit(void* ring, int64_t seq, const int64_t* rows,
                    uint64_t n_rows);
const uint8_t* fl_ring_wait(void* ring, int64_t seq);
void fl_ring_destroy(void* ring);
}

namespace {

constexpr uint64_t kRowBytes = 257;   // odd on purpose: no tidy alignment
constexpr uint64_t kNRows = 512;
constexpr uint64_t kBatchRows = 96;
constexpr uint64_t kNSlots = 3;
constexpr int64_t kNBatches = 200;    // >> kNSlots: many reuse generations

uint8_t expected(uint64_t row, uint64_t j) {
  return uint8_t((row * 31 + j) & 0xff);
}

uint64_t rng_next(uint64_t* s) {      // xorshift64: deterministic rows
  *s ^= *s << 13;
  *s ^= *s >> 7;
  *s ^= *s << 17;
  return *s;
}

int verify_batch(const uint8_t* data, const std::vector<int64_t>& rows) {
  for (uint64_t i = 0; i < rows.size(); ++i)
    for (uint64_t j = 0; j < kRowBytes; ++j)
      if (data[i * kRowBytes + j] != expected(uint64_t(rows[i]), j)) {
        std::fprintf(stderr, "MISMATCH batch row %llu byte %llu\n",
                     (unsigned long long)i, (unsigned long long)j);
        return 1;
      }
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 2) {
    std::fprintf(stderr, "usage: race_test <packed_file>\n");
    return 2;
  }
  void* L = fl_open(argv[1], 0, kRowBytes, kNRows);
  if (!L) {
    std::fprintf(stderr, "fl_open failed\n");
    return 2;
  }

  // background contention: the synchronous gather path hammering the same
  // mmap from 3 threads while the ring pipelines
  std::vector<std::thread> gatherers;
  std::atomic<int> gather_bad{0};  // written by all 3 gatherer threads
  for (int t = 0; t < 3; ++t) {
    gatherers.emplace_back([&, t] {
      uint64_t s = 0x9e3779b9u + t;
      std::vector<int64_t> rows(kBatchRows);
      std::vector<uint8_t> out(kBatchRows * kRowBytes);
      for (int it = 0; it < 50; ++it) {
        for (auto& r : rows) r = int64_t(rng_next(&s) % kNRows);
        fl_gather(L, rows.data(), rows.size(), out.data());
        if (verify_batch(out.data(), rows)) gather_bad.store(1);
      }
    });
  }

  void* R = fl_ring_create(L, kBatchRows, kNSlots, 4);
  uint64_t s = 0xdeadbeefULL;
  std::vector<std::vector<int64_t>> pending(kNSlots);

  int bad = 0;
  int64_t seq = 0;
  // prime the pipeline to full depth, then steady-state wait+verify+resubmit
  for (; seq < int64_t(kNSlots); ++seq) {
    auto& rows = pending[seq % kNSlots];
    rows.resize(kBatchRows);
    for (auto& r : rows) r = int64_t(rng_next(&s) % kNRows);
    fl_ring_submit(R, seq, rows.data(), rows.size());
  }
  for (int64_t done = 0; done < kNBatches; ++done) {
    const uint8_t* data = fl_ring_wait(R, done);
    bad |= verify_batch(data, pending[done % kNSlots]);
    if (seq < kNBatches) {  // reuse the slot we just drained
      auto& rows = pending[seq % kNSlots];
      for (auto& r : rows) r = int64_t(rng_next(&s) % kNRows);
      fl_ring_submit(R, seq, rows.data(), rows.size());
      ++seq;
    }
  }

  for (auto& t : gatherers) t.join();
  fl_ring_destroy(R);
  fl_close(L);
  if (bad || gather_bad) return 1;
  std::printf("race_test ok: %lld batches over %llu slots + 3 gather "
              "threads\n",
              (long long)kNBatches, (unsigned long long)kNSlots);
  return 0;
}
