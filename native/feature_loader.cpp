// Native data-loader core: mmap-backed packed-feature gather with a
// multi-threaded prefetch ring.
//
// Plays the role the reference delegates to native Torch packages — the
// torch-threads prefetch worker + torch-hdf5/.t7 deserialization
// (utils/vqa_prepro_loader.lua:66-80, 931-958) — re-designed for the packed
// shard layout: one gather is N row-memcpys from the OS page cache into a
// ring slot, parallelized across a worker pool, overlapped with device
// compute by depth-K prefetch.
//
// C ABI (ctypes-friendly):
//   fl_open(path, data_offset, row_bytes, n_rows)        -> loader*
//   fl_close(loader*)
//   fl_gather(loader*, rows*, n, out*)                   -- synchronous,
//                                                           pool-parallel
//   fl_ring_create(loader*, batch_rows, n_slots, threads) -> ring*
//   fl_ring_submit(ring*, seq, rows*, n_rows)            -- async fill
//   fl_ring_wait(ring*, seq)                             -> slot data ptr
//   fl_ring_destroy(ring*)
//
// Build: make -C native   (produces libfeature_loader.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fcntl.h>
#include <mutex>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Loader {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t file_size = 0;
  size_t data_offset = 0;
  uint64_t row_bytes = 0;
  uint64_t n_rows = 0;

  const uint8_t* row(uint64_t r) const {
    return base + data_offset + r * row_bytes;
  }
};

// ------------------------- worker pool ------------------------------------

struct CopyTask {
  const Loader* loader;
  const int64_t* rows;   // row indices
  uint64_t begin, end;   // row range within the batch
  uint8_t* out;          // batch output base
  std::atomic<uint64_t>* remaining;  // per-batch completion counter
  std::condition_variable* done_cv;
  std::mutex* done_mu;
};

class Pool {
 public:
  explicit Pool(int n_threads) : stop_(false) {
    for (int i = 0; i < n_threads; ++i)
      threads_.emplace_back([this] { Run(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }
  void Submit(CopyTask task) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      queue_.push_back(task);
    }
    cv_.notify_one();
  }

 private:
  void Run() {
    for (;;) {
      CopyTask task;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        task = queue_.front();
        queue_.pop_front();
      }
      const uint64_t rb = task.loader->row_bytes;
      for (uint64_t i = task.begin; i < task.end; ++i) {
        std::memcpy(task.out + i * rb, task.loader->row(task.rows[i]), rb);
      }
      if (task.remaining->fetch_sub(task.end - task.begin) ==
          task.end - task.begin) {
        std::lock_guard<std::mutex> lk(*task.done_mu);
        task.done_cv->notify_all();
      }
    }
  }

  std::mutex mu_;
  std::condition_variable cv_;
  std::deque<CopyTask> queue_;
  bool stop_;
  std::vector<std::thread> threads_;
};

// ------------------------- prefetch ring ----------------------------------

struct Slot {
  std::vector<uint8_t> data;
  std::vector<int64_t> rows;
  std::atomic<uint64_t> remaining{0};
  int64_t seq = -1;           // which batch currently occupies the slot
  std::mutex mu;
  std::condition_variable cv;
};

struct Ring {
  Loader* loader = nullptr;
  uint64_t batch_rows = 0;
  uint64_t n_slots = 0;
  std::vector<Slot> slots;
  Pool* pool = nullptr;
  uint64_t chunk = 0;         // rows per copy task
};

}  // namespace

extern "C" {

void* fl_open(const char* path, uint64_t data_offset, uint64_t row_bytes,
              uint64_t n_rows) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = ::mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  ::madvise(base, st.st_size, MADV_WILLNEED);
  auto* L = new Loader;
  L->fd = fd;
  L->base = static_cast<const uint8_t*>(base);
  L->file_size = st.st_size;
  L->data_offset = data_offset;
  L->row_bytes = row_bytes;
  L->n_rows = n_rows;
  return L;
}

void fl_close(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  if (!L) return;
  ::munmap(const_cast<uint8_t*>(L->base), L->file_size);
  ::close(L->fd);
  delete L;
}

// synchronous gather into caller-owned memory (single-threaded fast path;
// the ring is the parallel path)
void fl_gather(void* handle, const int64_t* rows, uint64_t n, uint8_t* out) {
  auto* L = static_cast<Loader*>(handle);
  for (uint64_t i = 0; i < n; ++i)
    std::memcpy(out + i * L->row_bytes, L->row(rows[i]), L->row_bytes);
}

void* fl_ring_create(void* handle, uint64_t batch_rows, uint64_t n_slots,
                     int n_threads) {
  auto* L = static_cast<Loader*>(handle);
  auto* R = new Ring;
  R->loader = L;
  R->batch_rows = batch_rows;
  R->n_slots = n_slots;
  R->slots = std::vector<Slot>(n_slots);
  for (auto& s : R->slots) {
    s.data.resize(batch_rows * L->row_bytes);
    s.rows.resize(batch_rows);
  }
  if (n_threads < 1) n_threads = 1;
  R->pool = new Pool(n_threads);
  R->chunk = (batch_rows + n_threads - 1) / n_threads;
  if (R->chunk == 0) R->chunk = 1;
  return R;
}

void fl_ring_submit(void* ring, int64_t seq, const int64_t* rows,
                    uint64_t n_rows) {
  auto* R = static_cast<Ring*>(ring);
  Slot& s = R->slots[seq % R->n_slots];
  {
    std::unique_lock<std::mutex> lk(s.mu);
    // publish seq AND arm remaining inside ONE critical section: a waiter
    // waking between `s.seq = seq` and the remaining store would see the
    // drained previous batch's remaining==0 and return stale slot data
    s.seq = seq;
    std::memcpy(s.rows.data(), rows, n_rows * sizeof(int64_t));
    s.remaining.store(n_rows);
  }
  for (uint64_t b = 0; b < n_rows; b += R->chunk) {
    CopyTask t;
    t.loader = R->loader;
    t.rows = s.rows.data();
    t.begin = b;
    t.end = std::min(n_rows, b + R->chunk);
    t.out = s.data.data();
    t.remaining = &s.remaining;
    t.done_cv = &s.cv;
    t.done_mu = &s.mu;
    R->pool->Submit(t);
  }
}

const uint8_t* fl_ring_wait(void* ring, int64_t seq) {
  auto* R = static_cast<Ring*>(ring);
  Slot& s = R->slots[seq % R->n_slots];
  std::unique_lock<std::mutex> lk(s.mu);
  s.cv.wait(lk, [&] { return s.seq == seq && s.remaining.load() == 0; });
  return s.data.data();
}

void fl_ring_destroy(void* ring) {
  auto* R = static_cast<Ring*>(ring);
  if (!R) return;
  delete R->pool;
  delete R;
}

}  // extern "C"
