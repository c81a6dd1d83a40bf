// specenh native runtime: mmap'd shot reader + threaded prefetcher.
//
// The reference's data stage is a serial Python loop doing pickle.load per
// channel access (spec_denoising/pipeline_data.py:29, SURVEY.md 3.1) — the
// host is idle while the device computes and vice versa.  This library
// provides the campaign hot path natively:
//
//   * flat binary shot format (written by specenh.io.binfmt):
//       magic 'SPEC' | uint32 version | uint32 n_channels | uint64 n_samples
//       | float32 data[n_channels][n_samples]
//   * zero-copy mmap reads of channel slices;
//   * a multi-threaded prefetcher that decodes shots into a bounded queue of
//     pre-allocated float32 buffers, overlapping disk IO with TPU compute.
//
// C API only (ctypes-friendly); no Python.h dependency.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x43455053;  // 'SPEC' little-endian

struct Header {
  uint32_t magic;
  uint32_t version;
  uint32_t n_channels;
  uint32_t reserved;
  uint64_t n_samples;
};

struct MappedShot {
  int fd = -1;
  void* base = nullptr;
  size_t size = 0;
  const Header* header = nullptr;
  const float* data = nullptr;

  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < sizeof(Header)) {
      ::close(fd);
      fd = -1;
      return false;
    }
    size = st.st_size;
    base = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (base == MAP_FAILED) {
      ::close(fd);
      fd = -1;
      base = nullptr;
      return false;
    }
    header = static_cast<const Header*>(base);
    if (header->magic != kMagic || header->version != 1) {
      close();
      return false;
    }
    const size_t need = sizeof(Header) + static_cast<size_t>(header->n_channels) *
                                             header->n_samples * sizeof(float);
    if (size < need) {
      close();
      return false;
    }
    data = reinterpret_cast<const float*>(static_cast<const char*>(base) +
                                          sizeof(Header));
    return true;
  }

  void close() {
    if (base) munmap(base, size);
    if (fd >= 0) ::close(fd);
    base = nullptr;
    fd = -1;
    header = nullptr;
    data = nullptr;
  }

  ~MappedShot() { close(); }
};

struct ShotBuffer {
  int64_t shot_index = -1;  // -1 => end of stream
  int32_t status = 0;       // 0 ok, nonzero errno-style failure
  std::vector<float> data;  // n_channels * n_samples, channel-major
};

class Prefetcher {
 public:
  Prefetcher(std::vector<std::string> paths, uint32_t n_channels,
             uint64_t n_samples, int n_threads, int queue_depth)
      : paths_(std::move(paths)),
        n_channels_(n_channels),
        n_samples_(n_samples),
        queue_depth_(queue_depth < 1 ? 1 : queue_depth),
        next_path_(0) {
    if (n_threads < 1) n_threads = 1;
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] { WorkerLoop(); });
    }
  }

  ~Prefetcher() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_space_.notify_all();
    cv_data_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Blocking: fills out[n_channels * n_samples]; returns the shot index
  // (>= 0) with *status == 0 on success or *status > 0 on failure (the
  // shot is skipped but its INDEX is still reported so callers can
  // quarantine the right file), and -1 at end of stream.  Results arrive
  // in COMPLETION order (whichever worker finishes first) — callers must
  // key on the returned index, never on arrival position.
  int64_t Next(float* out, int64_t* status) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_data_.wait(lk, [this] {
      return !queue_.empty() || (done_workers_ == (int)workers_.size() && queue_.empty());
    });
    *status = 0;
    if (queue_.empty()) return -1;
    ShotBuffer buf = std::move(queue_.front());
    queue_.pop_front();
    lk.unlock();
    cv_space_.notify_one();
    *status = static_cast<int64_t>(buf.status);
    if (buf.status != 0) return buf.shot_index;
    std::memcpy(out, buf.data.data(), buf.data.size() * sizeof(float));
    return buf.shot_index;
  }

 private:
  void WorkerLoop() {
    for (;;) {
      size_t idx;
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (stop_ || next_path_ >= paths_.size()) break;
        idx = next_path_++;
      }
      ShotBuffer buf;
      buf.shot_index = static_cast<int64_t>(idx);
      buf.data.resize(static_cast<size_t>(n_channels_) * n_samples_);
      MappedShot shot;
      if (!shot.open(paths_[idx].c_str())) {
        buf.status = 1;
      } else {
        const uint64_t copy_samples =
            shot.header->n_samples < n_samples_ ? shot.header->n_samples : n_samples_;
        const uint32_t copy_channels =
            shot.header->n_channels < n_channels_ ? shot.header->n_channels
                                                  : n_channels_;
        std::fill(buf.data.begin(), buf.data.end(), 0.0f);
        for (uint32_t c = 0; c < copy_channels; ++c) {
          std::memcpy(buf.data.data() + static_cast<size_t>(c) * n_samples_,
                      shot.data + static_cast<size_t>(c) * shot.header->n_samples,
                      copy_samples * sizeof(float));
        }
      }
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_space_.wait(lk, [this] {
          return stop_ || queue_.size() < static_cast<size_t>(queue_depth_);
        });
        if (stop_) break;
        queue_.push_back(std::move(buf));
      }
      cv_data_.notify_one();
    }
    {
      std::lock_guard<std::mutex> lk(mu_);
      ++done_workers_;
    }
    cv_data_.notify_all();
  }

  std::vector<std::string> paths_;
  uint32_t n_channels_;
  uint64_t n_samples_;
  int queue_depth_;
  size_t next_path_;
  std::mutex mu_;
  std::condition_variable cv_data_, cv_space_;
  std::deque<ShotBuffer> queue_;
  std::vector<std::thread> workers_;
  bool stop_ = false;
  int done_workers_ = 0;
};

}  // namespace

extern "C" {

// --- simple one-shot reader -------------------------------------------------

// Reads up to n_channels x n_samples float32 from a SPEC binary shot into
// `out` (channel-major, zero-padded).  Returns 0 on success.
int specenh_read_shot(const char* path, uint32_t n_channels, uint64_t n_samples,
                      float* out) {
  MappedShot shot;
  if (!shot.open(path)) return 1;
  const uint64_t cs = shot.header->n_samples < n_samples ? shot.header->n_samples
                                                         : n_samples;
  const uint32_t cc =
      shot.header->n_channels < n_channels ? shot.header->n_channels : n_channels;
  std::memset(out, 0, sizeof(float) * n_channels * n_samples);
  for (uint32_t c = 0; c < cc; ++c) {
    std::memcpy(out + static_cast<size_t>(c) * n_samples,
                shot.data + static_cast<size_t>(c) * shot.header->n_samples,
                cs * sizeof(float));
  }
  return 0;
}

// Returns n_channels<<32 | (n_samples truncated) ... kept simple: fills the
// two out params.  Returns 0 on success.
int specenh_shot_info(const char* path, uint32_t* n_channels, uint64_t* n_samples) {
  MappedShot shot;
  if (!shot.open(path)) return 1;
  *n_channels = shot.header->n_channels;
  *n_samples = shot.header->n_samples;
  return 0;
}

// --- prefetcher --------------------------------------------------------------

void* specenh_prefetcher_create(const char** paths, int n_paths,
                                uint32_t n_channels, uint64_t n_samples,
                                int n_threads, int queue_depth) {
  std::vector<std::string> ps(paths, paths + n_paths);
  return new Prefetcher(std::move(ps), n_channels, n_samples, n_threads,
                        queue_depth);
}

int64_t specenh_prefetcher_next(void* handle, float* out, int64_t* status) {
  return static_cast<Prefetcher*>(handle)->Next(out, status);
}

// Bumped on every breaking change to the C ABI above; the Python loader
// refuses libraries whose version does not match (a stale .so with the
// wrong prefetcher_next signature would silently misreport failures).
int64_t specenh_abi_version() { return 2; }

void specenh_prefetcher_destroy(void* handle) {
  delete static_cast<Prefetcher*>(handle);
}

}  // extern "C"
