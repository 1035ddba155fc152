// Native data plane: multi-threaded trial-shard reader with a bounded
// in-memory queue.
//
// The reference's data plane is Python DataLoader workers decoding mp4 tars
// (/root/reference/src/loader/base.py:24,98-102). Here a C++ worker pool
// streams whole tar blobs (trials are ~1-6 MB) from disk into a bounded
// ring of buffers, off the GIL, so the Python side only parses tar headers
// from memory and hands frames to jax.device_put. Exposed via a C ABI for
// ctypes (no pybind11 in this image).
//
// API (see video_spike_tpu/data/native_io.py for the Python wrapper):
//   vst_reader_create(paths, sep, n_workers, capacity) -> handle
//   vst_reader_next_size(handle, &path_idx) -> blob size (0 = end of epoch,
//                                               -1 = unreadable/empty shard)
//   vst_reader_next_copy(handle, dst)       -> copies blob, pops the slot
//   vst_reader_reset(handle, paths, sep)    -> new epoch order
//   vst_reader_destroy(handle)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Blob {
  int path_idx;
  bool ok = false;  // false: the path could not be read (or was empty)
  std::vector<uint8_t> data;
};

struct Reader {
  std::vector<std::string> paths;
  int n_workers;
  size_t capacity;

  std::mutex mu;
  std::condition_variable cv_push;  // workers wait for queue space
  std::condition_variable cv_pop;   // consumer waits for data
  // Ordered delivery: slot i holds the blob for paths[served + i].
  std::deque<Blob> ready;
  std::atomic<size_t> next_to_read{0};
  size_t next_to_deliver = 0;
  std::vector<Blob> pending;        // out-of-order completions
  std::vector<bool> pending_set;
  bool stopping = false;
  std::vector<std::thread> workers;

  explicit Reader(std::vector<std::string> p, int workers_, size_t cap)
      : paths(std::move(p)), n_workers(workers_), capacity(cap) {
    start();
  }

  void start() {
    pending.resize(paths.size());
    pending_set.assign(paths.size(), false);
    next_to_read = 0;
    next_to_deliver = 0;
    stopping = false;
    for (int w = 0; w < n_workers; ++w) {
      workers.emplace_back([this] { work(); });
    }
  }

  void work() {
    for (;;) {
      size_t idx = next_to_read.fetch_add(1);
      if (idx >= paths.size()) return;
      Blob blob;
      blob.path_idx = static_cast<int>(idx);
      std::ifstream f(paths[idx], std::ios::binary | std::ios::ate);
      if (f) {
        std::streamsize size = f.tellg();
        f.seekg(0);
        blob.data.resize(static_cast<size_t>(size));
        f.read(reinterpret_cast<char*>(blob.data.data()), size);
        // a 0-byte "tar" is as unusable as an unreadable one; both must
        // surface as an error, never as the 0 end-of-epoch sentinel
        blob.ok = static_cast<bool>(f) && size > 0;
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [this, idx] {
        return stopping || idx < next_to_deliver + capacity + n_workers;
      });
      if (stopping) return;
      pending[idx] = std::move(blob);
      pending_set[idx] = true;
      // drain in-order completions into the ready queue
      while (next_to_deliver < paths.size() && pending_set[next_to_deliver] &&
             ready.size() < capacity + n_workers) {
        ready.push_back(std::move(pending[next_to_deliver]));
        pending_set[next_to_deliver] = false;
        ++next_to_deliver;
      }
      cv_pop.notify_all();
      cv_push.notify_all();
    }
  }

  // peek size of next blob; 0 when the epoch is exhausted, -1 when the
  // next path failed to read (path_idx still identifies it)
  int64_t next_size(int* path_idx) {
    std::unique_lock<std::mutex> lk(mu);
    cv_pop.wait(lk, [this] {
      return stopping || !ready.empty() ||
             (next_to_deliver >= paths.size() && ready.empty());
    });
    if (ready.empty()) return 0;
    *path_idx = ready.front().path_idx;
    if (!ready.front().ok) return -1;
    return static_cast<int64_t>(ready.front().data.size());
  }

  int next_copy(uint8_t* dst) {
    std::unique_lock<std::mutex> lk(mu);
    if (ready.empty()) return -1;
    Blob blob = std::move(ready.front());
    ready.pop_front();
    // opening the slot may unblock a waiting worker and in-order drain
    while (next_to_deliver < paths.size() && pending_set[next_to_deliver] &&
           ready.size() < capacity + n_workers) {
      ready.push_back(std::move(pending[next_to_deliver]));
      pending_set[next_to_deliver] = false;
      ++next_to_deliver;
    }
    cv_push.notify_all();
    cv_pop.notify_all();
    lk.unlock();
    std::memcpy(dst, blob.data.data(), blob.data.size());
    return 0;
  }

  void stop() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = true;
    }
    cv_push.notify_all();
    cv_pop.notify_all();
    for (auto& t : workers) t.join();
    workers.clear();
  }

  void reset(std::vector<std::string> new_paths) {
    stop();
    {
      std::lock_guard<std::mutex> lk(mu);
      paths = std::move(new_paths);
      ready.clear();
    }
    start();
  }

  ~Reader() { stop(); }
};

std::vector<std::string> split(const char* joined, char sep) {
  std::vector<std::string> out;
  std::string s(joined);
  size_t start = 0;
  while (start <= s.size()) {
    size_t end = s.find(sep, start);
    if (end == std::string::npos) end = s.size();
    if (end > start) out.push_back(s.substr(start, end - start));
    start = end + 1;
  }
  return out;
}

}  // namespace

extern "C" {

void* vst_reader_create(const char* paths_joined, char sep, int n_workers,
                        int capacity) {
  auto paths = split(paths_joined, sep);
  if (paths.empty()) return nullptr;
  return new Reader(std::move(paths), n_workers > 0 ? n_workers : 4,
                    capacity > 0 ? static_cast<size_t>(capacity) : 8);
}

int64_t vst_reader_next_size(void* r, int* path_idx) {
  return static_cast<Reader*>(r)->next_size(path_idx);
}

int vst_reader_next_copy(void* r, uint8_t* dst) {
  return static_cast<Reader*>(r)->next_copy(dst);
}

void vst_reader_reset(void* r, const char* paths_joined, char sep) {
  static_cast<Reader*>(r)->reset(split(paths_joined, sep));
}

void vst_reader_destroy(void* r) { delete static_cast<Reader*>(r); }

}  // extern "C"
