// svio: double-buffered multi-file shard reader for the activation cache.
//
// The framework's production SAE-training path streams multi-GB activation shards
// from disk (data/activation_cache.py). This native reader keeps N read-ahead
// buffers filled by a background thread doing plain pread() loops, so file IO —
// including page-cache misses — overlaps device compute without Python-thread/GIL
// involvement. Exposed as a C API consumed via ctypes (data/native_io.py); the
// reference framework has no native tier at all (SURVEY.md §2) — this is framework
// infrastructure, not a port.
//
// Protocol per file: read `nbytes` starting at `offset` (lets the Python side skip
// .npy headers and hand out zero-copy numpy views of the raw payload).

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <string>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Slot {
  std::vector<char> buf;
  long size = 0;
  int file_index = -1;
  bool ready = false;
};

struct Reader {
  std::vector<std::string> paths;
  std::vector<long> offsets;
  std::vector<long> nbytes;
  std::vector<Slot> slots;
  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  std::thread worker;
  std::atomic<bool> stop{false};
  int next_fill = 0;    // next file index the worker reads
  int next_consume = 0; // next file index the consumer expects
  int consume_slot = 0;
  int fill_slot = 0;
  std::string error;

  void run() {
    while (!stop.load()) {
      int fi;
      int si;
      {
        std::unique_lock<std::mutex> lk(mu);
        if (next_fill >= (int)paths.size()) return;
        cv_free.wait(lk, [&] { return stop.load() || !slots[fill_slot].ready; });
        if (stop.load()) return;
        fi = next_fill++;
        si = fill_slot;
        fill_slot = (fill_slot + 1) % (int)slots.size();
      }
      Slot &s = slots[si];
      long want = nbytes[fi];
      if ((long)s.buf.size() < want) s.buf.resize(want);
      int fd = ::open(paths[fi].c_str(), O_RDONLY);
      long got = 0;
      if (fd >= 0) {
        while (got < want) {
          ssize_t r = ::pread(fd, s.buf.data() + got, want - got, offsets[fi] + got);
          if (r <= 0) break;
          got += r;
        }
        ::close(fd);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        if (got != want) {
          error = "short read or open failure: " + paths[fi];
          stop.store(true);
          cv_ready.notify_all();
          return;
        }
        s.size = got;
        s.file_index = fi;
        s.ready = true;
        cv_ready.notify_all();
      }
    }
  }
};

} // namespace

extern "C" {

void *sv_reader_create(const char **paths, const long *offsets, const long *nbytes,
                       int n_files, int n_buffers) {
  auto *r = new Reader();
  for (int i = 0; i < n_files; ++i) {
    r->paths.emplace_back(paths[i]);
    r->offsets.push_back(offsets[i]);
    r->nbytes.push_back(nbytes[i]);
  }
  if (n_buffers < 2) n_buffers = 2;
  r->slots.resize(n_buffers);
  r->worker = std::thread([r] { r->run(); });
  return r;
}

// Blocks until the next file's payload is buffered; returns the pointer (valid until
// sv_reader_release) and its size, or nullptr at end-of-stream / error.
const char *sv_reader_next(void *handle, long *size) {
  auto *r = static_cast<Reader *>(handle);
  std::unique_lock<std::mutex> lk(r->mu);
  if (r->next_consume >= (int)r->paths.size()) return nullptr;
  Slot &s = r->slots[r->consume_slot];
  r->cv_ready.wait(lk, [&] { return s.ready || r->stop.load(); });
  if (!s.ready) return nullptr; // worker errored out
  *size = s.size;
  return s.buf.data();
}

// Marks the current buffer free for refill and advances to the next file.
void sv_reader_release(void *handle) {
  auto *r = static_cast<Reader *>(handle);
  std::lock_guard<std::mutex> lk(r->mu);
  Slot &s = r->slots[r->consume_slot];
  s.ready = false;
  s.file_index = -1;
  r->next_consume++;
  r->consume_slot = (r->consume_slot + 1) % (int)r->slots.size();
  r->cv_free.notify_all();
}

const char *sv_reader_error(void *handle) {
  auto *r = static_cast<Reader *>(handle);
  std::lock_guard<std::mutex> lk(r->mu);
  return r->error.empty() ? nullptr : r->error.c_str();
}

void sv_reader_destroy(void *handle) {
  auto *r = static_cast<Reader *>(handle);
  r->stop.store(true);
  r->cv_free.notify_all();
  r->cv_ready.notify_all();
  if (r->worker.joinable()) r->worker.join();
  delete r;
}

} // extern "C"
