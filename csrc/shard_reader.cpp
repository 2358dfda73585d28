// Native token-shard reader: mmap + madvise readahead + background prefetch.
//
// TPU-native counterpart of the reference's C++ data machinery (torch
// DataLoader pinned-memory worker pool, gpt2_linear/train.py:90-93; numpy
// shard loads, train_gpt2.py:149-152). The Python loader (data/fineweb.py)
// uses this through ctypes when built (make -C csrc), falling back to
// numpy mmap otherwise.
//
// Responsibilities:
//   * parse .npy headers (v1/v2, little-endian u2/i4/u4/i8) without Python;
//   * expose zero-copy-ish strided window reads into caller buffers;
//   * asynchronous prefetch of the NEXT window / next shard on a
//     background thread (touch pages + madvise(WILLNEED)) so shard
//     switches never stall the training loop.
//
// Build: g++ -O3 -shared -fPIC -o libshardreader.so shard_reader.cpp -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <queue>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct NpyInfo {
  size_t data_offset = 0;
  size_t elem_size = 0;
  char kind = 0;  // 'u' or 'i'
  size_t count = 0;
};

// Minimal .npy header parser (format spec v1.0/2.0, C-order, 1-D or N-D).
bool parse_npy_header(const unsigned char* buf, size_t len, NpyInfo* out) {
  if (len < 10 || memcmp(buf, "\x93NUMPY", 6) != 0) return false;
  int major = buf[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = buf[8] | (buf[9] << 8);
    header_off = 10;
  } else {
    header_len = buf[8] | (buf[9] << 8) | (buf[10] << 16) |
                 ((size_t)buf[11] << 24);
    header_off = 12;
  }
  if (header_off + header_len > len) return false;
  std::string h(reinterpret_cast<const char*>(buf + header_off), header_len);

  auto find_val = [&](const std::string& key) -> std::string {
    size_t p = h.find(key);
    if (p == std::string::npos) return "";
    p = h.find(':', p);
    size_t q = p + 1;
    while (q < h.size() && (h[q] == ' ')) q++;
    size_t e = q;
    int depth = 0;
    while (e < h.size()) {
      char c = h[e];
      if (c == '(' || c == '[') depth++;
      if (c == ')' || c == ']') depth--;
      if ((c == ',' || c == '}') && depth <= 0) break;
      e++;
    }
    return h.substr(q, e - q);
  };

  std::string descr = find_val("'descr'");
  std::string shape = find_val("'shape'");
  if (descr.empty() || shape.empty()) return false;
  // descr like '<u2', '<i4', '|u1'
  size_t dpos = descr.find_first_of("ui");
  if (dpos == std::string::npos) return false;
  out->kind = descr[dpos];
  out->elem_size = static_cast<size_t>(descr[dpos + 1] - '0');
  // shape "(N,)" or "(N, M)"
  size_t total = 1;
  size_t pos = 0;
  while (pos < shape.size()) {
    while (pos < shape.size() && !isdigit(shape[pos])) pos++;
    if (pos >= shape.size()) break;
    size_t end = pos;
    while (end < shape.size() && isdigit(shape[end])) end++;
    total *= std::stoull(shape.substr(pos, end - pos));
    pos = end;
  }
  out->count = total;
  out->data_offset = header_off + header_len;
  return true;
}

struct Shard {
  int fd = -1;
  unsigned char* map = nullptr;
  size_t file_size = 0;
  NpyInfo info;
};

struct PrefetchTask {
  const unsigned char* addr;
  size_t bytes;
};

class Prefetcher {
 public:
  Prefetcher() : stop_(false), worker_([this] { run(); }) {}
  ~Prefetcher() {
    {
      std::lock_guard<std::mutex> g(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    worker_.join();
  }
  void submit(const unsigned char* addr, size_t bytes) {
    {
      std::lock_guard<std::mutex> g(mu_);
      q_.push({addr, bytes});
    }
    cv_.notify_one();
  }

 private:
  void run() {
    for (;;) {
      PrefetchTask t;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        t = q_.front();
        q_.pop();
      }
      // page-align and let the kernel readahead asynchronously; touching
      // pages manually risks faulting past the mapping's final page
      size_t page = static_cast<size_t>(sysconf(_SC_PAGESIZE));
      uintptr_t start = reinterpret_cast<uintptr_t>(t.addr) & ~(page - 1);
      size_t span = t.bytes + (reinterpret_cast<uintptr_t>(t.addr) - start);
      madvise(reinterpret_cast<void*>(start), span, MADV_WILLNEED);
    }
  }

  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<PrefetchTask> q_;
  bool stop_;
  std::thread worker_;
};

Prefetcher* g_prefetcher = nullptr;
std::mutex g_init_mu;

Prefetcher* prefetcher() {
  std::lock_guard<std::mutex> g(g_init_mu);
  if (!g_prefetcher) g_prefetcher = new Prefetcher();
  return g_prefetcher;
}

}  // namespace

extern "C" {

void* sr_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  auto* s = new Shard();
  s->fd = fd;
  s->file_size = static_cast<size_t>(st.st_size);
  s->map = static_cast<unsigned char*>(
      mmap(nullptr, s->file_size, PROT_READ, MAP_PRIVATE, fd, 0));
  if (s->map == MAP_FAILED || !parse_npy_header(s->map, s->file_size, &s->info)) {
    if (s->map != MAP_FAILED) munmap(s->map, s->file_size);
    close(fd);
    delete s;
    return nullptr;
  }
  madvise(s->map, s->file_size, MADV_SEQUENTIAL);
  return s;
}

long long sr_len(void* handle) {
  return static_cast<Shard*>(handle)->info.count;
}

int sr_elem_size(void* handle) {
  return static_cast<int>(static_cast<Shard*>(handle)->info.elem_size);
}

// Copy `count` tokens starting at `offset` into out (int32), converting
// from the stored element width.
int sr_read_i32(void* handle, long long offset, long long count, int32_t* out) {
  auto* s = static_cast<Shard*>(handle);
  if (offset < 0 || static_cast<size_t>(offset + count) > s->info.count)
    return -1;
  const unsigned char* base =
      s->map + s->info.data_offset + offset * s->info.elem_size;
  switch (s->info.elem_size) {
    case 2: {
      if (s->info.kind == 'i') {  // '<i2': sign-extend
        auto* p = reinterpret_cast<const int16_t*>(base);
        for (long long i = 0; i < count; ++i) out[i] = p[i];
      } else {  // '<u2' (the GPT-2 token-shard format, train_gpt2.py:151)
        auto* p = reinterpret_cast<const uint16_t*>(base);
        for (long long i = 0; i < count; ++i) out[i] = p[i];
      }
      break;
    }
    case 4: {
      if (s->info.kind == 'u') {  // '<u4': values >= 2^31 don't fit int32
        auto* p = reinterpret_cast<const uint32_t*>(base);
        for (long long i = 0; i < count; ++i) {
          if (p[i] > static_cast<uint32_t>(INT32_MAX)) return -2;
          out[i] = static_cast<int32_t>(p[i]);
        }
      } else {
        memcpy(out, base, count * 4);
      }
      break;
    }
    case 8: {
      auto* p = reinterpret_cast<const int64_t*>(base);
      for (long long i = 0; i < count; ++i) {
        if (p[i] < 0 || p[i] > INT32_MAX) return -2;
        out[i] = static_cast<int32_t>(p[i]);
      }
      break;
    }
    default:
      return -2;
  }
  return 0;
}

// Asynchronously warm `count` tokens starting at `offset` (background thread).
void sr_prefetch(void* handle, long long offset, long long count) {
  auto* s = static_cast<Shard*>(handle);
  if (offset < 0 || static_cast<size_t>(offset) >= s->info.count) return;
  size_t n = std::min<size_t>(static_cast<size_t>(count),
                              s->info.count - static_cast<size_t>(offset));
  prefetcher()->submit(
      s->map + s->info.data_offset + offset * s->info.elem_size,
      n * s->info.elem_size);
}

void sr_close(void* handle) {
  auto* s = static_cast<Shard*>(handle);
  munmap(s->map, s->file_size);
  close(s->fd);
  delete s;
}

}  // extern "C"
