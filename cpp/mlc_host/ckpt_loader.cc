// Multithreaded checkpoint shard loader.
//
// Native analog of the reference's ndarray-cache loader
// (vm.builtin.ndarray_cache.load used at
// /root/reference/cpp/llm_chat.cc:826-828): reads manifest shards from
// disk into caller-provided host buffers with N reader threads, so
// multi-GB quantized checkpoints stream at disk/page-cache bandwidth
// instead of single-threaded Python file reads. The Python side then
// device_puts each buffer (optionally straight onto a sharded mesh).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#if defined(__unix__) || defined(__APPLE__)
#include <fcntl.h>
#include <unistd.h>
#define MLC_HAVE_PREAD 1
#endif

namespace {

struct Job {
  const char* path;
  void* dst;
  int64_t size;
};

int64_t ReadFileInto(const char* path, void* dst, int64_t size) {
#ifdef MLC_HAVE_PREAD
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  int64_t done = 0;
  char* out = static_cast<char*>(dst);
  while (done < size) {
    ssize_t r = ::pread(fd, out + done, static_cast<size_t>(size - done), done);
    if (r <= 0) {
      ::close(fd);
      return -1;
    }
    done += r;
  }
  ::close(fd);
  return done;
#else
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  size_t r = std::fread(dst, 1, static_cast<size_t>(size), f);
  std::fclose(f);
  return static_cast<int64_t>(r);
#endif
}

}  // namespace

extern "C" {

// Load one file fully into dst (must hold `size` bytes). Returns bytes
// read or -1.
int64_t mlc_load_file(const char* path, void* dst, int64_t size) {
  return ReadFileInto(path, dst, size);
}

// Load `count` files in parallel with up to `num_threads` readers.
// Returns 0 on success, else the (1-based) index of the first failed
// file.
int64_t mlc_load_files(const char** paths, void** dsts, const int64_t* sizes,
                       int64_t count, int64_t num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int64_t> next(0);
  std::atomic<int64_t> failed(0);
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= count || failed.load() != 0) break;
      if (ReadFileInto(paths[i], dsts[i], sizes[i]) != sizes[i]) {
        int64_t expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
      }
    }
  };
  std::vector<std::thread> threads;
  int64_t n = std::min<int64_t>(num_threads, count);
  threads.reserve(static_cast<size_t>(n));
  for (int64_t t = 0; t < n; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

}  // extern "C"
