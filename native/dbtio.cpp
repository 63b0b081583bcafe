// Native block-file codec + generator for the TPU query engine.
//
// The reference engine's entire runtime is C++ block I/O
// (/root/reference/DatabaseProject.cpp fread/fwrite of 14,016-byte block_t;
// layout at /root/reference/dbtproj.h:20-38).  This library is the TPU
// engine's native storage path: it transposes the on-disk AoS record format
// into the SoA columns the device consumes (and back), and generates
// benchmark fixtures, an order of magnitude faster than the numpy fallback
// for multi-GB files.  Exposed via ctypes (see ../database_technology_algorithms_tpu/io/native.py).
//
// Layout contract (independently defined; byte-compatible with the
// reference structs by construction):
//   record: 140 B  = recid u32 | num u32 | str[120] | valid u8 | pad[3]
//                    | dummy1 u32 | dummy2 u32
//   block : 14016 B = blockid u32 | nreserved u32 | 100 records | valid u8
//                    | misc u8 | pad[2] | dummy u32
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {
constexpr int kStrLen = 120;
constexpr int kStrPad = 128;
constexpr int kRecSize = 140;
constexpr int kRecsPerBlock = 100;
constexpr int kBlockSize = 14016;
constexpr int kEntriesOff = 8;

inline const uint8_t* rec_ptr(const uint8_t* block, int i) {
  return block + kEntriesOff + i * kRecSize;
}
inline uint8_t* rec_ptr(uint8_t* block, int i) {
  return block + kEntriesOff + i * kRecSize;
}
inline uint32_t rd_u32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}
inline void wr_u32(uint8_t* p, uint32_t v) { std::memcpy(p, &v, 4); }
}  // namespace

extern "C" {

// Total live rows in a block file (sum of min(nreserved, 100)).
long dbt_count_rows(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<uint8_t> block(kBlockSize);
  long total = 0;
  while (std::fread(block.data(), 1, kBlockSize, f) == (size_t)kBlockSize) {
    uint32_t nres = rd_u32(block.data() + 4);
    if (nres > kRecsPerBlock) nres = kRecsPerBlock;
    total += nres;
  }
  std::fclose(f);
  return total;
}

// AoS block file -> SoA columns. strs is rows*128, NUL-normalized (every
// byte at or after the first NUL zeroed => bytewise order == strcmp order).
// Returns rows read, or -1 on error. Caller sizes buffers via dbt_count_rows.
long dbt_read_blockfile(const char* path, uint32_t* recid, uint32_t* num,
                        uint8_t* strs, uint8_t* valid, long cap) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<uint8_t> block(kBlockSize);
  long n = 0;
  while (std::fread(block.data(), 1, kBlockSize, f) == (size_t)kBlockSize) {
    uint32_t nres = rd_u32(block.data() + 4);
    if (nres > kRecsPerBlock) nres = kRecsPerBlock;
    for (uint32_t i = 0; i < nres; ++i) {
      if (n >= cap) {
        std::fclose(f);
        return n;
      }
      const uint8_t* r = rec_ptr(block.data(), i);
      recid[n] = rd_u32(r);
      num[n] = rd_u32(r + 4);
      uint8_t* dst = strs + (size_t)n * kStrPad;
      const uint8_t* src = r + 8;
      int j = 0;
      for (; j < kStrLen && src[j]; ++j) dst[j] = src[j];
      for (; j < kStrPad; ++j) dst[j] = 0;
      valid[n] = r[128] ? 1 : 0;
      ++n;
    }
  }
  std::fclose(f);
  return n;
}

// SoA columns -> block file. Honest nreserved in the final partial block;
// block.dummy = nreserved (required by the reference merge loop, see
// DatabaseProject.cpp:282,317-321). Returns blocks written or -1.
long dbt_write_blockfile(const char* path, const uint32_t* recid,
                         const uint32_t* num, const uint8_t* strs,
                         const uint8_t* valid, long n) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::vector<uint8_t> block(kBlockSize);
  long nblocks = 0;
  for (long start = 0; start < n; start += kRecsPerBlock) {
    std::memset(block.data(), 0, kBlockSize);
    uint32_t cnt = (uint32_t)((n - start < kRecsPerBlock) ? (n - start)
                                                          : kRecsPerBlock);
    wr_u32(block.data(), (uint32_t)nblocks);   // blockid
    wr_u32(block.data() + 4, cnt);             // nreserved
    for (uint32_t i = 0; i < cnt; ++i) {
      uint8_t* r = rec_ptr(block.data(), i);
      long row = start + i;
      wr_u32(r, recid[row]);
      wr_u32(r + 4, num[row]);
      std::memcpy(r + 8, strs + (size_t)row * kStrPad, kStrLen);
      r[128] = valid[row] ? 1 : 0;
    }
    block[14008] = 1;                          // block.valid
    wr_u32(block.data() + 14012, cnt);         // block.dummy = nreserved
    if (std::fwrite(block.data(), 1, kBlockSize, f) != (size_t)kBlockSize) {
      std::fclose(f);
      return -1;
    }
    ++nblocks;
  }
  std::fclose(f);
  return nblocks;
}

// Multithreaded mmap reader: same contract as dbt_read_blockfile but
// transposes block ranges in parallel (the ingest path for multi-GB files;
// the reference streams one 14 KB block at a time single-threaded,
// DatabaseProject.cpp:193).  A header prescan computes each block's output
// row offset, then `nthreads` workers transpose disjoint block ranges into
// disjoint output ranges (no synchronization needed).
long dbt_read_blockfile_mt(const char* path, uint32_t* recid, uint32_t* num,
                           uint8_t* strs, uint8_t* valid, long cap,
                           int nthreads) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (::fstat(fd, &st) != 0) {
    ::close(fd);
    return -1;
  }
  long nblocks = st.st_size / kBlockSize;
  if (nblocks == 0) {
    ::close(fd);
    return 0;
  }
  const uint8_t* base = static_cast<const uint8_t*>(
      ::mmap(nullptr, (size_t)nblocks * kBlockSize, PROT_READ, MAP_PRIVATE,
             fd, 0));
  ::close(fd);
  if (base == MAP_FAILED) return -1;

  // prescan: per-block live counts -> exclusive output offsets
  std::vector<long> off((size_t)nblocks + 1, 0);
  for (long b = 0; b < nblocks; ++b) {
    uint32_t nres = rd_u32(base + (size_t)b * kBlockSize + 4);
    if (nres > kRecsPerBlock) nres = kRecsPerBlock;
    off[b + 1] = off[b] + nres;
  }
  long total = off[nblocks] < cap ? off[nblocks] : cap;

  if (nthreads < 1) nthreads = 1;
  if (nthreads > nblocks) nthreads = (int)nblocks;
  auto worker = [&](long b0, long b1) {
    for (long b = b0; b < b1; ++b) {
      const uint8_t* blk = base + (size_t)b * kBlockSize;
      uint32_t nres = rd_u32(blk + 4);
      if (nres > kRecsPerBlock) nres = kRecsPerBlock;
      long out = off[b];
      for (uint32_t i = 0; i < nres; ++i, ++out) {
        if (out >= total) return;
        const uint8_t* r = rec_ptr(blk, i);
        recid[out] = rd_u32(r);
        num[out] = rd_u32(r + 4);
        uint8_t* dst = strs + (size_t)out * kStrPad;
        const uint8_t* src = r + 8;
        int j = 0;
        for (; j < kStrLen && src[j]; ++j) dst[j] = src[j];
        for (; j < kStrPad; ++j) dst[j] = 0;
        valid[out] = r[128] ? 1 : 0;
      }
    }
  };
  std::vector<std::thread> threads;
  long per = (nblocks + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    long b0 = (long)t * per;
    long b1 = b0 + per < nblocks ? b0 + per : nblocks;
    if (b0 >= b1) break;
    threads.emplace_back(worker, b0, b1);
  }
  for (auto& th : threads) th.join();
  ::munmap(const_cast<uint8_t*>(base), (size_t)nblocks * kBlockSize);
  return total;
}

// Benchmark fixture generator, reference distribution (main.cpp:41-77
// shape): sequential recid shared by both files, num uniform in
// [0, key_range), 5-char lowercase strings, "Hola" planted at row 1 of each
// block. Deterministic in `seed`. Returns rows per file or -1.
long dbt_generate_pair(const char* path1, const char* path2, long nblocks,
                       uint32_t seed, uint32_t key_range) {
  FILE* f1 = std::fopen(path1, "wb");
  FILE* f2 = std::fopen(path2, "wb");
  if (!f1 || !f2) {
    if (f1) std::fclose(f1);
    if (f2) std::fclose(f2);
    return -1;
  }
  std::mt19937 rng(seed);
  std::uniform_int_distribution<uint32_t> dnum(0, key_range - 1);
  std::uniform_int_distribution<int> dchar(0, 25);
  std::vector<uint8_t> b1(kBlockSize), b2(kBlockSize);
  uint32_t recid = 0;
  for (long b = 0; b < nblocks; ++b) {
    std::memset(b1.data(), 0, kBlockSize);
    std::memset(b2.data(), 0, kBlockSize);
    wr_u32(b1.data(), (uint32_t)b);
    wr_u32(b2.data(), (uint32_t)b);
    wr_u32(b1.data() + 4, kRecsPerBlock);
    wr_u32(b2.data() + 4, kRecsPerBlock);
    for (int i = 0; i < kRecsPerBlock; ++i) {
      uint8_t* r1 = rec_ptr(b1.data(), i);
      uint8_t* r2 = rec_ptr(b2.data(), i);
      wr_u32(r1, recid);
      wr_u32(r2, recid);
      ++recid;
      wr_u32(r1 + 4, dnum(rng));
      wr_u32(r2 + 4, dnum(rng));
      for (int c = 0; c < 5; ++c) r1[8 + c] = (uint8_t)('a' + dchar(rng));
      for (int c = 0; c < 5; ++c) r2[8 + c] = (uint8_t)('a' + dchar(rng));
      if (i == 1) {
        std::memcpy(r1 + 8, "Hola\0", 5);
        std::memcpy(r2 + 8, "Hola\0", 5);
      }
      r1[128] = 1;
      r2[128] = 1;
    }
    b1[14008] = 1;
    b2[14008] = 1;
    wr_u32(b1.data() + 14012, kRecsPerBlock);
    wr_u32(b2.data() + 14012, kRecsPerBlock);
    std::fwrite(b1.data(), 1, kBlockSize, f1);
    std::fwrite(b2.data(), 1, kBlockSize, f2);
  }
  std::fclose(f1);
  std::fclose(f2);
  return nblocks * (long)kRecsPerBlock;
}

}  // extern "C"
