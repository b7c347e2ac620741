// Threaded batch WAV decoder for the host ingest path.
//
// The reference decodes 5,000 clips one-by-one through librosa/soundfile
// (reference src/precompute/process.py:28); here the byte-level work — RIFF
// parsing, PCM16 -> float32 scaling, pad/truncate to a fixed length — runs in
// a C++ thread pool completely off the GIL, filling one contiguous
// [N, expected_len] float32 buffer that feeds the batched device feature
// graph directly. Exposed via a C ABI for ctypes (tpu_breath/data/wav.py).
//
// Build: make -C native   (produces libwavio.so)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct RiffHeader {
  uint16_t channels = 0;
  uint16_t bits_per_sample = 0;
  uint32_t sample_rate = 0;
  long data_offset = -1;
  uint32_t data_bytes = 0;
};

// Minimal RIFF/WAVE walker: finds fmt + data chunks.
bool parse_header(FILE* f, RiffHeader* out) {
  unsigned char hdr[12];
  if (fread(hdr, 1, 12, f) != 12) return false;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0)
    return false;
  unsigned char chunk[8];
  while (fread(chunk, 1, 8, f) == 8) {
    uint32_t size = chunk[4] | (chunk[5] << 8) | (chunk[6] << 16) |
                    (uint32_t(chunk[7]) << 24);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      unsigned char fmt[16];
      if (size < 16 || fread(fmt, 1, 16, f) != 16) return false;
      out->channels = fmt[2] | (fmt[3] << 8);
      out->sample_rate = fmt[4] | (fmt[5] << 8) | (fmt[6] << 16) |
                         (uint32_t(fmt[7]) << 24);
      out->bits_per_sample = fmt[14] | (fmt[15] << 8);
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
    } else if (memcmp(chunk, "data", 4) == 0) {
      out->data_offset = ftell(f);
      out->data_bytes = size;
      return out->channels != 0;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  return false;
}

// Decode one PCM16 mono file into out[expected_len], scaled by 1/32768,
// zero-padded / truncated. Returns 0 on success.
int decode_one(const char* path, float* out, int expected_len) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  RiffHeader h;
  if (!parse_header(f, &h) || h.bits_per_sample != 16 || h.channels != 1) {
    fclose(f);
    return 2;
  }
  const uint32_t n_avail = h.data_bytes / 2;
  const uint32_t n = n_avail < uint32_t(expected_len) ? n_avail
                                                      : uint32_t(expected_len);
  std::vector<int16_t> buf(n);
  fseek(f, h.data_offset, SEEK_SET);
  const size_t got = fread(buf.data(), 2, n, f);
  fclose(f);
  constexpr float kScale = 1.0f / 32768.0f;
  for (size_t i = 0; i < got; ++i) out[i] = float(buf[i]) * kScale;
  for (size_t i = got; i < size_t(expected_len); ++i) out[i] = 0.0f;
  return 0;
}

}  // namespace

extern "C" {

// Decodes n_files paths into out[n_files * expected_len]. n_threads <= 0
// uses the hardware concurrency. Returns the number of failed files.
int decode_wav_batch(const char** paths, int n_files, float* out,
                     int expected_len, int n_threads) {
  if (n_threads <= 0) {
    n_threads = int(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > n_files) n_threads = n_files > 0 ? n_files : 1;
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n_files; i = next.fetch_add(1)) {
      if (decode_one(paths[i], out + size_t(i) * expected_len, expected_len))
        failures.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
