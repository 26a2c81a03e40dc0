// Native multithreaded WAV batch decoder.
//
// TPU-native replacement for the reference's per-file TF decode_wav
// session round-trips (input_data.py:117-133, 516-519): decodes thousands
// of 16-bit PCM WAV files in parallel into one packed int16 buffer ready
// for a single host->HBM upload. Semantics match decode_wav: first
// channel, zero-pad/crop to desired_samples (scaling to float happens on
// device, 1/32768).
//
// Build: make -C speech_recognition_tpu/native
// ABI: wavio_decode_batch(paths, n, desired_samples, out, lengths,
//                         num_threads) -> 0 on success.
// lengths[i] receives the pre-pad sample count, or -1 on per-file error
// (the row is left zeroed; callers may fall back per file).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Chunk {
  uint32_t id;
  uint32_t size;
};

inline uint32_t tag(const char* s) {
  return static_cast<uint32_t>(s[0]) | (static_cast<uint32_t>(s[1]) << 8) |
         (static_cast<uint32_t>(s[2]) << 16) |
         (static_cast<uint32_t>(s[3]) << 24);
}

// Decode one file into out[0..desired). Returns original sample count or
// -1 on failure.
int32_t decode_one(const char* path, int desired, int16_t* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long file_size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (file_size < 44) { std::fclose(f); return -1; }
  std::vector<uint8_t> buf(static_cast<size_t>(file_size));
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  if (got != buf.size()) return -1;

  if (std::memcmp(buf.data(), "RIFF", 4) != 0 ||
      std::memcmp(buf.data() + 8, "WAVE", 4) != 0)
    return -1;

  uint16_t num_channels = 0, bits = 0, format = 0;
  const int16_t* samples = nullptr;
  size_t num_samples = 0;

  size_t pos = 12;
  while (pos + 8 <= buf.size()) {
    Chunk c;
    std::memcpy(&c.id, buf.data() + pos, 4);
    std::memcpy(&c.size, buf.data() + pos + 4, 4);
    size_t body = pos + 8;
    if (c.id == tag("fmt ") && body + 16 <= buf.size()) {
      std::memcpy(&format, buf.data() + body, 2);
      std::memcpy(&num_channels, buf.data() + body + 2, 2);
      std::memcpy(&bits, buf.data() + body + 14, 2);
    } else if (c.id == tag("data")) {
      size_t avail = buf.size() - body;
      size_t len = c.size < avail ? c.size : avail;
      samples = reinterpret_cast<const int16_t*>(buf.data() + body);
      num_samples = len / 2;
    }
    pos = body + c.size + (c.size & 1);
    if (samples && bits) break;
  }
  if (!samples || format != 1 || bits != 16) return -1;
  if (num_channels == 0) num_channels = 1;
  size_t frames = num_samples / num_channels;
  size_t copy = frames < static_cast<size_t>(desired)
                    ? frames
                    : static_cast<size_t>(desired);
  if (num_channels == 1) {
    std::memcpy(out, samples, copy * sizeof(int16_t));
  } else {
    for (size_t i = 0; i < copy; ++i) out[i] = samples[i * num_channels];
  }
  // zero-pad the tail (callers pass a zeroed buffer, but be defensive)
  if (copy < static_cast<size_t>(desired))
    std::memset(out + copy, 0, (desired - copy) * sizeof(int16_t));
  return static_cast<int32_t>(frames);
}

}  // namespace

extern "C" int wavio_decode_batch(const char** paths, int n,
                                  int desired_samples, int16_t* out,
                                  int32_t* lengths, int num_threads) {
  if (n <= 0) return 0;
  if (num_threads <= 0) num_threads = 4;
  if (num_threads > n) num_threads = n;
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      lengths[i] = decode_one(paths[i], desired_samples,
                              out + static_cast<size_t>(i) * desired_samples);
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}
