// Native frame-batch assembler for multi-camera ingest.
//
// Runtime equivalent of the reference's per-camera Python frame pumps
// (clearcam.py:401-421: thread reads an ffmpeg rawvideo pipe into a
// newest-frame-wins slot). At 32x 1080p streams the Python loop burns the
// GIL on ~190 MB/s of memcpy; this moves pipe reads and batch assembly into
// native threads with seqlock'd latest-frame slots, so the NVR tick does one
// ctypes call to materialize the [N, H, W, 3] batch for the TPU.
//
// ABI (ctypes, clearcam_tpu/runtime/native_loader.py):
//   void* cc_batcher_create(int n_streams, long frame_bytes);
//   void* cc_batcher_create2(int n_streams, int h, int w, int c, int k);
//   int   cc_batcher_add_fd(void* h, int stream, int fd);   // reader thread
//   int   cc_batcher_push(void* h, int stream, const uint8_t* data);
//   long  cc_batcher_snapshot(void* h, uint8_t* out, long* seqs);
//   int   cc_batcher_remove(void* h, int stream);
//   void  cc_batcher_stop(void* h);
//   void  cc_batcher_destroy(void* h);
//
// snapshot copies every stream's newest frame into out[stream] and writes its
// sequence number (monotonic per stream; -1 = no frame yet); returns the
// number of streams that have ever produced a frame.
//
// create2 with k>1 (odd) decimates during ingest: readers consume full
// h*w*c frames but publish [h/k, w/k, c] frames using the center pixel tap
// at offset (k-1)/2 — exactly the half-pixel bilinear downscale at an exact
// odd integer ratio (ops/image.letterbox's fast path). At NVR scale this
// cuts host memcpy AND host->device PCIe traffic by k^2 (a 128-stream
// 1080p@30 deployment is otherwise host-link-bound: ~24 GB/s of raw frames).
//
// Build: g++ -O3 -std=c++17 -pthread -shared -fPIC -o libccingest.so batcher.cc

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <unistd.h>

namespace {

struct Slot {
  std::vector<uint8_t> buf[2];
  std::vector<uint8_t> staging;  // full-res frame when decimating (k > 1)
  std::atomic<int64_t> seq{-1};  // seq % 2 selects the readable buffer
  std::thread reader;
  std::atomic<bool> running{false};
  int fd = -1;
};

struct Batcher {
  long frame_bytes;      // published (possibly decimated) frame size
  long in_bytes;         // bytes consumed from the pipe per frame
  int h = 0, w = 0, c = 0, k = 1;
  std::vector<Slot> slots;
  std::atomic<bool> alive{true};
};

// center-tap decimation: out[y][x] = in[y*k + off][x*k + off]
void decimate(const Batcher* b, const uint8_t* in, uint8_t* out) {
  const int off = (b->k - 1) / 2;
  const int oh = b->h / b->k, ow = b->w / b->k, c = b->c, k = b->k;
  const long in_row = (long)b->w * c;
  for (int y = 0; y < oh; y++) {
    const uint8_t* src = in + (long)(y * k + off) * in_row + (long)off * c;
    uint8_t* dst = out + (long)y * ow * c;
    for (int x = 0; x < ow; x++) {
      memcpy(dst + (long)x * c, src + (long)x * k * c, c);
    }
  }
}

void reader_loop(Batcher* b, Slot* s) {
  const long need = b->in_bytes;
  while (s->running.load(std::memory_order_relaxed) &&
         b->alive.load(std::memory_order_relaxed)) {
    int64_t next = s->seq.load(std::memory_order_relaxed) + 1;
    uint8_t* dst = (b->k > 1) ? s->staging.data() : s->buf[next & 1].data();
    long got = 0;
    while (got < need) {
      ssize_t r = read(s->fd, dst + got, need - got);
      if (r <= 0) {
        if (!s->running.load(std::memory_order_relaxed)) return;
        if (r == 0) {  // EOF: stop this stream
          s->running.store(false, std::memory_order_relaxed);
          return;
        }
        continue;  // EINTR etc.
      }
      got += r;
    }
    if (b->k > 1) decimate(b, s->staging.data(), s->buf[next & 1].data());
    s->seq.store(next, std::memory_order_release);
  }
}

}  // namespace

extern "C" {

void* cc_batcher_create(int n_streams, long frame_bytes) {
  auto* b = new Batcher();
  b->frame_bytes = frame_bytes;
  b->in_bytes = frame_bytes;
  b->slots = std::vector<Slot>(n_streams);
  for (auto& s : b->slots) {
    s.buf[0].resize(frame_bytes);
    s.buf[1].resize(frame_bytes);
  }
  return b;
}

void* cc_batcher_create2(int n_streams, int h, int w, int c, int k) {
  if (k < 1 || k % 2 == 0 || h % k || w % k) return nullptr;
  auto* b = new Batcher();
  b->h = h;
  b->w = w;
  b->c = c;
  b->k = k;
  b->in_bytes = (long)h * w * c;
  b->frame_bytes = b->in_bytes / ((long)k * k);
  b->slots = std::vector<Slot>(n_streams);
  for (auto& s : b->slots) {
    s.buf[0].resize(b->frame_bytes);
    s.buf[1].resize(b->frame_bytes);
    if (k > 1) s.staging.resize(b->in_bytes);
  }
  return b;
}

int cc_batcher_add_fd(void* h, int stream, int fd) {
  auto* b = static_cast<Batcher*>(h);
  if (stream < 0 || stream >= (int)b->slots.size()) return 1;
  Slot& s = b->slots[stream];
  if (s.running.load()) return 2;
  if (s.reader.joinable()) s.reader.join();  // slot reuse after EOF/respawn
  s.fd = fd;
  s.running.store(true);
  s.reader = std::thread(reader_loop, b, &s);
  return 0;
}

int cc_batcher_push(void* h, int stream, const uint8_t* data) {
  // `data` is always a FULL-resolution frame (in_bytes); decimated if k > 1
  auto* b = static_cast<Batcher*>(h);
  if (stream < 0 || stream >= (int)b->slots.size()) return 1;
  Slot& s = b->slots[stream];
  int64_t next = s.seq.load(std::memory_order_relaxed) + 1;
  if (b->k > 1) {
    decimate(b, data, s.buf[next & 1].data());
  } else {
    std::memcpy(s.buf[next & 1].data(), data, b->frame_bytes);
  }
  s.seq.store(next, std::memory_order_release);
  return 0;
}

long cc_batcher_snapshot(void* h, uint8_t* out, long* seqs) {
  auto* b = static_cast<Batcher*>(h);
  long fresh = 0;
  const long fb = b->frame_bytes;
  for (size_t i = 0; i < b->slots.size(); i++) {
    Slot& s = b->slots[i];
    int64_t seq = s.seq.load(std::memory_order_acquire);
    if (seq < 0) {
      seqs[i] = -1;
      continue;
    }
    // seqlock: only accept when seq is unchanged across the copy. If the
    // writer published seq+1 it may already be writing seq+2 into buf[seq&1]
    // (the buffer we just copied), so ANY change — including a parity
    // change — means the copy may be torn; re-read the newest buffer.
    for (;;) {
      std::memcpy(out + i * fb, s.buf[seq & 1].data(), fb);
      int64_t now = s.seq.load(std::memory_order_acquire);
      if (now == seq) break;
      seq = now;
    }
    seqs[i] = seq;
    fresh++;
  }
  return fresh;
}

int cc_batcher_remove(void* h, int stream) {
  // Free a slot for reuse by a different camera: stop the reader (the caller
  // should close the pipe's write side first so a blocked read() sees EOF),
  // join it, and reset seq so a stale frame never shows up as the new
  // camera's. Safe vs concurrent snapshot: a seq change mid-copy forces a
  // re-read and seq=-1 is reported as empty on the next snapshot.
  auto* b = static_cast<Batcher*>(h);
  if (stream < 0 || stream >= (int)b->slots.size()) return 1;
  Slot& s = b->slots[stream];
  s.running.store(false, std::memory_order_relaxed);
  if (s.fd >= 0) {
    close(s.fd);
    s.fd = -1;
  }
  if (s.reader.joinable()) s.reader.join();
  s.seq.store(-1, std::memory_order_release);
  return 0;
}

void cc_batcher_stop(void* h) {
  auto* b = static_cast<Batcher*>(h);
  b->alive.store(false);
  for (auto& s : b->slots) {
    s.running.store(false);
    if (s.fd >= 0) close(s.fd);
    if (s.reader.joinable()) s.reader.join();
  }
}

void cc_batcher_destroy(void* h) {
  auto* b = static_cast<Batcher*>(h);
  cc_batcher_stop(h);
  delete b;
}

}  // extern "C"
