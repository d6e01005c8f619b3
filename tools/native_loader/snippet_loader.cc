// Native multithreaded snippet-batch loader for the offline-prepared
// triplet layout (davo_tpu/data/prep.py; reference analog:
// <ref>/data_loader.py's TF queue-runner input pipeline, which the
// reference implements with native TF kernels). The Python reader
// (`PreparedSnippets`) decodes JPEGs serially on the training thread;
// this loader overlaps decode across a thread pool and double-buffers
// assembled batches so `snl_next` is a memcpy when decode keeps up.
//
// Layout per item `<name>`:
//   <dir>/<name>.jpg      H x 3W RGB JPEG: [prev | target | next]
//   <dir>/<name>_cam.txt  9 comma-separated intrinsics (row-major K)
//   <dir>/<name>_seg.png  optional H x W 8-bit label map (target frame)
//   <dir>/<name>_pose.txt optional 32 comma-separated floats: two 4x4
//                         GT warp transforms (target->each source)
//
// Batch output (float32 RGB in [0,1]; seg int32 labels):
//   target  (B, H, W, 3)
//   sources (B, 2, H, W, 3)   [prev, next]
//   K       (B, 3, 3)
//   seg     (B, H, W)         when created with with_seg
//   gt      (B, 2, 4, 4)      when created with with_gt
//
// Build: make -C tools/native_loader  (links libjpeg + libpng + pthread)

#include <cstdio>  // jpeglib.h needs FILE declared before inclusion

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kNumBuffers = 3;  // ready-queue depth (prefetch window)

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Read `count` comma/space-separated floats from a small text file.
bool read_floats(const std::string& path, float* out, int count,
                 std::string* error) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) {
    *error = "open failed: " + path;
    return false;
  }
  char buf[2048];
  size_t n = fread(buf, 1, sizeof(buf) - 1, f);
  fclose(f);
  buf[n] = 0;
  char* p = buf;
  for (int i = 0; i < count; ++i) {
    char* end = nullptr;
    out[i] = strtof(p, &end);
    if (end == p) {
      *error = "bad float file: " + path;
      return false;
    }
    p = end;
    while (*p == ',' || *p == ' ' || *p == '\n') ++p;
  }
  return true;
}

// Decode <name>_seg.png (8-bit gray H x W) into int32 labels.
bool decode_seg(const std::string& path, int H, int W, int32_t* out,
                std::string* error) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) {
    *error = "open failed: " + path;
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                           nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  // Row pointers allocated BEFORE setjmp (longjmp-safe, like the jpeg
  // path): destroyed on normal scope exit after the error return.
  std::vector<png_bytep> rows;
  std::vector<png_byte> buf;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    fclose(f);
    *error = "png decode failed: " + path;
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  const int h = png_get_image_height(png, info);
  const int w = png_get_image_width(png, info);
  const int depth = png_get_bit_depth(png, info);
  const int ctype = png_get_color_type(png, info);
  if (h != H || w != W || depth != 8 || ctype != PNG_COLOR_TYPE_GRAY) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    char b[96];
    snprintf(b, sizeof(b), " (%dx%d depth=%d ctype=%d, want %dx%d gray8)",
             h, w, depth, ctype, H, W);
    *error = "seg shape mismatch: " + path + b;
    return false;
  }
  buf.resize(static_cast<size_t>(H) * W);
  rows.resize(H);
  for (int r = 0; r < H; ++r) rows[r] = buf.data() + static_cast<size_t>(r) * W;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  for (size_t i = 0; i < buf.size(); ++i) out[i] = buf[i];
  return true;
}

// Decode one triplet JPEG + cam file directly into the batch slot.
// Returns false (and fills *error) on any failure.
bool decode_item(const std::string& dir, const std::string& name, int H,
                 int W, float* target, float* sources, float* Kout,
                 std::string* error) {
  const std::string jpg = dir + "/" + name + ".jpg";
  FILE* f = fopen(jpg.c_str(), "rb");
  if (!f) {
    *error = "open failed: " + jpg;
    return false;
  }

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  // Constructed BEFORE setjmp: a longjmp back to the setjmp point then
  // returns through normal scope exit, so the buffer is destroyed (a
  // vector constructed AFTER setjmp would be skipped — UB + leak).
  std::vector<JSAMPLE> row;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    *error = "jpeg decode failed: " + jpg;
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_height) != H ||
      static_cast<int>(cinfo.output_width) != 3 * W ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    char buf[128];
    snprintf(buf, sizeof(buf), " (got %ux%ux%d, want %dx%dx3)",
             cinfo.output_height, cinfo.output_width,
             cinfo.output_components, H, 3 * W);
    *error = "shape mismatch: " + jpg + buf;
    return false;
  }

  row.resize(3 * W * 3);
  JSAMPROW rowp = row.data();
  constexpr float kInv255 = 1.0f / 255.0f;
  const int64_t frame = static_cast<int64_t>(H) * W * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    const int r = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    float* tgt_row = target + static_cast<int64_t>(r) * W * 3;
    float* prev_row = sources + static_cast<int64_t>(r) * W * 3;
    float* next_row = sources + frame + static_cast<int64_t>(r) * W * 3;
    const JSAMPLE* prev_px = row.data();
    const JSAMPLE* tgt_px = row.data() + W * 3;
    const JSAMPLE* next_px = row.data() + 2 * W * 3;
    for (int i = 0; i < W * 3; ++i) {
      prev_row[i] = prev_px[i] * kInv255;
      tgt_row[i] = tgt_px[i] * kInv255;
      next_row[i] = next_px[i] * kInv255;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);

  return read_floats(dir + "/" + name + "_cam.txt", Kout, 9, error);
}

struct BatchBuffer {
  std::vector<float> target, sources, K, gt;
  std::vector<int32_t> seg;
  int filled = 0;           // decoded items in this buffer
  int assigned = 0;         // items handed to workers
  enum State { FREE, FILLING, READY } state = FREE;
  uint64_t seq = 0;         // global batch index (consume ordering)
};

struct Loader {
  std::string dir;
  std::vector<std::string> names;
  int batch, H, W;
  bool shuffle, loop, with_seg = false, with_gt = false;
  std::mt19937_64 rng;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_worker, cv_consumer;
  BatchBuffer buffers[kNumBuffers];
  std::vector<uint32_t> order;  // current epoch permutation
  size_t epoch_pos = 0;         // next item within the epoch
  size_t epoch_len = 0;         // items used per epoch (tail dropped)
  uint64_t batches_produced = 0, batches_consumed = 0;
  bool epochs_done = false;     // !loop and final epoch fully assigned
  bool stopping = false;
  std::string error;

  void new_epoch() {
    order.resize(names.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = i;
    if (shuffle) {
      for (size_t i = order.size() - 1; i > 0; --i) {
        std::uniform_int_distribution<size_t> d(0, i);
        std::swap(order[i], order[d(rng)]);
      }
    }
    epoch_len = (names.size() / batch) * batch;  // drop ragged tail
    epoch_pos = 0;
  }

  // Under mu: find (or open) the buffer accepting new work.
  BatchBuffer* filling_buffer() {
    for (auto& b : buffers)
      if (b.state == BatchBuffer::FILLING && b.assigned < batch) return &b;
    for (auto& b : buffers) {
      if (b.state == BatchBuffer::FREE) {
        b.state = BatchBuffer::FILLING;
        b.filled = b.assigned = 0;
        b.seq = batches_produced++;
        return &b;
      }
    }
    return nullptr;  // all buffers busy; worker must wait
  }

  void worker_main() {
    for (;;) {
      BatchBuffer* buf = nullptr;
      std::string name;
      int slot = -1;
      {
        std::unique_lock<std::mutex> lk(mu);
        for (;;) {
          if (stopping || !error.empty()) return;
          if (epoch_pos >= epoch_len) {
            if (!loop) {
              epochs_done = true;
              cv_consumer.notify_all();
              cv_worker.wait(lk);
              continue;
            }
            new_epoch();
          }
          buf = filling_buffer();
          if (buf) break;
          cv_worker.wait(lk);
        }
        slot = buf->assigned++;
        name = names[order[epoch_pos++]];
      }

      const int64_t frame = static_cast<int64_t>(H) * W * 3;
      std::string err;
      bool ok = decode_item(
          dir, name, H, W, buf->target.data() + slot * frame,
          buf->sources.data() + slot * 2 * frame, buf->K.data() + slot * 9,
          &err);
      if (ok && with_seg) {
        ok = decode_seg(dir + "/" + name + "_seg.png", H, W,
                        buf->seg.data() + static_cast<int64_t>(slot) * H * W,
                        &err);
      }
      if (ok && with_gt) {
        ok = read_floats(dir + "/" + name + "_pose.txt",
                         buf->gt.data() + slot * 32, 32, &err);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        if (!ok && error.empty()) error = err;
        if (++buf->filled == batch) {
          buf->state = BatchBuffer::READY;
          cv_consumer.notify_all();
        }
        if (!ok) cv_consumer.notify_all();
      }
    }
  }

  // 1 = batch copied out, 0 = end of data, -1 = error.
  int next(float* target, float* sources, float* K, int32_t* seg,
           float* gt) {
    std::unique_lock<std::mutex> lk(mu);
    BatchBuffer* buf = nullptr;
    for (;;) {
      if (!error.empty()) return -1;
      for (auto& b : buffers)
        if (b.state == BatchBuffer::READY && b.seq == batches_consumed) {
          buf = &b;
          break;
        }
      if (buf) break;
      // End: final epoch fully assigned and no buffer will become
      // READY for our seq (it was never opened).
      if (epochs_done && batches_produced <= batches_consumed) return 0;
      cv_consumer.wait(lk);
    }
    lk.unlock();
    const int64_t frame = static_cast<int64_t>(H) * W * 3;
    memcpy(target, buf->target.data(), sizeof(float) * batch * frame);
    memcpy(sources, buf->sources.data(), sizeof(float) * batch * 2 * frame);
    memcpy(K, buf->K.data(), sizeof(float) * batch * 9);
    if (with_seg && seg)
      memcpy(seg, buf->seg.data(),
             sizeof(int32_t) * static_cast<int64_t>(batch) * H * W);
    if (with_gt && gt)
      memcpy(gt, buf->gt.data(), sizeof(float) * batch * 32);
    lk.lock();
    buf->state = BatchBuffer::FREE;
    ++batches_consumed;
    cv_worker.notify_all();
    return 1;
  }
};

}  // namespace

extern "C" {

// names_blob: '\n'-joined item names.
void* snl_create(const char* dir, const char* names_blob, int batch,
                 int height, int width, int n_threads,
                 unsigned long long seed, int shuffle, int loop,
                 int with_seg, int with_gt) {
  auto* L = new Loader;
  L->dir = dir;
  const char* p = names_blob;
  while (*p) {
    const char* nl = strchr(p, '\n');
    size_t len = nl ? static_cast<size_t>(nl - p) : strlen(p);
    if (len) L->names.emplace_back(p, len);
    p += len + (nl ? 1 : 0);
  }
  L->batch = batch;
  L->H = height;
  L->W = width;
  L->shuffle = shuffle != 0;
  L->loop = loop != 0;
  L->with_seg = with_seg != 0;
  L->with_gt = with_gt != 0;
  L->rng.seed(seed);
  if (L->names.empty() || static_cast<int>(L->names.size()) < batch) {
    delete L;
    return nullptr;
  }
  const int64_t frame = static_cast<int64_t>(height) * width * 3;
  for (auto& b : L->buffers) {
    b.target.resize(batch * frame);
    b.sources.resize(batch * 2 * frame);
    b.K.resize(batch * 9);
    if (L->with_seg)
      b.seg.resize(static_cast<int64_t>(batch) * height * width);
    if (L->with_gt) b.gt.resize(batch * 32);
  }
  L->new_epoch();
  if (n_threads < 1) n_threads = 1;
  for (int i = 0; i < n_threads; ++i)
    L->workers.emplace_back(&Loader::worker_main, L);
  return L;
}

int snl_next(void* h, float* target, float* sources, float* K,
             int32_t* seg, float* gt) {
  return static_cast<Loader*>(h)->next(target, sources, K, seg, gt);
}

// Copies the error message (empty string if none) into out.
void snl_error(void* h, char* out, int cap) {
  auto* L = static_cast<Loader*>(h);
  std::lock_guard<std::mutex> lk(L->mu);
  snprintf(out, cap, "%s", L->error.c_str());
}

void snl_destroy(void* h) {
  auto* L = static_cast<Loader*>(h);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stopping = true;
  }
  L->cv_worker.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

// Probe a triplet's decoded dims without a full decode (header only).
// Returns 1 and fills h/w (w = per-frame width) on success.
int snl_probe(const char* path, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 0;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width / 3;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 1;
}

}  // extern "C"
