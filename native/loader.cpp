// Native multi-threaded image loader + bounded prefetch ring.
//
// Parity (WHAT): the reference's C++ data layer — DatasetReader's image
// loading and the RosbagParser producer thread with condition-variable flow
// control (/root/reference/MCDataUtils/src/RosbagParser.cpp:199-336,
// DatasetReader.cpp:275-465). This is the host-side runtime half of the
// pipeline: decode threads keep the TPU fed while the device crunches the
// previous frame; Python talks to it through a plain C ABI (ctypes).
//
// Decodes PNG (libpng), JPEG (libjpeg), and binary PGM (P5) to grayscale
// float32 in [0, 1].

#include <cstddef>
#include <cstdio>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

bool decode_pgm(FILE* f, std::vector<float>& out, int& w, int& h) {
  char magic[3] = {0};
  if (fscanf(f, "%2s", magic) != 1 || strcmp(magic, "P5") != 0) return false;
  int maxv = 0;
  // skip comments
  auto read_int = [&](int& v) {
    int c;
    do {
      c = fgetc(f);
      if (c == '#') {
        while (c != '\n' && c != EOF) c = fgetc(f);
      }
    } while (c == ' ' || c == '\n' || c == '\r' || c == '\t');
    ungetc(c, f);
    return fscanf(f, "%d", &v) == 1;
  };
  if (!read_int(w) || !read_int(h) || !read_int(maxv)) return false;
  if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 65535) return false;
  fgetc(f);  // single whitespace after header
  const size_t n = (size_t)w * h;
  out.resize(n);
  const float s = 1.0f / (float)maxv;
  if (maxv > 255) {
    // 16-bit P5: big-endian two-byte samples
    std::vector<uint8_t> buf(n * 2);
    if (fread(buf.data(), 1, buf.size(), f) != buf.size()) return false;
    for (size_t i = 0; i < n; ++i)
      out[i] = (float)((buf[2 * i] << 8) | buf[2 * i + 1]) * s;
  } else {
    std::vector<uint8_t> buf(n);
    if (fread(buf.data(), 1, buf.size(), f) != buf.size()) return false;
    for (size_t i = 0; i < n; ++i) out[i] = buf[i] * s;
  }
  return true;
}

bool decode_png_file(FILE* f, std::vector<float>& out, int& w, int& h) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  w = png_get_image_width(png, info);
  h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_PALETTE ||
      color == PNG_COLOR_TYPE_RGB_ALPHA)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  png_read_update_info(png, info);
  std::vector<uint8_t> row((size_t)w);
  out.resize((size_t)w * h);
  for (int y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out.data() + (size_t)y * w;
    for (int x = 0; x < w; ++x) dst[x] = row[x] * (1.0f / 255.0f);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_jpeg_file(FILE* f, std::vector<float>& out, int& w, int& h) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  out.resize((size_t)w * h);
  std::vector<uint8_t> row((size_t)w);
  JSAMPROW rp = row.data();
  for (int y = 0; y < h; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* dst = out.data() + (size_t)y * w;
    for (int x = 0; x < w; ++x) dst[x] = row[x] * (1.0f / 255.0f);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_any(const std::string& path, std::vector<float>& out, int& w,
                int& h) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  uint8_t sig[4] = {0};
  size_t n = fread(sig, 1, 4, f);
  rewind(f);
  bool ok = false;
  if (n >= 4 && sig[0] == 0x89 && sig[1] == 'P')
    ok = decode_png_file(f, out, w, h);
  else if (n >= 2 && sig[0] == 0xFF && sig[1] == 0xD8)
    ok = decode_jpeg_file(f, out, w, h);
  else if (n >= 2 && sig[0] == 'P' && sig[1] == '5')
    ok = decode_pgm(f, out, w, h);
  fclose(f);
  return ok;
}

struct FrameSlot {
  long index;
  std::vector<float> data;  // (cams * H * W)
  bool ok;
};

struct Loader {
  std::vector<std::string> paths;  // frame-major: frame i, cam c
  int n_frames, n_cams, width, height, depth;
  std::atomic<long> next_to_claim{0};
  // reorder buffer: decoded frames waiting to be consumed in order
  std::mutex mu;
  std::condition_variable cv_produced, cv_space;
  std::deque<FrameSlot> ready;
  long next_to_emit = 0;
  bool stop = false;
  std::vector<std::thread> workers;

  void worker() {
    for (;;) {
      long i = next_to_claim.fetch_add(1);
      if (i >= n_frames) return;
      // flow control on the CLAIM side: never run more than `depth` frames
      // ahead of the consumer. (Gating the push side can deadlock: the ring
      // fills with later frames while the frame the consumer needs is still
      // being decoded.)
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] { return stop || i < next_to_emit + depth; });
        if (stop) return;
      }
      FrameSlot slot;
      slot.index = i;
      slot.ok = true;
      slot.data.resize((size_t)n_cams * width * height);
      for (int c = 0; c < n_cams && slot.ok; ++c) {
        std::vector<float> img;
        int w = 0, h = 0;
        if (!decode_any(paths[(size_t)i * n_cams + c], img, w, h) ||
            w != width || h != height) {
          slot.ok = false;
          break;
        }
        memcpy(slot.data.data() + (size_t)c * width * height, img.data(),
               img.size() * sizeof(float));
      }
      std::lock_guard<std::mutex> lk(mu);
      if (stop) return;
      ready.push_back(std::move(slot));
      cv_produced.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* loader_create(const char** paths, long n_frames, int n_cams, int width,
                    int height, int depth, int threads) {
  Loader* L = new Loader();
  L->n_frames = (int)n_frames;
  L->n_cams = n_cams;
  L->width = width;
  L->height = height;
  L->depth = depth < 1 ? 2 : depth;
  L->paths.reserve((size_t)n_frames * n_cams);
  for (long i = 0; i < n_frames * n_cams; ++i) L->paths.emplace_back(paths[i]);
  int nt = threads < 1 ? 2 : threads;
  for (int t = 0; t < nt; ++t)
    L->workers.emplace_back(&Loader::worker, L);
  return L;
}

// Copies the next frame (in order) into out (n_cams*H*W floats).
// Returns the frame index, -1 at end of stream, -2 on decode failure.
long loader_next(void* handle, float* out) {
  Loader* L = (Loader*)handle;
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_to_emit >= L->n_frames) return -1;
  long want = L->next_to_emit;
  for (;;) {
    for (auto it = L->ready.begin(); it != L->ready.end(); ++it) {
      if (it->index == want) {
        bool ok = it->ok;
        if (ok)
          memcpy(out, it->data.data(), it->data.size() * sizeof(float));
        L->ready.erase(it);
        L->next_to_emit++;
        L->cv_space.notify_all();
        return ok ? want : -2;
      }
    }
    L->cv_produced.wait(lk);
  }
}

void loader_destroy(void* handle) {
  Loader* L = (Loader*)handle;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_space.notify_all();
  L->cv_produced.notify_all();
  L->next_to_claim.store(L->n_frames);
  for (auto& t : L->workers) t.join();
  delete L;
}

int probe_image(const char* path, int* w, int* h) {
  std::vector<float> img;
  int ww = 0, hh = 0;
  if (!decode_any(path, img, ww, hh)) return -1;
  *w = ww;
  *h = hh;
  return 0;
}

// ---- MCRAW: mmap'd raw frame container --------------------------------
//
// Decode-free replay format: one file holding every frame of a session as
// contiguous uint8 grayscale, read back through mmap (zero-copy page-cache
// reads, no PNG/JPEG work on the replay path). The converter decodes a
// dataset ONCE (scripts/convert_to_mcraw.py); replay then streams at
// memory-bandwidth speed — the rosbag-replaces-decode idea of the
// reference's bag path, without the serialization layer.
//
// Layout: 32-byte header {magic "MCRW", u32 version, u32 n_frames,
// u32 n_cams, u32 height, u32 width, u64 reserved} + frames, each
// n_cams*height*width bytes, frame-major. Timestamps live in a numpy
// sidecar (<path>.ts.npy) on the Python side.

struct McrawHeader {
  char magic[4];
  uint32_t version;
  uint32_t n_frames, n_cams, height, width;
  uint64_t reserved;
};

struct Mcraw {
  int fd = -1;
  size_t bytes = 0;
  const uint8_t* base = nullptr;
  McrawHeader hdr{};
};

int mcraw_write(const char* path, long n_frames, int n_cams, int height,
                int width, const uint8_t* data) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  McrawHeader hdr{};
  memcpy(hdr.magic, "MCRW", 4);
  hdr.version = 1;
  hdr.n_frames = (uint32_t)n_frames;
  hdr.n_cams = (uint32_t)n_cams;
  hdr.height = (uint32_t)height;
  hdr.width = (uint32_t)width;
  const size_t n = (size_t)n_frames * n_cams * height * width;
  bool ok = fwrite(&hdr, sizeof(hdr), 1, f) == 1 &&
            fwrite(data, 1, n, f) == n;
  fclose(f);
  return ok ? 0 : -1;
}

void* mcraw_open(const char* path, long* n_frames, int* n_cams, int* height,
                 int* width) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || (size_t)st.st_size < sizeof(McrawHeader)) {
    close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  Mcraw* m = new Mcraw();
  m->fd = fd;
  m->bytes = st.st_size;
  m->base = (const uint8_t*)base;
  memcpy(&m->hdr, base, sizeof(McrawHeader));
  const size_t need =
      sizeof(McrawHeader) + (size_t)m->hdr.n_frames * m->hdr.n_cams *
                                m->hdr.height * m->hdr.width;
  if (memcmp(m->hdr.magic, "MCRW", 4) != 0 || m->hdr.version != 1 ||
      m->bytes < need) {
    munmap((void*)m->base, m->bytes);
    close(fd);
    delete m;
    return nullptr;
  }
  madvise((void*)m->base, m->bytes, MADV_SEQUENTIAL);
  *n_frames = m->hdr.n_frames;
  *n_cams = m->hdr.n_cams;
  *height = m->hdr.height;
  *width = m->hdr.width;
  return m;
}

// Convert frame i to float32 [0,1] into out (n_cams*H*W floats).
int mcraw_read(void* handle, long i, float* out) {
  Mcraw* m = (Mcraw*)handle;
  if (i < 0 || (uint32_t)i >= m->hdr.n_frames) return -1;
  const size_t fsz =
      (size_t)m->hdr.n_cams * m->hdr.height * m->hdr.width;
  const uint8_t* src = m->base + sizeof(McrawHeader) + (size_t)i * fsz;
  const float s = 1.0f / 255.0f;
  for (size_t k = 0; k < fsz; ++k) out[k] = src[k] * s;
  return 0;
}

void mcraw_close(void* handle) {
  Mcraw* m = (Mcraw*)handle;
  if (m->base) munmap((void*)m->base, m->bytes);
  if (m->fd >= 0) close(m->fd);
  delete m;
}

}  // extern "C"
