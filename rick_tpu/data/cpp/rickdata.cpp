// Native data-loader runtime for rick-tpu.
//
// TPU-native counterpart of the reference's torch DataLoader worker pool
// (train_dynamic_update_prune.py:823-843): an mmap'd record-store reader with
// a multithreaded PNG/JPEG decode + resize + crop + normalize pipeline that
// fills caller-provided float32 NCHW buffers, exposed through a C ABI for
// ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -shared -fPIC rickdata.cpp -o librickdata.so -lpng -ljpeg -lpthread
//
// Record-store layout (see rick_tpu/data/store.py):
//   [8s magic "RICKRDB1"][u64 n][n x (u64 offset, u64 length)][blobs...]

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <csetjmp>
#include <jpeglib.h>
#include <png.h>

namespace {

struct Store {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t count = 0;
  const uint64_t* table = nullptr;  // (offset, length) pairs
};

constexpr char kMagic[8] = {'R', 'I', 'C', 'K', 'R', 'D', 'B', '1'};

struct Image {
  std::vector<uint8_t> rgb;  // HWC, 3 channels
  int h = 0, w = 0;
};

// ---------------------------------------------------------------------------
// PNG decode (libpng, from memory)
// ---------------------------------------------------------------------------

struct PngReadState {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto* st = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (st->pos + n > st->size) {
    png_error(png, "read past end");
  }
  std::memcpy(out, st->data + st->pos, n);
  st->pos += n;
}

bool decode_png(const uint8_t* data, size_t size, Image* img) {
  if (size < 8 || png_sig_cmp(data, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
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
  PngReadState st{data, size, 0};
  png_set_read_fn(png, &st, png_read_fn);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);

  // normalize to 8-bit RGB
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  img->w = static_cast<int>(w);
  img->h = static_cast<int>(h);
  img->rgb.resize(static_cast<size_t>(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = img->rgb.data() + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg, from memory)
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  std::longjmp(err->jmp, 1);
}

bool decode_jpeg(const uint8_t* data, size_t size, Image* img) {
  if (size < 2 || data[0] != 0xFF || data[1] != 0xD8) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img->w = cinfo.output_width;
  img->h = cinfo.output_height;
  img->rgb.resize(static_cast<size_t>(img->w) * img->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img->rgb.data() + static_cast<size_t>(cinfo.output_scanline) * img->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_image(const uint8_t* data, size_t size, Image* img) {
  return decode_png(data, size, img) || decode_jpeg(data, size, img);
}

// ---------------------------------------------------------------------------
// Resize (bilinear, half-pixel centers -- matches cv2.INTER_LINEAR), crop,
// flip, normalize to CHW float32 in [-1, 1]
// ---------------------------------------------------------------------------

void resize_bilinear(const Image& src, int nh, int nw, Image* dst) {
  dst->h = nh;
  dst->w = nw;
  dst->rgb.resize(static_cast<size_t>(nh) * nw * 3);
  const float sy = static_cast<float>(src.h) / nh;
  const float sx = static_cast<float>(src.w) / nw;
  for (int y = 0; y < nh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= src.h ? src.h - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= src.h ? src.h - 1 : y0 + 1);
    const uint8_t* r0 = src.rgb.data() + static_cast<size_t>(y0c) * src.w * 3;
    const uint8_t* r1 = src.rgb.data() + static_cast<size_t>(y1c) * src.w * 3;
    uint8_t* out = dst->rgb.data() + static_cast<size_t>(y) * nw * 3;
    for (int x = 0; x < nw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= src.w ? src.w - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= src.w ? src.w - 1 : x0 + 1);
      for (int c = 0; c < 3; ++c) {
        float top = r0[x0c * 3 + c] * (1 - wx) + r0[x1c * 3 + c] * wx;
        float bot = r1[x0c * 3 + c] * (1 - wx) + r1[x1c * 3 + c] * wx;
        float v = top * (1 - wy) + bot * wy;
        out[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Decode one blob into out (3*size*size floats, CHW, [-1,1]).
bool process_one(const uint8_t* blob, size_t len, int size, bool flip, float* out) {
  Image img;
  if (!decode_image(blob, len, &img)) return false;

  Image resized;
  const Image* cur = &img;
  if (std::min(img.h, img.w) != size) {
    int nh, nw;
    if (img.h < img.w) {
      nh = size;
      nw = std::max(1, static_cast<int>(std::lround(static_cast<double>(img.w) * size / img.h)));
    } else {
      nw = size;
      nh = std::max(1, static_cast<int>(std::lround(static_cast<double>(img.h) * size / img.w)));
    }
    resize_bilinear(img, nh, nw, &resized);
    cur = &resized;
  }

  int top = (cur->h - size) / 2;
  int left = (cur->w - size) / 2;
  const float inv = 1.0f / 127.5f;
  for (int y = 0; y < size; ++y) {
    const uint8_t* row = cur->rgb.data() + (static_cast<size_t>(top + y) * cur->w + left) * 3;
    for (int x = 0; x < size; ++x) {
      int sx = flip ? (size - 1 - x) : x;
      const uint8_t* px = row + sx * 3;
      for (int c = 0; c < 3; ++c) {
        out[(static_cast<size_t>(c) * size + y) * size + x] = px[c] * inv - 1.0f;
      }
    }
  }
  return true;
}

}  // namespace

extern "C" {

void* rd_open(const char* path) {
  std::string file = std::string(path) + "/records.rdb";
  int fd = ::open(file.c_str(), O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* s = new Store();
  s->fd = fd;
  s->base = static_cast<const uint8_t*>(base);
  s->size = st.st_size;
  if (s->size < 16 || std::memcmp(s->base, kMagic, 8) != 0) {
    munmap(base, st.st_size);
    ::close(fd);
    delete s;
    return nullptr;
  }
  std::memcpy(&s->count, s->base + 8, 8);
  s->table = reinterpret_cast<const uint64_t*>(s->base + 16);
  return s;
}

void rd_close(void* handle) {
  auto* s = static_cast<Store*>(handle);
  if (!s) return;
  munmap(const_cast<uint8_t*>(s->base), s->size);
  ::close(s->fd);
  delete s;
}

int64_t rd_count(void* handle) {
  return static_cast<Store*>(handle)->count;
}

int rd_get(void* handle, int64_t idx, const uint8_t** ptr, uint64_t* len) {
  auto* s = static_cast<Store*>(handle);
  if (idx < 0 || static_cast<uint64_t>(idx) >= s->count) return -1;
  uint64_t off = s->table[2 * idx];
  uint64_t n = s->table[2 * idx + 1];
  if (off + n > s->size) return -2;
  *ptr = s->base + off;
  *len = n;
  return 0;
}

// Decode a batch: indices[n], flips[n] (0/1), out (n*3*size*size floats).
// Returns 0 on success, else the 1-based index of the first failed record.
int rd_decode_batch(void* handle, const int64_t* indices, int n, int size,
                    const uint8_t* flips, float* out, int n_threads) {
  auto* s = static_cast<Store*>(handle);
  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  const size_t stride = static_cast<size_t>(3) * size * size;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      const uint8_t* blob;
      uint64_t len;
      if (rd_get(s, indices[i], &blob, &len) != 0 ||
          !process_one(blob, len, size, flips[i] != 0, out + stride * i)) {
        failed.store(i + 1);
        return;
      }
    }
  };

  int nt = n_threads > 0 ? n_threads : 1;
  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return failed.load();
}

}  // extern "C"
