// Native data-loader core: threaded JPEG/PNG decode + bilinear letterbox.
//
// The reference's input path is cv2.imread + albumentations resize on the
// Python thread (train.py:145-149, :67-75) — C++ underneath, but re-run for
// every sample every epoch.  This library is the framework's own native
// loader: direct libjpeg/libpng decode into caller-owned buffers, fused
// RGB conversion + half-pixel bilinear resize + centered/corner letterbox
// (the same three conventions as ops/image.py), and a pthread pool for
// batch decode that feeds the device prefetch queue.
//
// C ABI via ctypes (vickers_tpu/native/__init__.py).  Gated: if this .so is
// absent the Python loader falls back to cv2 with identical semantics.

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cfenv>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, RGB
};

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, Image& out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.h = cinfo.output_height;
  out.w = cinfo.output_width;
  out.c = 3;
  out.data.resize(size_t(out.h) * out.w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = &out.data[size_t(cinfo.output_scanline) * out.w * 3];
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, Image& out) {
  uint8_t sig[8];
  if (fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
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
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  // normalize to 8-bit RGB
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out.h = png_get_image_height(png, info);
  out.w = png_get_image_width(png, info);
  out.c = 3;
  out.data.resize(size_t(out.h) * out.w * 3);
  std::vector<png_bytep> rows(out.h);
  for (int y = 0; y < out.h; ++y)
    rows[y] = &out.data[size_t(y) * out.w * 3];
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image& out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[2] = {0, 0};
  if (fread(magic, 1, 2, f) != 2) {
    fclose(f);
    return false;
  }
  rewind(f);
  bool ok = false;
  if (magic[0] == 0xFF && magic[1] == 0xD8) ok = decode_jpeg(f, out);
  else if (magic[0] == 0x89 && magic[1] == 'P') ok = decode_png(f, out);
  fclose(f);
  return ok;
}

// cv2 INTER_LINEAR parity: half-pixel centers, edge clamp, round-half-up.
void resize_bilinear_rgb(const Image& src, int oh, int ow, uint8_t* dst) {
  double sy = double(src.h) / oh, sx = double(src.w) / ow;
  std::vector<int> x0s(ow), x1s(ow);
  std::vector<float> fxs(ow);
  for (int x = 0; x < ow; ++x) {
    double fx = (x + 0.5) * sx - 0.5;
    int x0 = int(std::floor(fx));
    fxs[x] = float(fx - x0);
    x0s[x] = std::min(std::max(x0, 0), src.w - 1);
    x1s[x] = std::min(std::max(x0 + 1, 0), src.w - 1);
  }
  for (int y = 0; y < oh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    int y0 = int(std::floor(fy));
    float dy = float(fy - y0);
    int y0c = std::min(std::max(y0, 0), src.h - 1);
    int y1c = std::min(std::max(y0 + 1, 0), src.h - 1);
    const uint8_t* r0 = &src.data[size_t(y0c) * src.w * 3];
    const uint8_t* r1 = &src.data[size_t(y1c) * src.w * 3];
    uint8_t* out = &dst[size_t(y) * ow * 3];
    for (int x = 0; x < ow; ++x) {
      float dx = fxs[x];
      int a = x0s[x] * 3, b = x1s[x] * 3;
      for (int ch = 0; ch < 3; ++ch) {
        float top = r0[a + ch] * (1 - dx) + r0[b + ch] * dx;
        float bot = r1[a + ch] * (1 - dx) + r1[b + ch] * dx;
        float v = top * (1 - dy) + bot * dy;
        out[x * 3 + ch] = uint8_t(std::min(255.0f, std::max(0.0f, v + 0.5f)));
      }
    }
  }
}

// letterbox mode: 0 = center_no_upscale, 1 = center_upscale, 2 = corner_upscale
void letterbox(const Image& src, int size, int mode, uint8_t* out /*size*size*3*/) {
  double scale;
  if (mode == 0) scale = std::min(double(size) / std::max(src.h, src.w), 1.0);
  else if (mode == 1) scale = double(size) / std::max(src.h, src.w);
  else scale = std::min(double(size) / src.h, double(size) / src.w);
  auto round_half_even = [](double v) {  // python round() parity
    double r = std::nearbyint(v);
    return int(r);
  };
  std::fesetround(FE_TONEAREST);
  int nh = round_half_even(src.h * scale), nw = round_half_even(src.w * scale);
  nh = std::max(1, std::min(nh, size));
  nw = std::max(1, std::min(nw, size));
  std::vector<uint8_t> rs(size_t(nh) * nw * 3);
  if (nh == src.h && nw == src.w)
    std::memcpy(rs.data(), src.data.data(), rs.size());
  else
    resize_bilinear_rgb(src, nh, nw, rs.data());
  int top = (mode == 2) ? 0 : (size - nh) / 2;
  int left = (mode == 2) ? 0 : (size - nw) / 2;
  std::memset(out, 0, size_t(size) * size * 3);
  for (int y = 0; y < nh; ++y)
    std::memcpy(&out[(size_t(y + top) * size + left) * 3],
                &rs[size_t(y) * nw * 3], size_t(nw) * 3);
}

}  // namespace

extern "C" {

// Decode one file; resize+letterbox to (size, size, 3) RGB uint8.
// Returns 0 on success; fills orig_h/orig_w.
int vk_decode_letterbox(const char* path, int size, int mode, uint8_t* out,
                        int* orig_h, int* orig_w) {
  Image img;
  if (!decode_file(path, img)) return 1;
  *orig_h = img.h;
  *orig_w = img.w;
  letterbox(img, size, mode, out);
  return 0;
}

// Batch decode with a thread pool.  paths: array of n C strings; out:
// n*size*size*3 bytes.  Returns the number of failures.
int vk_decode_batch(const char** paths, int n, int size, int mode,
                    uint8_t* out, int* orig_hw /* n*2 */, int threads) {
  std::atomic<int> next{0}, failures{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int h = 0, w = 0;
      if (vk_decode_letterbox(paths[i], size, mode,
                              out + size_t(i) * size * size * 3, &h, &w))
        failures.fetch_add(1);
      orig_hw[i * 2] = h;
      orig_hw[i * 2 + 1] = w;
    }
  };
  int t = std::max(1, threads);
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
