// tpugan native IO: threaded PNG decode + resize batch loader.
//
// The reference loads images one-by-one through PIL on the Python main
// thread (training_utils.py:10-15). This library decodes a whole directory
// batch in parallel worker threads (libpng + zlib) and writes float32
// [0,1] NHWC directly into a caller-provided buffer, keeping the host-side
// input pipeline off the critical path of TPU step dispatch.
//
// C API (ctypes-friendly):
//   tg_decode_png(path, out_f32, H, W)   decode + bilinear-resize to HxW RGB
//   tg_load_batch(paths, n, H, W, out, n_threads)  parallel batch load
// Both return 0 on success, negative error codes otherwise.

#include <png.h>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<unsigned char> rgb;  // H*W*3
  int w = 0, h = 0;
};

int decode_png_rgb(const char* path, Image* img) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  unsigned char header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return -2;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(fp); return -3; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(fp); return -3; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -4;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);

  // normalize everything to 8-bit RGB
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  img->w = (int)w;
  img->h = (int)h;
  img->rgb.resize((size_t)w * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = img->rgb.data() + (size_t)y * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// bilinear resize HxWx3 u8 -> out_h x out_w x3 f32 in [0,1]
void resize_to_f32(const Image& img, int out_h, int out_w, float* out) {
  const float sy = img.h > 1 && out_h > 1 ? (float)(img.h - 1) / (out_h - 1) : 0.f;
  const float sx = img.w > 1 && out_w > 1 ? (float)(img.w - 1) / (out_w - 1) : 0.f;
  for (int oy = 0; oy < out_h; ++oy) {
    float fy = oy * sy;
    int y0 = (int)fy;
    int y1 = y0 + 1 < img.h ? y0 + 1 : y0;
    float wy = fy - y0;
    for (int ox = 0; ox < out_w; ++ox) {
      float fx = ox * sx;
      int x0 = (int)fx;
      int x1 = x0 + 1 < img.w ? x0 + 1 : x0;
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = img.rgb[((size_t)y0 * img.w + x0) * 3 + c];
        float v01 = img.rgb[((size_t)y0 * img.w + x1) * 3 + c];
        float v10 = img.rgb[((size_t)y1 * img.w + x0) * 3 + c];
        float v11 = img.rgb[((size_t)y1 * img.w + x1) * 3 + c];
        float top = v00 + (v01 - v00) * wx;
        float bot = v10 + (v11 - v10) * wx;
        out[((size_t)oy * out_w + ox) * 3 + c] = (top + (bot - top) * wy) / 255.0f;
      }
    }
  }
}

}  // namespace

extern "C" {

int tg_decode_png(const char* path, float* out, int out_h, int out_w) {
  Image img;
  int rc = decode_png_rgb(path, &img);
  if (rc != 0) return rc;
  resize_to_f32(img, out_h, out_w, out);
  return 0;
}

// parallel batch load: paths[n] -> out [n, out_h, out_w, 3] float32
int tg_load_batch(const char** paths, int n, int out_h, int out_w, float* out,
                  int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> err(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int rc = tg_decode_png(paths[i], out + (size_t)i * out_h * out_w * 3, out_h, out_w);
      if (rc != 0) err.store(rc);
    }
  };
  std::vector<std::thread> threads;
  int nt = n_threads < n ? n_threads : n;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return err.load();
}

}  // extern "C"
