// GIVEPose-TPU native host runtime.
//
// The reference offloads its host hot path to torch DataLoader worker
// processes (engine/train.py:111-113) running cv2/imgaug C++ under Python
// glue. This library is the equivalent runtime component for the TPU
// rebuild: PNG decode (libpng), NOCS map decoding, affine crop/resize,
// mask morphology, and a threaded record prefetcher — all exposed through
// a C ABI consumed via ctypes (no pybind11 in this image).
//
// Everything operates on caller-owned buffers; no global state except the
// loader pool object.

#include <png.h>
#include <zlib.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------

// Decode an 8-bit PNG into an interleaved RGB(A->RGB) uint8 buffer.
// Returns 0 on success; fills *out_h, *out_w, *out_c (c is always 3).
// `out` must hold max_h*max_w*3 bytes.
int gp_decode_png_rgb(const char* path, uint8_t* out, int max_h, int max_w,
                      int* out_h, int* out_w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                             nullptr);
  if (!png) { std::fclose(fp); return -2; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr);
               std::fclose(fp); return -2; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  if ((int)h > max_h || (int)w > max_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -4;
  }
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = out + (size_t)y * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  *out_h = (int)h;
  *out_w = (int)w;
  return 0;
}

// Decode a 16-bit (or composite 8-bit RGB) depth PNG into uint16.
// Composite rule (reference tools/eval_utils.py:141-155): if the file is
// RGB, depth = G*256 + B, with 32001 -> 0.
int gp_decode_png_depth(const char* path, uint16_t* out, int max_h,
                        int max_w, int* out_h, int* out_w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                             nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);
  if ((int)h > max_h || (int)w > max_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -4;
  }

  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth == 16) {
    png_set_swap(png);  // PNG is big-endian
    png_read_update_info(png, info);
    std::vector<png_bytep> rows(h);
    for (png_uint_32 y = 0; y < h; ++y)
      rows[y] = reinterpret_cast<png_bytep>(out + (size_t)y * w);
    png_read_image(png, rows.data());
  } else {
    // composite RGB: decode 8-bit rgb then combine channels
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    if (color_type == PNG_COLOR_TYPE_GRAY) png_set_gray_to_rgb(png);
    png_read_update_info(png, info);
    std::vector<uint8_t> rgb((size_t)h * w * 3);
    std::vector<png_bytep> rows(h);
    for (png_uint_32 y = 0; y < h; ++y)
      rows[y] = rgb.data() + (size_t)y * w * 3;
    png_read_image(png, rows.data());
    for (size_t i = 0; i < (size_t)h * w; ++i) {
      // note: cv2 loads BGR, so its G,B == our G,B channels (indices 1,2
      // from the R,G,B triplet); the composite uses G*256 + B.
      uint32_t v = (uint32_t)rgb[i * 3 + 1] * 256 + rgb[i * 3 + 2];
      out[i] = (v == 32001) ? 0 : (uint16_t)v;
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  *out_h = (int)h;
  *out_w = (int)w;
  return 0;
}

// ---------------------------------------------------------------------------
// NOCS decode: RGB uint8 -> float32 [-0.5, 0.5] with z-flip + optional
// mug re-centering + mask zeroing (reference load_data_nocs.py:251-292).
// ---------------------------------------------------------------------------
void gp_decode_nocs(const uint8_t* rgb, const uint8_t* mask_eq, int h,
                    int w, float mug_t0, float mug_t1, float mug_t2,
                    float mug_s0, float* out) {
  const float inv255 = 1.0f / 255.0f;
  for (int i = 0; i < h * w; ++i) {
    float x = rgb[i * 3 + 0] * inv255 - 0.5f;
    float y = rgb[i * 3 + 1] * inv255 - 0.5f;
    float z = (1.0f - rgb[i * 3 + 2] * inv255) - 0.5f;
    x = mug_s0 * (x + mug_t0);
    y = mug_s0 * (y + mug_t1);
    z = mug_s0 * (z + mug_t2);
    if (mask_eq && !mask_eq[i]) { x = 0; y = 0; z = 0; }
    out[i * 3 + 0] = x;
    out[i * 3 + 1] = y;
    out[i * 3 + 2] = z;
  }
}

// ---------------------------------------------------------------------------
// Affine crop/resize (square scale+translate; rot==0 on all reference
// paths). Matches cv2.warpAffine BORDER_CONSTANT(0) with INTER_NEAREST /
// INTER_LINEAR; src = (dst - out/2) * scale/out + center.
// ---------------------------------------------------------------------------
void gp_affine_crop_f32(const float* src, int h, int w, int c, float cx,
                        float cy, float scale, float* dst, int out_size,
                        int bilinear) {
  const float a = scale / out_size;
  const float bx = cx - 0.5f * out_size * a;
  const float by = cy - 0.5f * out_size * a;
  for (int j = 0; j < out_size; ++j) {
    const float sy = a * j + by;
    for (int i = 0; i < out_size; ++i) {
      const float sx = a * i + bx;
      float* o = dst + ((size_t)j * out_size + i) * c;
      if (!bilinear) {
        int xi = (int)std::floor(sx + 0.5f);
        int yi = (int)std::floor(sy + 0.5f);
        if (xi < 0 || xi >= w || yi < 0 || yi >= h) {
          std::memset(o, 0, sizeof(float) * c);
        } else {
          std::memcpy(o, src + ((size_t)yi * w + xi) * c,
                      sizeof(float) * c);
        }
      } else {
        int x0 = (int)std::floor(sx), y0 = (int)std::floor(sy);
        float fx = sx - x0, fy = sy - y0;
        for (int k = 0; k < c; ++k) {
          float acc = 0.0f;
          for (int dy = 0; dy < 2; ++dy) {
            for (int dx = 0; dx < 2; ++dx) {
              int xx = x0 + dx, yy = y0 + dy;
              if (xx < 0 || xx >= w || yy < 0 || yy >= h) continue;
              float wgt = (dx ? fx : 1 - fx) * (dy ? fy : 1 - fy);
              acc += wgt * src[((size_t)yy * w + xx) * c + k];
            }
          }
          o[k] = acc;
        }
      }
    }
  }
}

// uint8 variant (images) producing float32 output.
void gp_affine_crop_u8(const uint8_t* src, int h, int w, int c, float cx,
                       float cy, float scale, float* dst, int out_size,
                       int bilinear) {
  std::vector<float> tmp((size_t)h * w * c);
  for (size_t i = 0; i < tmp.size(); ++i) tmp[i] = (float)src[i];
  gp_affine_crop_f32(tmp.data(), h, w, c, cx, cy, scale, dst, out_size,
                     bilinear);
}

// ---------------------------------------------------------------------------
// Mask morphology band: 2x2 dilate != 2x2 erode (defor_2D's change set,
// reference data_augmentation.py:20-30). Caller applies the random fill.
// ---------------------------------------------------------------------------
void gp_mask_band(const float* mask, int h, int w, uint8_t* band) {
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      // cv2's even-kernel anchor reads the window (y-1..y, x-1..x);
      // out-of-bounds uses the morphology identity (skip), matching
      // cv2's morphologyDefaultBorderValue
      float mn = 1e30f, mx = -1e30f;
      for (int dy = -1; dy < 1; ++dy) {
        for (int dx = -1; dx < 1; ++dx) {
          int yy = y + dy, xx = x + dx;
          if (yy < 0 || yy >= h || xx < 0 || xx >= w) continue;
          float v = mask[yy * w + xx];
          mn = v < mn ? v : mn;
          mx = v > mx ? v : mx;
        }
      }
      band[y * w + x] = (mx != mn) ? 1 : 0;
    }
  }
}

// ---------------------------------------------------------------------------
// Threaded prefetch pool: decode RGB PNGs ahead of the consumer.
// ---------------------------------------------------------------------------
struct GpLoader {
  std::vector<std::string> paths;
  int max_h, max_w;
  std::queue<int> work;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  // index -> decoded buffer
  std::vector<std::vector<uint8_t>> results;
  std::vector<int> dims;      // h,w per index
  std::vector<std::atomic<int>> state;  // 0 pending 1 done -1 error
  std::vector<std::thread> threads;
  std::atomic<bool> stop{false};
};

void* gp_loader_create(const char** paths, int n_paths, int max_h,
                       int max_w, int n_threads) {
  auto* L = new GpLoader();
  L->max_h = max_h;
  L->max_w = max_w;
  L->paths.assign(paths, paths + n_paths);
  L->results.resize(n_paths);
  L->dims.resize((size_t)n_paths * 2);
  L->state = std::vector<std::atomic<int>>(n_paths);
  for (int i = 0; i < n_paths; ++i) {
    L->state[i] = 0;
    L->work.push(i);
  }
  auto worker = [L]() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(L->mu);
        L->cv_work.wait(lk, [L] { return L->stop || !L->work.empty(); });
        if (L->stop && L->work.empty()) return;
        idx = L->work.front();
        L->work.pop();
      }
      auto& buf = L->results[idx];
      buf.resize((size_t)L->max_h * L->max_w * 3);
      int h = 0, w = 0;
      int rc = gp_decode_png_rgb(L->paths[idx].c_str(), buf.data(),
                                 L->max_h, L->max_w, &h, &w);
      L->dims[idx * 2] = h;
      L->dims[idx * 2 + 1] = w;
      L->state[idx] = (rc == 0) ? 1 : -1;
      L->cv_done.notify_all();
    }
  };
  for (int t = 0; t < n_threads; ++t) L->threads.emplace_back(worker);
  return L;
}

// Blocks until item `idx` decoded; copies into `out`; returns 0/neg.
int gp_loader_get(void* handle, int idx, uint8_t* out, int* out_h,
                  int* out_w) {
  auto* L = static_cast<GpLoader*>(handle);
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_done.wait(lk, [L, idx] { return L->state[idx] != 0; });
  }
  if (L->state[idx] < 0) return -1;
  int h = L->dims[idx * 2], w = L->dims[idx * 2 + 1];
  std::memcpy(out, L->results[idx].data(), (size_t)h * w * 3);
  std::vector<uint8_t>().swap(L->results[idx]);  // free
  *out_h = h;
  *out_w = w;
  return 0;
}

void gp_loader_destroy(void* handle) {
  auto* L = static_cast<GpLoader*>(handle);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_work.notify_all();
  for (auto& t : L->threads) t.join();
  delete L;
}

int gp_version() { return 1; }

}  // extern "C"
