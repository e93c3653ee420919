// Native host-side runtime for the TPU SLAM engine.
//
// Counterpart of the C++ driver layer of the reference
// (Examples/Stereo-Inertial/stereo_inertial_euroc.cc: imread + remap +
// real-time feeding loop): PNG/PGM grayscale decode, bilinear remap
// (cv::remap equivalent), and a threaded prefetch feeder that decodes and
// rectifies frames ahead of the tracker so host I/O never blocks the
// device pipeline.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <png.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PNG / PGM decode to float32 grayscale [0,255]
// ---------------------------------------------------------------------------

// Returns 0 on success. Caller passes a buffer of capacity cap_h*cap_w;
// actual dims written to out_h/out_w.
int decode_gray(const char* path, float* out, int cap_h, int cap_w,
                int* out_h, int* out_w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  unsigned char sig[8];
  if (std::fread(sig, 1, 8, fp) != 8) {
    std::fclose(fp);
    return 2;
  }
  // PGM (P5) path: KITTI grayscale and many SLAM datasets
  if (sig[0] == 'P' && (sig[1] == '5' || sig[1] == '2')) {
    std::fseek(fp, 0, SEEK_SET);
    char magic[3] = {0};
    int w = 0, h = 0, maxv = 0;
    if (std::fscanf(fp, "%2s", magic) != 1) { std::fclose(fp); return 3; }
    auto skip_ws_comments = [&]() {
      int c;
      while ((c = std::fgetc(fp)) != EOF) {
        if (c == '#') {
          while ((c = std::fgetc(fp)) != EOF && c != '\n') {}
        } else if (!isspace(c)) {
          std::ungetc(c, fp);
          break;
        }
      }
    };
    skip_ws_comments();
    if (std::fscanf(fp, "%d", &w) != 1) { std::fclose(fp); return 3; }
    skip_ws_comments();
    if (std::fscanf(fp, "%d", &h) != 1) { std::fclose(fp); return 3; }
    skip_ws_comments();
    if (std::fscanf(fp, "%d", &maxv) != 1) { std::fclose(fp); return 3; }
    std::fgetc(fp);  // single whitespace after maxval
    if (h > cap_h || w > cap_w) { std::fclose(fp); return 4; }
    std::vector<unsigned char> row(w * (maxv > 255 ? 2 : 1));
    for (int y = 0; y < h; ++y) {
      if (std::fread(row.data(), 1, row.size(), fp) != row.size()) {
        std::fclose(fp);
        return 5;
      }
      float* dst = out + (size_t)y * cap_w;
      if (maxv > 255) {
        for (int x = 0; x < w; ++x) {
          dst[x] = (float)((row[2 * x] << 8) | row[2 * x + 1]) * 255.0f /
                   (float)maxv;
        }
      } else {
        for (int x = 0; x < w; ++x) dst[x] = (float)row[x];
      }
    }
    std::fclose(fp);
    *out_h = h;
    *out_w = w;
    return 0;
  }
  if (png_sig_cmp(sig, 0, 8)) {
    std::fclose(fp);
    return 6;  // not PNG either
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 7;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (h > cap_h || w > cap_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 4;
  }
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  png_read_update_info(png, info);
  int channels = png_get_channels(png, info);
  depth = png_get_bit_depth(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<unsigned char> row(rowbytes);
  const float bgr[3] = {0.299f, 0.587f, 0.114f};  // cvtColor RGB2GRAY weights
  for (int y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out + (size_t)y * cap_w;
    if (depth == 16) {
      for (int x = 0; x < w; ++x) {
        if (channels == 1) {
          uint16_t v = (row[2 * x] << 8) | row[2 * x + 1];
          dst[x] = (float)v / 257.0f;  // 16-bit gray -> [0,255]
        } else {
          float acc = 0.f;
          for (int c = 0; c < 3; ++c) {
            uint16_t v = (row[2 * (x * channels + c)] << 8) |
                         row[2 * (x * channels + c) + 1];
            acc += bgr[c] * (float)v / 257.0f;
          }
          dst[x] = acc;
        }
      }
    } else {
      for (int x = 0; x < w; ++x) {
        if (channels == 1) {
          dst[x] = (float)row[x];
        } else {
          const unsigned char* p = row.data() + x * channels;
          dst[x] = bgr[0] * p[0] + bgr[1] * p[1] + bgr[2] * p[2];
        }
      }
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  *out_h = h;
  *out_w = w;
  return 0;
}

// ---------------------------------------------------------------------------
// Bilinear remap (cv::remap equivalent)
// ---------------------------------------------------------------------------

void remap_bilinear(const float* img, int h, int w, const float* map_x,
                    const float* map_y, float* out) {
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const size_t i = (size_t)y * w + x;
      const float mx = map_x[i], my = map_y[i];
      if (mx < 0.f || my < 0.f || mx > (float)(w - 1) ||
          my > (float)(h - 1)) {
        out[i] = 0.f;
        continue;
      }
      const int x0 = (int)mx, y0 = (int)my;
      const int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      const int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
      const float fx = mx - (float)x0, fy = my - (float)y0;
      const float a = img[(size_t)y0 * w + x0];
      const float b = img[(size_t)y0 * w + x1];
      const float c = img[(size_t)y1 * w + x0];
      const float d = img[(size_t)y1 * w + x1];
      out[i] = a * (1.f - fx) * (1.f - fy) + b * fx * (1.f - fy) +
               c * (1.f - fx) * fy + d * fx * fy;
    }
  }
}

// ---------------------------------------------------------------------------
// Prefetching stereo feeder
// ---------------------------------------------------------------------------
//
// The reference's driver thread does imread+remap inline at sensor rate
// (stereo_inertial_euroc.cc:176-234). Here a worker pool decodes + rectifies
// frames ahead into a bounded queue, so the Python tracking loop only ever
// memcpy's a ready frame.

// Worker threads race to claim the next frame index and write into an
// indexed ring of slots; the consumer takes frames strictly in order.
struct Feeder2 {
  std::vector<std::string> left, right;
  std::vector<float> map_lx, map_ly, map_rx, map_ry;
  int h = 0, w = 0;
  int depth = 6;
  std::atomic<size_t> claim{0};
  std::atomic<bool> stop{false};
  std::atomic<size_t> consumed{0};
  struct Slot {
    std::vector<float> l, r;
    std::atomic<int> state{0};  // 0 empty, 1 writing, 2 ready
    int status = 0;
  };
  std::vector<Slot> ring;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;

  void worker() {
    std::vector<float> tmp((size_t)h * w);
    while (!stop.load()) {
      size_t idx = claim.fetch_add(1);
      if (idx >= left.size()) break;
      // wait until the slot for idx is free (consumer caught up)
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop.load() || idx < consumed.load() + ring.size();
        });
        if (stop.load()) break;
      }
      Slot& s = ring[idx % ring.size()];
      int st = 0;
      int hh, ww;
      if (map_lx.empty()) {
        st |= decode_gray(left[idx].c_str(), s.l.data(), h, w, &hh, &ww);
      } else {
        st |= decode_gray(left[idx].c_str(), tmp.data(), h, w, &hh, &ww);
        remap_bilinear(tmp.data(), h, w, map_lx.data(), map_ly.data(),
                       s.l.data());
      }
      if (!right.empty()) {
        if (map_rx.empty()) {
          st |= decode_gray(right[idx].c_str(), s.r.data(), h, w, &hh, &ww);
        } else {
          st |= decode_gray(right[idx].c_str(), tmp.data(), h, w, &hh, &ww);
          remap_bilinear(tmp.data(), h, w, map_rx.data(), map_ry.data(),
                         s.r.data());
        }
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        s.status = st;
        s.state.store(2);
      }
      cv_ready.notify_all();
    }
  }
};

void* feeder_create(const char** left_paths, const char** right_paths,
                    int n_frames, int h, int w, const float* map_lx,
                    const float* map_ly, const float* map_rx,
                    const float* map_ry, int depth, int n_workers) {
  auto* f = new Feeder2();
  f->h = h;
  f->w = w;
  f->depth = depth;
  for (int i = 0; i < n_frames; ++i) {
    f->left.emplace_back(left_paths[i]);
    if (right_paths) f->right.emplace_back(right_paths[i]);
  }
  const size_t npx = (size_t)h * w;
  if (map_lx) {
    f->map_lx.assign(map_lx, map_lx + npx);
    f->map_ly.assign(map_ly, map_ly + npx);
  }
  if (map_rx) {
    f->map_rx.assign(map_rx, map_rx + npx);
    f->map_ry.assign(map_ry, map_ry + npx);
  }
  f->ring = std::vector<Feeder2::Slot>(depth);
  for (auto& s : f->ring) {
    s.l.resize(npx);
    if (right_paths) s.r.resize(npx);
  }
  for (int i = 0; i < n_workers; ++i)
    f->workers.emplace_back(&Feeder2::worker, f);
  return f;
}

// Blocks until frame idx (must be consumed in order) is decoded; copies into
// out_l/out_r. Returns decode status (0 ok).
int feeder_next(void* handle, float* out_l, float* out_r) {
  auto* f = static_cast<Feeder2*>(handle);
  size_t idx = f->consumed.load();
  if (idx >= f->left.size()) return -1;
  Feeder2::Slot& s = f->ring[idx % f->ring.size()];
  {
    std::unique_lock<std::mutex> lk(f->mu);
    f->cv_ready.wait(lk, [&] { return s.state.load() == 2; });
  }
  const size_t npx = (size_t)f->h * f->w;
  std::memcpy(out_l, s.l.data(), npx * sizeof(float));
  if (out_r && !s.r.empty())
    std::memcpy(out_r, s.r.data(), npx * sizeof(float));
  int st = s.status;
  {
    std::lock_guard<std::mutex> lk(f->mu);
    s.state.store(0);
    f->consumed.fetch_add(1);
  }
  f->cv_space.notify_all();
  return st;
}

void feeder_destroy(void* handle) {
  auto* f = static_cast<Feeder2*>(handle);
  f->stop.store(true);
  f->cv_space.notify_all();
  f->cv_ready.notify_all();
  for (auto& t : f->workers) t.join();
  delete f;
}

}  // extern "C"
