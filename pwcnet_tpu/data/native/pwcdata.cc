// Native data-loading core for pwcnet_tpu.
//
// The reference delegates decoding/augmentation to torch DataLoader worker
// processes (train.py:36-41). Here the hot host path — PPM (P6) decode,
// Middlebury .flo parsing, crop/flip augmentation, uint8->float32
// normalization, and batch assembly — is a small C++ library driven from
// Python via ctypes (pwcnet_tpu/data/native/__init__.py). A pthread worker
// pool decodes batch samples concurrently so file I/O overlaps with the
// TPU step even on low-core hosts.
//
// Layouts (row-major, C-contiguous):
//   images_out: (batch, 2, crop_h, crop_w, 3) float32 in [0, 1]
//   flows_out:  (batch, crop_h, crop_w, 2)    float32 pixels
//
// Error codes: 0 ok; negative = -(errno-ish) documented per function.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float kFloMagic = 202021.25f;

struct Image {
  std::vector<uint8_t> data;  // h*w*3
  int h = 0, w = 0;
};

struct Flow {
  std::vector<float> data;  // h*w*2
  int h = 0, w = 0;
};

// -------- PPM (P6, binary, maxval 255) ------------------------------------
int ReadToken(FILE* f, char* buf, int cap) {
  int c;
  // skip whitespace and comments
  while ((c = fgetc(f)) != EOF) {
    if (c == '#') {
      while ((c = fgetc(f)) != EOF && c != '\n') {
      }
    } else if (!isspace(c)) {
      break;
    }
  }
  if (c == EOF) return -1;
  int n = 0;
  do {
    if (n + 1 >= cap) return -1;
    buf[n++] = static_cast<char>(c);
  } while ((c = fgetc(f)) != EOF && !isspace(c));
  buf[n] = '\0';
  return 0;
}

int ReadPpm(const char* path, Image* img) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char tok[32];
  if (ReadToken(f, tok, sizeof tok) || strcmp(tok, "P6") != 0) {
    fclose(f);
    return -2;  // not binary PPM
  }
  int w, h, maxval;
  if (ReadToken(f, tok, sizeof tok)) { fclose(f); return -3; }
  w = atoi(tok);
  if (ReadToken(f, tok, sizeof tok)) { fclose(f); return -3; }
  h = atoi(tok);
  if (ReadToken(f, tok, sizeof tok)) { fclose(f); return -3; }
  maxval = atoi(tok);
  if (w <= 0 || h <= 0 || maxval != 255) { fclose(f); return -4; }
  img->w = w;
  img->h = h;
  img->data.resize(static_cast<size_t>(h) * w * 3);
  size_t got = fread(img->data.data(), 1, img->data.size(), f);
  fclose(f);
  return got == img->data.size() ? 0 : -5;
}

// -------- .flo --------------------------------------------------------------
int ReadFlo(const char* path, Flow* flow) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  float magic;
  int32_t w, h;
  if (fread(&magic, 4, 1, f) != 1 || magic != kFloMagic) {
    fclose(f);
    return -2;
  }
  if (fread(&w, 4, 1, f) != 1 || fread(&h, 4, 1, f) != 1 || w <= 0 ||
      h <= 0) {
    fclose(f);
    return -3;
  }
  flow->w = w;
  flow->h = h;
  flow->data.resize(static_cast<size_t>(h) * w * 2);
  size_t got = fread(flow->data.data(), 4, flow->data.size(), f);
  fclose(f);
  return got == flow->data.size() ? 0 : -5;
}

// -------- one sample: decode + crop + flip + normalize ---------------------
int LoadSample(const char* img0_path, const char* img1_path,
               const char* flo_path, int crop_h, int crop_w, int y0, int x0,
               unsigned flip_bits, float* images_out, float* flows_out) {
  Image im0, im1;
  Flow fl;
  int rc;
  if ((rc = ReadPpm(img0_path, &im0)) != 0) return rc;
  if ((rc = ReadPpm(img1_path, &im1)) != 0) return rc * 10;
  if ((rc = ReadFlo(flo_path, &fl)) != 0) return rc * 100;
  if (im0.h != im1.h || im0.w != im1.w || fl.h != im0.h || fl.w != im0.w)
    return -1000;
  if (y0 < 0 || x0 < 0 || y0 + crop_h > im0.h || x0 + crop_w > im0.w)
    return -1001;

  const bool hflip = flip_bits & 1u;
  const bool vflip = flip_bits & 2u;
  const float inv = 1.0f / 255.0f;
  const size_t frame_stride = static_cast<size_t>(crop_h) * crop_w * 3;

  for (int fi = 0; fi < 2; ++fi) {
    const Image& im = fi == 0 ? im0 : im1;
    float* dst = images_out + fi * frame_stride;
    for (int y = 0; y < crop_h; ++y) {
      int sy = y0 + (vflip ? crop_h - 1 - y : y);
      const uint8_t* row = &im.data[(static_cast<size_t>(sy) * im.w + x0) * 3];
      float* orow = dst + static_cast<size_t>(y) * crop_w * 3;
      if (!hflip) {
        for (int x = 0; x < crop_w * 3; ++x) orow[x] = row[x] * inv;
      } else {
        for (int x = 0; x < crop_w; ++x) {
          const uint8_t* px = row + (crop_w - 1 - x) * 3;
          orow[x * 3 + 0] = px[0] * inv;
          orow[x * 3 + 1] = px[1] * inv;
          orow[x * 3 + 2] = px[2] * inv;
        }
      }
    }
  }

  const float sx = hflip ? -1.0f : 1.0f;
  const float sy_ = vflip ? -1.0f : 1.0f;
  for (int y = 0; y < crop_h; ++y) {
    int srcy = y0 + (vflip ? crop_h - 1 - y : y);
    const float* row = &fl.data[(static_cast<size_t>(srcy) * fl.w + x0) * 2];
    float* orow = flows_out + static_cast<size_t>(y) * crop_w * 2;
    for (int x = 0; x < crop_w; ++x) {
      int srcx = (hflip ? crop_w - 1 - x : x) * 2;
      orow[x * 2 + 0] = row[srcx + 0] * sx;
      orow[x * 2 + 1] = row[srcx + 1] * sy_;
    }
  }
  return 0;
}

}  // namespace

extern "C" {

int pwc_image_size(const char* path, int* h, int* w) {
  Image im;
  // header-only parse would be enough; full read keeps the code simple and
  // the call is only used once per dataset scan.
  int rc = ReadPpm(path, &im);
  if (rc != 0) return rc;
  *h = im.h;
  *w = im.w;
  return 0;
}

int pwc_read_flo(const char* path, float* out, int max_floats, int* h,
                 int* w) {
  Flow fl;
  int rc = ReadFlo(path, &fl);
  if (rc != 0) return rc;
  if (static_cast<int>(fl.data.size()) > max_floats) return -6;
  memcpy(out, fl.data.data(), fl.data.size() * 4);
  *h = fl.h;
  *w = fl.w;
  return 0;
}

// Load a full batch concurrently. Returns 0, or the first non-zero sample
// error code encountered.
int pwc_load_batch(const char** img0_paths, const char** img1_paths,
                   const char** flo_paths, int batch, int crop_h, int crop_w,
                   const int* y0s, const int* x0s,
                   const unsigned char* flip_bits, float* images_out,
                   float* flows_out, int num_threads) {
  if (batch <= 0 || crop_h <= 0 || crop_w <= 0) return -7;
  const size_t img_stride = static_cast<size_t>(2) * crop_h * crop_w * 3;
  const size_t flo_stride = static_cast<size_t>(crop_h) * crop_w * 2;

  std::vector<int> rcs(batch, 0);
  int nt = num_threads < 1 ? 1 : (num_threads > batch ? batch : num_threads);
  std::vector<std::thread> workers;
  for (int t = 0; t < nt; ++t) {
    workers.emplace_back([&, t]() {
      for (int i = t; i < batch; i += nt) {
        rcs[i] = LoadSample(img0_paths[i], img1_paths[i], flo_paths[i],
                            crop_h, crop_w, y0s[i], x0s[i], flip_bits[i],
                            images_out + i * img_stride,
                            flows_out + i * flo_stride);
      }
    });
  }
  for (auto& th : workers) th.join();
  for (int rc : rcs)
    if (rc != 0) return rc;
  return 0;
}

}  // extern "C"
