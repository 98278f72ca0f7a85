// Superpixel segmentation + boundary shrinking, C++ runtime.
//
// Replaces the reference's native OpenCV dependency
// (cv2.ximgproc.createSuperpixelLSC, uemda/gast/superpixels.py:67-70) with an
// in-repo implementation: SLIC-family iterative clustering in CIELAB+XY
// space with an LSC-style compactness ratio, connectivity enforcement, and a
// vectorized window-based boundary shrink (replacing the quadruple Python
// loop at superpixels.py:129-152).
//
// Exposed as a C ABI for ctypes (see uemda_tpu/superpixels/native.py).
// Build: g++ -O3 -march=native -shared -fPIC superpixels.cpp -o libsuperpixels.so

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

struct Center {
  float l, a, b, x, y;
  float count;
};

// sRGB (0..255) -> CIELAB, matching the standard D65 pipeline.
inline void rgb2lab(float r, float g, float b, float* L, float* A, float* B) {
  auto inv = [](float c) {
    c /= 255.0f;
    return (c > 0.04045f) ? std::pow((c + 0.055f) / 1.055f, 2.4f) : c / 12.92f;
  };
  float rr = inv(r), gg = inv(g), bb = inv(b);
  float X = rr * 0.4124f + gg * 0.3576f + bb * 0.1805f;
  float Y = rr * 0.2126f + gg * 0.7152f + bb * 0.0722f;
  float Z = rr * 0.0193f + gg * 0.1192f + bb * 0.9505f;
  X /= 0.95047f;
  Z /= 1.08883f;
  auto f = [](float t) {
    return (t > 0.008856f) ? std::cbrt(t) : (7.787f * t + 16.0f / 116.0f);
  };
  float fx = f(X), fy = f(Y), fz = f(Z);
  *L = 116.0f * fy - 16.0f;
  *A = 500.0f * (fx - fy);
  *B = 200.0f * (fy - fz);
}

}  // namespace

extern "C" {

// image: (h, w, 3) uint8 RGB; labels_out: (h, w) int32.
// Returns the number of superpixels (ids 0..n-1).
int slic_superpixels(const uint8_t* image, int h, int w, int region_size,
                     float ratio, int iterations, int32_t* labels_out) {
  const int n = h * w;
  std::vector<float> lab(3 * n);
  for (int i = 0; i < n; ++i) {
    rgb2lab(image[3 * i], image[3 * i + 1], image[3 * i + 2], &lab[3 * i],
            &lab[3 * i + 1], &lab[3 * i + 2]);
  }

  // seed cluster centers on a regular grid, perturbed to the lowest-gradient
  // pixel in a 3x3 neighborhood (standard SLIC seeding)
  std::vector<Center> centers;
  for (int cy = region_size / 2; cy < h; cy += region_size) {
    for (int cx = region_size / 2; cx < w; cx += region_size) {
      int bx = cx, by = cy;
      float best = 1e30f;
      for (int dy = -1; dy <= 1; ++dy) {
        for (int dx = -1; dx <= 1; ++dx) {
          int x = cx + dx, y = cy + dy;
          if (x < 1 || x >= w - 1 || y < 1 || y >= h - 1) continue;
          int i = y * w + x;
          float gx = lab[3 * (i + 1)] - lab[3 * (i - 1)];
          float gy = lab[3 * (i + w)] - lab[3 * (i - w)];
          float grad = gx * gx + gy * gy;
          if (grad < best) {
            best = grad;
            bx = x;
            by = y;
          }
        }
      }
      int i = by * w + bx;
      centers.push_back(
          {lab[3 * i], lab[3 * i + 1], lab[3 * i + 2], (float)bx, (float)by, 0});
    }
  }
  const int k = (int)centers.size();
  const float S = (float)region_size;
  // LSC's `ratio` weighs color vs spatial terms; map it onto the SLIC
  // compactness normalization m = ratio * 40 + eps on a unit scale.
  const float m = std::max(ratio * 100.0f, 1.0f);
  const float inv_s2 = 1.0f / (S * S);
  const float inv_m2 = 1.0f / (m * m);

  std::vector<int32_t> labels(n, -1);
  std::vector<float> dists(n, 1e30f);

  for (int it = 0; it < iterations; ++it) {
    std::fill(dists.begin(), dists.end(), 1e30f);
    for (int c = 0; c < k; ++c) {
      const Center& ct = centers[c];
      int x0 = std::max(0, (int)ct.x - region_size);
      int x1 = std::min(w, (int)ct.x + region_size + 1);
      int y0 = std::max(0, (int)ct.y - region_size);
      int y1 = std::min(h, (int)ct.y + region_size + 1);
      for (int y = y0; y < y1; ++y) {
        const float dy = y - ct.y;
        for (int x = x0; x < x1; ++x) {
          int i = y * w + x;
          float dl = lab[3 * i] - ct.l;
          float da = lab[3 * i + 1] - ct.a;
          float db = lab[3 * i + 2] - ct.b;
          float dx = x - ct.x;
          float dc = dl * dl + da * da + db * db;
          float ds = dx * dx + dy * dy;
          float d = dc * inv_m2 + ds * inv_s2;
          if (d < dists[i]) {
            dists[i] = d;
            labels[i] = c;
          }
        }
      }
    }
    // update centers
    std::vector<Center> next(k, {0, 0, 0, 0, 0, 0});
    for (int y = 0; y < h; ++y) {
      for (int x = 0; x < w; ++x) {
        int i = y * w + x;
        int c = labels[i];
        if (c < 0) continue;
        next[c].l += lab[3 * i];
        next[c].a += lab[3 * i + 1];
        next[c].b += lab[3 * i + 2];
        next[c].x += x;
        next[c].y += y;
        next[c].count += 1;
      }
    }
    for (int c = 0; c < k; ++c) {
      if (next[c].count > 0) {
        float inv = 1.0f / next[c].count;
        centers[c] = {next[c].l * inv, next[c].a * inv, next[c].b * inv,
                      next[c].x * inv, next[c].y * inv, next[c].count};
      }
    }
  }

  // connectivity enforcement: relabel connected components, absorb tiny
  // fragments into the previously-seen neighbor (standard SLIC post-pass)
  std::vector<int32_t> out(n, -1);
  std::vector<int> stack;
  int next_label = 0;
  const int min_size = (region_size * region_size) / 4;
  const int dx4[] = {-1, 1, 0, 0};
  const int dy4[] = {0, 0, -1, 1};
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      int i = y * w + x;
      if (out[i] >= 0) continue;
      int adj = 0;  // neighbor label to absorb into if too small
      if (x > 0) adj = out[i - 1];
      else if (y > 0) adj = out[i - w];
      stack.clear();
      stack.push_back(i);
      out[i] = next_label;
      size_t head = 0;
      std::vector<int> comp{i};
      while (head < stack.size()) {
        int p = stack[head++];
        int px = p % w, py = p / w;
        for (int d = 0; d < 4; ++d) {
          int qx = px + dx4[d], qy = py + dy4[d];
          if (qx < 0 || qx >= w || qy < 0 || qy >= h) continue;
          int q = qy * w + qx;
          if (out[q] < 0 && labels[q] == labels[i]) {
            out[q] = next_label;
            stack.push_back(q);
            comp.push_back(q);
          }
        }
      }
      if ((int)comp.size() < min_size && next_label > 0) {
        for (int p : comp) out[p] = adj;
      } else {
        ++next_label;
      }
    }
  }
  std::memcpy(labels_out, out.data(), n * sizeof(int32_t));
  return next_label;
}

// Boundary shrinking (superpixels.py:129-152): any pixel with a different
// label within a (2*win+1)^2 window becomes `boundary_id`.
void edge_shrink(const int32_t* labels, int h, int w, int win,
                 int32_t boundary_id, int32_t* out) {
  // separable two-pass: horizontal min/max run, then vertical
  std::vector<int32_t> lo(h * w), hi(h * w);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      int32_t mn = labels[y * w + x], mx = mn;
      int x0 = std::max(0, x - win), x1 = std::min(w - 1, x + win);
      for (int xx = x0; xx <= x1; ++xx) {
        int32_t v = labels[y * w + xx];
        mn = std::min(mn, v);
        mx = std::max(mx, v);
      }
      lo[y * w + x] = mn;
      hi[y * w + x] = mx;
    }
  }
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      int32_t mn = lo[y * w + x], mx = hi[y * w + x];
      int y0 = std::max(0, y - win), y1 = std::min(h - 1, y + win);
      for (int yy = y0; yy <= y1; ++yy) {
        mn = std::min(mn, lo[yy * w + x]);
        mx = std::max(mx, hi[yy * w + x]);
      }
      out[y * w + x] = (mn == mx) ? labels[y * w + x] : boundary_id;
    }
  }
}

}  // extern "C"

extern "C" {

// LSC superpixels (Li & Chen, CVPR'15 "Superpixel Segmentation using Linear
// Spectral Clustering") — the algorithm behind the reference's
// cv2.ximgproc.createSuperpixelLSC (superpixels.py:67-70). Pixels map into a
// 10-D kernelized feature space phi(p) = (cos/sin of scaled l,a,b,x,y) and a
// weighted local k-means runs there; `ratio` balances spatial vs color terms
// like the OpenCV parameter. Ends with the same connectivity pass as SLIC.
int lsc_superpixels(const uint8_t* image, int h, int w, int region_size,
                    float ratio, int iterations, int32_t* labels_out) {
  const int n = h * w;
  const float S = (float)region_size;
  const float PI2 = 1.57079632679f;  // pi/2

  // 10-D kernelized feature per pixel
  std::vector<float> lab(3 * n);
  for (int i = 0; i < n; ++i) {
    rgb2lab(image[3 * i], image[3 * i + 1], image[3 * i + 2], &lab[3 * i],
            &lab[3 * i + 1], &lab[3 * i + 2]);
  }
  const float Cc = 20.0f;           // color weight (OpenCV default scale)
  const float Cs = Cc * ratio;      // spatial weight
  std::vector<float> feat(10 * n);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      int i = y * w + x;
      float l = lab[3 * i] / 100.0f;
      float a = (lab[3 * i + 1] + 128.0f) / 255.0f;
      float b = (lab[3 * i + 2] + 128.0f) / 255.0f;
      // spatial features normalized over the full raster so the cos/sin
      // arguments stay in [0, pi/2] and remain monotone (a per-region
      // fractional mapping would alias pixels one region apart)
      float xs = (float)x / (float)w, ys = (float)y / (float)h;
      // scale the spatial weight by image-to-region ratio so distances
      // between adjacent regions match the color scale like in LSC
      float cs_eff = Cs * (float)w / S;
      float cs_eff_y = Cs * (float)h / S;
      float* f = &feat[10 * i];
      f[0] = Cc * std::cos(PI2 * l);  f[1] = Cc * std::sin(PI2 * l);
      f[2] = Cc * 2.55f * std::cos(PI2 * a); f[3] = Cc * 2.55f * std::sin(PI2 * a);
      f[4] = Cc * 2.55f * std::cos(PI2 * b); f[5] = Cc * 2.55f * std::sin(PI2 * b);
      f[6] = cs_eff * std::cos(PI2 * xs);
      f[7] = cs_eff * std::sin(PI2 * xs);
      f[8] = cs_eff_y * std::cos(PI2 * ys);
      f[9] = cs_eff_y * std::sin(PI2 * ys);
    }
  }
  // sigma = weighted mean feature (for the LSC w(p) = phi(p).sigma weight)
  std::vector<double> sigma(10, 0.0);
  for (int i = 0; i < n; ++i)
    for (int d = 0; d < 10; ++d) sigma[d] += feat[10 * i + d];
  for (int d = 0; d < 10; ++d) sigma[d] /= n;
  std::vector<float> wgt(n);
  for (int i = 0; i < n; ++i) {
    double s = 0;
    for (int d = 0; d < 10; ++d) s += feat[10 * i + d] * sigma[d];
    wgt[i] = (float)s;
  }
  // LSC normalizes features by the pixel weight: phi(p) / w(p)
  for (int i = 0; i < n; ++i)
    for (int d = 0; d < 10; ++d) feat[10 * i + d] /= std::max(wgt[i], 1e-6f);

  // grid seeds
  struct C10 { float f[10]; float x, y, wsum; };
  std::vector<C10> centers;
  for (int cy = region_size / 2; cy < h; cy += region_size) {
    for (int cx = region_size / 2; cx < w; cx += region_size) {
      int i = cy * w + cx;
      C10 c{};
      for (int d = 0; d < 10; ++d) c.f[d] = feat[10 * i + d];
      c.x = (float)cx; c.y = (float)cy; c.wsum = 0;
      centers.push_back(c);
    }
  }
  const int k = (int)centers.size();
  std::vector<int32_t> labels(n, -1);
  std::vector<float> dists(n, 1e30f);

  for (int it = 0; it < iterations; ++it) {
    std::fill(dists.begin(), dists.end(), 1e30f);
    for (int c = 0; c < k; ++c) {
      const C10& ct = centers[c];
      int x0 = std::max(0, (int)ct.x - region_size);
      int x1 = std::min(w, (int)ct.x + region_size + 1);
      int y0 = std::max(0, (int)ct.y - region_size);
      int y1 = std::min(h, (int)ct.y + region_size + 1);
      for (int y = y0; y < y1; ++y) {
        for (int x = x0; x < x1; ++x) {
          int i = y * w + x;
          const float* f = &feat[10 * i];
          float d2 = 0;
          for (int d = 0; d < 10; ++d) {
            float df = f[d] - ct.f[d];
            d2 += df * df;
          }
          if (d2 < dists[i]) { dists[i] = d2; labels[i] = c; }
        }
      }
    }
    // weighted center update (weight = w(p))
    std::vector<C10> next(k);
    for (auto& c : next) { std::fill(std::begin(c.f), std::end(c.f), 0.f);
                           c.x = c.y = c.wsum = 0; }
    for (int y = 0; y < h; ++y) {
      for (int x = 0; x < w; ++x) {
        int i = y * w + x;
        int c = labels[i];
        if (c < 0) continue;
        float wt = wgt[i];
        for (int d = 0; d < 10; ++d) next[c].f[d] += wt * feat[10 * i + d];
        next[c].x += wt * x; next[c].y += wt * y; next[c].wsum += wt;
      }
    }
    for (int c = 0; c < k; ++c) {
      if (next[c].wsum > 0) {
        float inv = 1.0f / next[c].wsum;
        for (int d = 0; d < 10; ++d) centers[c].f[d] = next[c].f[d] * inv;
        centers[c].x = next[c].x * inv;
        centers[c].y = next[c].y * inv;
      }
    }
  }

  // connectivity enforcement (same pass as slic_superpixels)
  std::vector<int32_t> out(n, -1);
  std::vector<int> stack;
  int next_label = 0;
  const int min_size = (region_size * region_size) / 4;
  const int dx4[] = {-1, 1, 0, 0};
  const int dy4[] = {0, 0, -1, 1};
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      int i = y * w + x;
      if (out[i] >= 0) continue;
      int adj = 0;
      if (x > 0) adj = out[i - 1];
      else if (y > 0) adj = out[i - w];
      stack.clear();
      stack.push_back(i);
      out[i] = next_label;
      size_t head = 0;
      std::vector<int> comp{i};
      while (head < stack.size()) {
        int p = stack[head++];
        int px = p % w, py = p / w;
        for (int d = 0; d < 4; ++d) {
          int qx = px + dx4[d], qy = py + dy4[d];
          if (qx < 0 || qx >= w || qy < 0 || qy >= h) continue;
          int q = qy * w + qx;
          if (out[q] < 0 && labels[q] == labels[i]) {
            out[q] = next_label;
            stack.push_back(q);
            comp.push_back(q);
          }
        }
      }
      if ((int)comp.size() < min_size && next_label > 0) {
        for (int p : comp) out[p] = adj;
      } else {
        ++next_label;
      }
    }
  }
  std::memcpy(labels_out, out.data(), n * sizeof(int32_t));
  return next_label;
}

}  // extern "C"
