// Host-side geometry kernel library (C++17, zero external deps).
//
// The reference delegates all geometry to OpenCV's C++ core
// (connectedComponentsWithStats / findContours / minAreaRect / convexHull,
// SURVEY §2.2).  This library is the framework's own native equivalent for
// host execution: a single pass over the probability map does threshold +
// elliptical open/close + union-find connected components + per-component
// convex hulls + rotating-calipers minimum-area rectangles + quadrilateral
// corner extraction + diagonal measurement.  It serves as
//   (a) the fast CPU path for the compat entry points when no accelerator
//       is attached, and
//   (b) an independent oracle for the on-device JAX pipeline.
//
// C ABI only; consumed via ctypes (vickers_tpu/native/__init__.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

struct DSU {
  std::vector<int32_t> parent;
  explicit DSU(size_t n) : parent(n) {
    std::iota(parent.begin(), parent.end(), 0);
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[std::max(a, b)] = std::min(a, b);
  }
};

// cv2.getStructuringElement(MORPH_ELLIPSE, (k, k)) row extents.
static void ellipse_row_extents(int k, std::vector<int>& dx_of_row) {
  int r = k / 2;
  dx_of_row.assign(2 * r + 1, 0);
  double inv_r2 = r > 0 ? 1.0 / (double(r) * r) : 0.0;
  for (int i = -r; i <= r; ++i) {
    int dy = std::abs(i);
    int dx = int(r * std::sqrt(std::max(0.0, 1.0 - dy * dy * inv_r2)) + 0.5);
    dx_of_row[i + r] = dx;
  }
}

static void dilate_ellipse(std::vector<uint8_t>& m, int h, int w, int k) {
  std::vector<int> dx;
  ellipse_row_extents(k, dx);
  int r = k / 2;
  std::vector<uint8_t> out(m.size(), 0);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      if (!m[size_t(y) * w + x]) continue;
      for (int i = -r; i <= r; ++i) {
        int yy = y + i;
        if (yy < 0 || yy >= h) continue;
        int d = dx[i + r];
        int x0 = std::max(0, x - d), x1 = std::min(w - 1, x + d);
        std::memset(&out[size_t(yy) * w + x0], 1, size_t(x1 - x0 + 1));
      }
    }
  m.swap(out);
}

static void erode_ellipse(std::vector<uint8_t>& m, int h, int w, int k) {
  // erode(X) = !dilate(!X) with border treated as foreground (cv2 semantics:
  // constant border with max value for erode).
  std::vector<uint8_t> inv(m.size());
  for (size_t i = 0; i < m.size(); ++i) inv[i] = !m[i];
  // dilating the complement with zero-padding border == erosion with
  // replicate-foreground border for interior correctness; handle border by
  // padding complement with 0 (background) so border pixels only erode from
  // in-bounds background, matching cv2's BORDER_CONSTANT(+inf) for erode.
  dilate_ellipse(inv, h, w, k);
  for (size_t i = 0; i < m.size(); ++i) m[i] = !inv[i];
}

struct Det {
  int32_t label;
  int32_t area;
  float box[8];
  float cx, cy;
  float d1, d2, d_mean;
  float quality;
};

}  // namespace

// -- convex hull ------------------------------------------------------------
static std::vector<double> convex_hull(std::vector<double>& pts /* x,y pairs */) {
  size_t n = pts.size() / 2;
  if (n < 3) return pts;
  std::vector<size_t> idx(n);
  std::iota(idx.begin(), idx.end(), 0);
  std::sort(idx.begin(), idx.end(), [&](size_t a, size_t b) {
    double ax = pts[2 * a], ay = pts[2 * a + 1];
    double bx = pts[2 * b], by = pts[2 * b + 1];
    return ax < bx || (ax == bx && ay < by);
  });
  std::vector<size_t> hull;
  auto cr = [&](size_t o, size_t a, size_t b) {
    return (pts[2 * a] - pts[2 * o]) * (pts[2 * b + 1] - pts[2 * o + 1]) -
           (pts[2 * a + 1] - pts[2 * o + 1]) * (pts[2 * b] - pts[2 * o]);
  };
  for (size_t i : idx) {
    while (hull.size() >= 2 &&
           cr(hull[hull.size() - 2], hull[hull.size() - 1], i) <= 0)
      hull.pop_back();
    hull.push_back(i);
  }
  size_t lower = hull.size() + 1;
  for (auto it = idx.rbegin(); it != idx.rend(); ++it) {
    while (hull.size() >= lower &&
           cr(hull[hull.size() - 2], hull[hull.size() - 1], *it) <= 0)
      hull.pop_back();
    hull.push_back(*it);
  }
  hull.pop_back();
  std::vector<double> out;
  out.reserve(hull.size() * 2);
  for (size_t i : hull) {
    out.push_back(pts[2 * i]);
    out.push_back(pts[2 * i + 1]);
  }
  return out;
}

// rotating calipers over hull edges: exact minimum-area enclosing rectangle.
static void min_area_rect(const std::vector<double>& hull, float box[8],
                          float* cx, float* cy, double* theta_out) {
  size_t n = hull.size() / 2;
  double best_area = 1e300, bt = 0, bu0 = 0, bu1 = 0, bv0 = 0, bv1 = 0;
  for (size_t e = 0; e < n; ++e) {
    double ex = hull[2 * ((e + 1) % n)] - hull[2 * e];
    double ey = hull[2 * ((e + 1) % n) + 1] - hull[2 * e + 1];
    double len = std::hypot(ex, ey);
    if (len < 1e-12) continue;
    double c = ex / len, s = ey / len;
    double u0 = 1e300, u1 = -1e300, v0 = 1e300, v1 = -1e300;
    for (size_t i = 0; i < n; ++i) {
      double u = hull[2 * i] * c + hull[2 * i + 1] * s;
      double v = -hull[2 * i] * s + hull[2 * i + 1] * c;
      u0 = std::min(u0, u); u1 = std::max(u1, u);
      v0 = std::min(v0, v); v1 = std::max(v1, v);
    }
    double area = (u1 - u0) * (v1 - v0);
    if (area < best_area) {
      best_area = area;
      bt = std::atan2(s, c);
      bu0 = u0; bu1 = u1; bv0 = v0; bv1 = v1;
    }
  }
  double c = std::cos(bt), s = std::sin(bt);
  double us[4] = {bu0, bu1, bu1, bu0};
  double vs[4] = {bv0, bv0, bv1, bv1};
  for (int i = 0; i < 4; ++i) {
    box[2 * i] = float(us[i] * c - vs[i] * s);
    box[2 * i + 1] = float(us[i] * s + vs[i] * c);
  }
  double ucx = (bu0 + bu1) / 2, vcx = (bv0 + bv1) / 2;
  *cx = float(ucx * c - vcx * s);
  *cy = float(ucx * s + vcx * c);
  *theta_out = bt;
}

static void quad_from_hull(const std::vector<double>& hull, double theta,
                           float box[8]) {
  size_t n = hull.size() / 2;
  for (int k = 0; k < 4; ++k) {
    double ang = theta + M_PI / 4.0 + k * M_PI / 2.0;
    double c = std::cos(ang), s = std::sin(ang);
    double best = -1e300;
    size_t bi = 0;
    for (size_t i = 0; i < n; ++i) {
      double p = hull[2 * i] * c + hull[2 * i + 1] * s;
      if (p > best) { best = p; bi = i; }
    }
    box[2 * k] = float(hull[2 * bi]);
    box[2 * k + 1] = float(hull[2 * bi + 1]);
  }
}

static void diagonals(const float box[8], float* d1, float* d2) {
  int best_a = 0, best_b = 1;
  float best = -1;
  for (int a = 0; a < 4; ++a)
    for (int b = a + 1; b < 4; ++b) {
      float dx = box[2 * a] - box[2 * b], dy = box[2 * a + 1] - box[2 * b + 1];
      float d = std::sqrt(dx * dx + dy * dy);
      if (d > best) { best = d; best_a = a; best_b = b; }
    }
  *d1 = best;
  int rest[2], r = 0;
  for (int k = 0; k < 4; ++k)
    if (k != best_a && k != best_b) rest[r++] = k;
  float dx = box[2 * rest[0]] - box[2 * rest[1]];
  float dy = box[2 * rest[0] + 1] - box[2 * rest[1] + 1];
  *d2 = std::sqrt(dx * dx + dy * dy);
}

extern "C" {

// prob: float32 (h*w), row-major.  Outputs are caller-allocated arrays of
// capacity max_det.  Returns number of detections (area-desc order).
int vk_postprocess(const float* prob, int h, int w, float bin_thresh,
                   float min_area_frac, int min_area_floor, int morph_kernel,
                   int open_iter, int close_iter, int fit_quad,
                   int fit_outset_px, uint8_t* clean_out, int32_t* areas_out,
                   float* boxes_out /* max_det*8 */, float* centers_out,
                   float* d_out /* max_det*3: d1,d2,dmean */, int max_det) {
  const size_t npx = size_t(h) * w;
  std::vector<uint8_t> mask(npx);
  for (size_t i = 0; i < npx; ++i) mask[i] = prob[i] >= bin_thresh;

  for (int it = 0; it < open_iter; ++it) erode_ellipse(mask, h, w, morph_kernel);
  for (int it = 0; it < open_iter; ++it) dilate_ellipse(mask, h, w, morph_kernel);
  for (int it = 0; it < close_iter; ++it) dilate_ellipse(mask, h, w, morph_kernel);
  for (int it = 0; it < close_iter; ++it) erode_ellipse(mask, h, w, morph_kernel);

  // union-find over 8-neighbourhood (scan upper-left half)
  DSU dsu(npx);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      size_t p = size_t(y) * w + x;
      if (!mask[p]) continue;
      if (x > 0 && mask[p - 1]) dsu.unite(p, p - 1);
      if (y > 0) {
        size_t q = p - w;
        if (mask[q]) dsu.unite(p, q);
        if (x > 0 && mask[q - 1]) dsu.unite(p, q - 1);
        if (x < w - 1 && mask[q + 1]) dsu.unite(p, q + 1);
      }
    }

  std::vector<int32_t> area(npx, 0);
  for (size_t p = 0; p < npx; ++p)
    if (mask[p]) area[dsu.find(int32_t(p))]++;

  int min_area = std::max(min_area_floor, int(min_area_frac * h * w));
  std::vector<std::pair<int32_t, int32_t>> comps;  // (area, root)
  for (size_t p = 0; p < npx; ++p)
    if (mask[p] && dsu.parent[p] == int32_t(p) && area[p] >= min_area)
      comps.push_back({area[p], int32_t(p)});
  std::sort(comps.begin(), comps.end(),
            [](auto& a, auto& b) { return a.first > b.first; });
  if (int(comps.size()) > max_det) comps.resize(max_det);

  std::memset(clean_out, 0, npx);
  std::vector<int32_t> root_rank(npx, -1);
  for (size_t k = 0; k < comps.size(); ++k) root_rank[comps[k].second] = int32_t(k);
  // mark kept pixels + gather per-component boundary points
  std::vector<std::vector<double>> pts(comps.size());
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      size_t p = size_t(y) * w + x;
      if (!mask[p]) continue;
      int32_t rk = root_rank[dsu.find(int32_t(p))];
      if (rk < 0) continue;
      clean_out[p] = 255;
      bool boundary = x == 0 || x == w - 1 || y == 0 || y == h - 1 ||
                      !mask[p - 1] || !mask[p + 1] || !mask[p - w] || !mask[p + w];
      if (boundary) {
        pts[rk].push_back(double(x));
        pts[rk].push_back(double(y));
      }
    }

  for (size_t k = 0; k < comps.size(); ++k) {
    std::vector<double> source = pts[k];
    if (fit_outset_px > 0) {
      // approximate the reference's fit-only dilation by pushing boundary
      // points outward along the normal from the centroid
      double cx = 0, cy = 0;
      size_t m = source.size() / 2;
      for (size_t i = 0; i < m; ++i) { cx += source[2 * i]; cy += source[2 * i + 1]; }
      cx /= std::max<size_t>(1, m); cy /= std::max<size_t>(1, m);
      for (size_t i = 0; i < m; ++i) {
        double dx = source[2 * i] - cx, dy = source[2 * i + 1] - cy;
        double len = std::hypot(dx, dy);
        if (len > 1e-9) {
          source[2 * i] += dx / len * fit_outset_px;
          source[2 * i + 1] += dy / len * fit_outset_px;
        }
      }
    }
    std::vector<double> hull = convex_hull(source);
    float box[8];
    float cx, cy;
    double theta;
    min_area_rect(hull, box, &cx, &cy, &theta);
    if (fit_quad) {
      quad_from_hull(hull, theta, box);
      cx = (box[0] + box[2] + box[4] + box[6]) / 4.0f;
      cy = (box[1] + box[3] + box[5] + box[7]) / 4.0f;
    }
    float d1, d2;
    diagonals(box, &d1, &d2);
    areas_out[k] = comps[k].first;
    std::memcpy(&boxes_out[k * 8], box, sizeof box);
    centers_out[k * 2] = cx;
    centers_out[k * 2 + 1] = cy;
    d_out[k * 3] = d1;
    d_out[k * 3 + 1] = d2;
    d_out[k * 3 + 2] = 0.5f * (d1 + d2);
  }
  return int(comps.size());
}

// HV = 1.8544 * F / d^2, d in mm.
float vk_hv(float d_px, float um_per_px, float force_kgf) {
  float d_mm = d_px * um_per_px / 1000.0f;
  float dd = d_mm * d_mm;
  return dd > 1e-12f ? 1.8544f * force_kgf / dd : 0.0f;
}

}  // extern "C"
