// Native boundary-metric engine: dc, jc, HD95, ASD for 2D binary masks.
//
// The evaluation pass computes medpy-style boundary metrics per sample per
// part (reference train.py:306-325 calls medpy.metric.binary.*, which runs
// scipy EDT + percentile on the host). On this stack the host has a single
// CPU core, so the metrics engine is implemented natively:
//
//   * surface voxels: mask XOR 4-connectivity erosion
//   * exact Euclidean distance transform: Felzenszwalb & Huttenlocher
//     two-pass lower-envelope algorithm, O(H*W)
//   * hd95: numpy-style linear-interpolated 95th percentile of the
//     symmetric surface distance set
//   * asd: mean one-sided surface distance (pred -> gt)
//
// Exposed as a C ABI consumed via ctypes (utils/boundary_native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// 1-D squared distance transform (lower envelope of parabolas).
void dt1d(const double* f, int n, double* d, int* v, double* z) {
  int k = 0;
  v[0] = 0;
  z[0] = -kInf;
  z[1] = kInf;
  for (int q = 1; q < n; q++) {
    if (f[q] == kInf) continue;
    if (k == 0 && f[v[0]] == kInf) {
      v[0] = q;
      continue;
    }
    double s = ((f[q] + q * (double)q) - (f[v[k]] + v[k] * (double)v[k])) /
               (2.0 * q - 2.0 * v[k]);
    while (k > 0 && s <= z[k]) {
      k--;
      s = ((f[q] + q * (double)q) - (f[v[k]] + v[k] * (double)v[k])) /
          (2.0 * q - 2.0 * v[k]);
    }
    k++;
    v[k] = q;
    z[k] = s;
    z[k + 1] = kInf;
  }
  k = 0;
  for (int q = 0; q < n; q++) {
    while (z[k + 1] < q) k++;
    double dq = q - (double)v[k];
    d[q] = f[v[k]] == kInf ? kInf : dq * dq + f[v[k]];
  }
}

// Exact squared EDT of "distance to nearest true pixel of `on`".
void edt2d(const std::vector<uint8_t>& on, int h, int w,
           std::vector<double>& out) {
  std::vector<double> f(std::max(h, w));
  std::vector<double> d(std::max(h, w));
  std::vector<int> v(std::max(h, w));
  std::vector<double> z(std::max(h, w) + 1);
  out.assign((size_t)h * w, 0.0);
  // columns
  for (int x = 0; x < w; x++) {
    for (int y = 0; y < h; y++) f[y] = on[(size_t)y * w + x] ? 0.0 : kInf;
    dt1d(f.data(), h, d.data(), v.data(), z.data());
    for (int y = 0; y < h; y++) out[(size_t)y * w + x] = d[y];
  }
  // rows
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) f[x] = out[(size_t)y * w + x];
    dt1d(f.data(), w, d.data(), v.data(), z.data());
    for (int x = 0; x < w; x++) out[(size_t)y * w + x] = d[x];
  }
}

// border = mask & !erosion(mask, cross structuring element).
// scipy binary_erosion zero-pads the outside, so edge pixels erode away.
void border_of(const uint8_t* m, int h, int w, std::vector<uint8_t>& border) {
  border.assign((size_t)h * w, 0);
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      size_t i = (size_t)y * w + x;
      if (!m[i]) continue;
      bool eroded = y > 0 && y < h - 1 && x > 0 && x < w - 1 &&
                    m[i - w] && m[i + w] && m[i - 1] && m[i + 1];
      border[i] = eroded ? 0 : 1;
    }
  }
}

// one-sided surface distances surface(a) -> surface(b)
void surface_distances(const uint8_t* a, const uint8_t* b, int h, int w,
                       std::vector<double>& out) {
  std::vector<uint8_t> ba, bb;
  border_of(a, h, w, ba);
  border_of(b, h, w, bb);
  std::vector<double> dist2;
  edt2d(bb, h, w, dist2);
  out.clear();
  for (size_t i = 0; i < (size_t)h * w; i++) {
    if (ba[i]) out.push_back(std::sqrt(dist2[i]));
  }
}

double percentile(std::vector<double>& xs, double q) {
  std::sort(xs.begin(), xs.end());
  if (xs.empty()) return std::nan("");
  double rank = (xs.size() - 1) * q / 100.0;
  size_t lo = (size_t)rank;
  double frac = rank - lo;
  if (lo + 1 >= xs.size()) return xs.back();
  return xs[lo] * (1.0 - frac) + xs[lo + 1] * frac;
}

}  // namespace

extern "C" {

// out = {dc, jc, hd95, asd}. Returns 0 on success, 1 if either mask is
// empty (boundary metrics undefined; caller applies its convention).
int boundary_metrics(const uint8_t* pred, const uint8_t* gt, int h, int w,
                     double* out) {
  size_t n = (size_t)h * w;
  long inter = 0, np = 0, ng = 0;
  for (size_t i = 0; i < n; i++) {
    np += pred[i] != 0;
    ng += gt[i] != 0;
    inter += (pred[i] != 0) && (gt[i] != 0);
  }
  long uni = np + ng - inter;
  out[0] = (np + ng) ? 2.0 * inter / (double)(np + ng) : 0.0;
  out[1] = uni ? inter / (double)uni : 0.0;
  out[2] = std::nan("");
  out[3] = std::nan("");
  if (np == 0 || ng == 0) return 1;
  std::vector<double> s1, s2;
  surface_distances(pred, gt, h, w, s1);
  surface_distances(gt, pred, h, w, s2);
  double sum = 0.0;
  for (double d : s1) sum += d;
  out[3] = s1.empty() ? std::nan("") : sum / s1.size();
  std::vector<double> all;
  all.reserve(s1.size() + s2.size());
  all.insert(all.end(), s1.begin(), s1.end());
  all.insert(all.end(), s2.begin(), s2.end());
  out[2] = percentile(all, 95.0);
  return 0;
}

}  // extern "C"
