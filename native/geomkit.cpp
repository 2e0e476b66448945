// geomkit: native geometry kernel for dgdm_tpu.
//
// The reference leans on native code for all host-side geometry: OpenCV
// (contour extraction, assets/icon_process.py:29-54), the `triangle` C
// library (polygon capping, assets/icon_process.py:82), and the V-HACD C++
// binary (convex decomposition, sim/sim_2d.py:26-71). This library provides
// the equivalents used by the TPU-native pipeline behind a plain C ABI
// (loaded via ctypes; Python fallbacks exist for every entry point).
//
// Build: c++ -O3 -shared -fPIC -o libgeomkit.so geomkit.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Largest-boundary tracing on a binary mask (Moore neighbourhood), the
// equivalent of cv2.findContours(RETR_EXTERNAL) + longest arc selection.
// mask: h*w uint8 (nonzero = object). out_xy: capacity*2 doubles (x, y).
// Returns the number of contour points written (0 on failure).
// ---------------------------------------------------------------------------
int64_t trace_largest_contour(const uint8_t* mask, int64_t h, int64_t w,
                              double* out_xy, int64_t capacity) {
  // label connected components (4-connectivity) with a simple BFS, keeping
  // the largest
  std::vector<int32_t> label(h * w, -1);
  std::vector<int64_t> stack;
  int32_t ncomp = 0;
  int64_t best_size = 0;
  int32_t best = -1;
  for (int64_t i = 0; i < h * w; ++i) {
    if (!mask[i] || label[i] >= 0) continue;
    int64_t size = 0;
    stack.push_back(i);
    label[i] = ncomp;
    while (!stack.empty()) {
      int64_t p = stack.back();
      stack.pop_back();
      ++size;
      int64_t y = p / w, x = p % w;
      const int64_t ns[4][2] = {{y - 1, x}, {y + 1, x}, {y, x - 1}, {y, x + 1}};
      for (auto& n : ns) {
        if (n[0] < 0 || n[0] >= h || n[1] < 0 || n[1] >= w) continue;
        int64_t q = n[0] * w + n[1];
        if (mask[q] && label[q] < 0) {
          label[q] = ncomp;
          stack.push_back(q);
        }
      }
    }
    if (size > best_size) {
      best_size = size;
      best = ncomp;
    }
    ++ncomp;
  }
  if (best < 0) return 0;

  // find the top-left pixel of the best component
  int64_t sy = -1, sx = -1;
  for (int64_t y = 0; y < h && sy < 0; ++y)
    for (int64_t x = 0; x < w; ++x)
      if (label[y * w + x] == best) {
        sy = y;
        sx = x;
        break;
      }

  // Moore-neighbour tracing, clockwise sweep starting from the backtrack
  const int dy[8] = {-1, -1, 0, 1, 1, 1, 0, -1};
  const int dx[8] = {0, 1, 1, 1, 0, -1, -1, -1};
  auto inside = [&](int64_t y, int64_t x) {
    return y >= 0 && y < h && x >= 0 && x < w && label[y * w + x] == best;
  };
  // start scanning from the W neighbour (guaranteed outside for the
  // top-left-most pixel): pretend we arrived moving east (prev = 2)
  int64_t cy = sy, cx = sx;
  int prev = 2;
  int first_move = -1;
  int64_t n = 0;
  for (int64_t guard = 0; guard < 4 * best_size + 8; ++guard) {
    if (n < capacity) {
      out_xy[2 * n] = (double)cx;
      out_xy[2 * n + 1] = (double)cy;
    }
    ++n;
    bool found = false;
    for (int k = 0; k < 8; ++k) {
      int d = (prev + 5 + k) % 8;  // backtrack + 1, sweep clockwise
      int64_t ny = cy + dy[d], nx = cx + dx[d];
      if (inside(ny, nx)) {
        cy = ny;
        cx = nx;
        prev = d;
        found = true;
        break;
      }
    }
    if (!found) break;  // isolated pixel
    if (first_move < 0) first_move = prev;
    // Jacob's criterion: back at start entering with the initial direction
    else if (cy == sy && cx == sx && prev == first_move) break;
  }
  return n < capacity ? n : capacity;
}

// ---------------------------------------------------------------------------
// Arc-length uniform resampling with int quantization (the reference's
// resample_contour, assets/icon_process.py:7-27).
// ---------------------------------------------------------------------------
void resample_contour(const double* xy, int64_t n, int64_t m, int32_t* out) {
  std::vector<double> cum(n, 0.0);
  for (int64_t i = 1; i < n; ++i) {
    double dx = xy[2 * i] - xy[2 * (i - 1)];
    double dy = xy[2 * i + 1] - xy[2 * (i - 1) + 1];
    cum[i] = cum[i - 1] + std::sqrt(dx * dx + dy * dy);
  }
  double total = cum[n - 1];
  int64_t j = 0;
  for (int64_t k = 0; k < m; ++k) {
    double target = total * (double)k / (double)(m - 1);
    while (j + 1 < n && cum[j + 1] < target) ++j;
    double t = 0.0;
    if (j + 1 < n && cum[j + 1] > cum[j])
      t = (target - cum[j]) / (cum[j + 1] - cum[j]);
    int64_t j1 = j + 1 < n ? j + 1 : j;
    double x = xy[2 * j] + t * (xy[2 * j1] - xy[2 * j]);
    double y = xy[2 * j + 1] + t * (xy[2 * j1 + 1] - xy[2 * j + 1]);
    out[2 * k] = (int32_t)x;
    out[2 * k + 1] = (int32_t)y;
  }
}

// ---------------------------------------------------------------------------
// Ear-clipping triangulation of a simple CCW polygon (replaces `triangle` /
// acts as the exact convex decomposition for oracle collision meshes).
// Returns number of triangles written ((n-2) on success).
// ---------------------------------------------------------------------------
static double cross3(const double* a, const double* b, const double* c) {
  return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]);
}

int64_t ear_clip(const double* xy, int64_t n, int64_t* tris) {
  std::vector<int64_t> idx(n);
  for (int64_t i = 0; i < n; ++i) idx[i] = i;
  int64_t nt = 0;
  int64_t guard = 0;
  while ((int64_t)idx.size() > 3 && guard < 10 * n * n) {
    ++guard;
    int64_t m = idx.size();
    bool clipped = false;
    for (int64_t k = 0; k < m; ++k) {
      int64_t i0 = idx[(k - 1 + m) % m], i1 = idx[k], i2 = idx[(k + 1) % m];
      const double* a = xy + 2 * i0;
      const double* b = xy + 2 * i1;
      const double* c = xy + 2 * i2;
      if (cross3(a, b, c) <= 1e-16) continue;
      bool ok = true;
      for (int64_t j = 0; j < m && ok; ++j) {
        int64_t ij = idx[j];
        if (ij == i0 || ij == i1 || ij == i2) continue;
        const double* p = xy + 2 * ij;
        if (cross3(a, b, p) > 0 && cross3(b, c, p) > 0 && cross3(c, a, p) > 0)
          ok = false;
      }
      if (!ok) continue;
      tris[3 * nt] = i0;
      tris[3 * nt + 1] = i1;
      tris[3 * nt + 2] = i2;
      ++nt;
      idx.erase(idx.begin() + k);
      clipped = true;
      break;
    }
    if (!clipped) {
      // tolerate slight non-simplicity: clip the most convex corner
      int64_t best = 0;
      double bestv = -1e300;
      for (int64_t k = 0; k < m; ++k) {
        int64_t i0 = idx[(k - 1 + m) % m], i1 = idx[k], i2 = idx[(k + 1) % m];
        double v = cross3(xy + 2 * i0, xy + 2 * i1, xy + 2 * i2);
        if (v > bestv) {
          bestv = v;
          best = k;
        }
      }
      int64_t m2 = idx.size();
      tris[3 * nt] = idx[(best - 1 + m2) % m2];
      tris[3 * nt + 1] = idx[best];
      tris[3 * nt + 2] = idx[(best + 1) % m2];
      ++nt;
      idx.erase(idx.begin() + best);
    }
  }
  if (idx.size() == 3) {
    tris[3 * nt] = idx[0];
    tris[3 * nt + 1] = idx[1];
    tris[3 * nt + 2] = idx[2];
    ++nt;
  }
  return nt;
}

// ---------------------------------------------------------------------------
// Batch point-in-polygon (crossing number).
// ---------------------------------------------------------------------------
void points_in_polygon(const double* pts, int64_t np, const double* poly,
                       int64_t nv, uint8_t* out) {
  for (int64_t i = 0; i < np; ++i) {
    double x = pts[2 * i], y = pts[2 * i + 1];
    int cnt = 0;
    for (int64_t j = 0; j < nv; ++j) {
      int64_t j1 = (j + 1) % nv;
      double vy = poly[2 * j + 1], vy1 = poly[2 * j1 + 1];
      if ((vy > y) != (vy1 > y)) {
        double vx = poly[2 * j], vx1 = poly[2 * j1];
        double denom = vy1 - vy;
        double xint = vx + (y - vy) / denom * (vx1 - vx);
        if (x < xint) ++cnt;
      }
    }
    out[i] = (uint8_t)(cnt & 1);
  }
}

}  // extern "C"
