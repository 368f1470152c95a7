// Native host-side polygon rasterizer for the pixel drawer's coverage maps.
//
// The reference's vector drawers lean on diffvg, a C++/CUDA differentiable
// rasterizer invoked EVERY step (/root/reference/pixeldrawer.py:339-342).  The
// TPU-native design moves rasterization out of the hot loop entirely: geometry
// is static, so coverage is computed ONCE at init — here, in C++ for large
// canvases — and the per-step render on TPU is a pure gather+composite.
//
// This library mirrors pixray_tpu/ops/cellrender.py::build_coverage_map
// bit-for-bit: even-odd point-in-polygon at SSxSS supersample positions, with a
// painter-order depth stack (slot 0 = topmost, older shapes fall off the
// bottom).  Python binds via ctypes (no pybind11 dependency).
//
// Build: make -C native  (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// polygons: flattened vertex buffer; poly_offsets[i]..poly_offsets[i+1] are the
// vertices (x, y pairs) of cell i.  Outputs must be pre-allocated:
//   indices: (H*SS, W*SS, depth) int32, zero-initialized
//   counts:  (H*SS, W*SS) int32, zero-initialized
void build_coverage_map(
    const double* vertices,        // (total_vertices * 2)
    const int64_t* poly_offsets,   // (num_polys + 1), in vertex counts
    int64_t num_polys,
    int64_t canvas_width,
    int64_t canvas_height,
    int64_t ss,
    int64_t depth,
    int32_t* indices,
    int32_t* counts) {
  const int64_t hs = canvas_height * ss;
  const int64_t ws = canvas_width * ss;

  // subsample coordinates: (cell + (k + 0.5) / ss) for k in [0, ss)
  std::vector<double> xs(ws), ys(hs);
  for (int64_t i = 0; i < ws; ++i)
    xs[i] = (i / ss) + ((i % ss) + 0.5) / static_cast<double>(ss);
  for (int64_t i = 0; i < hs; ++i)
    ys[i] = (i / ss) + ((i % ss) + 0.5) / static_cast<double>(ss);

  for (int64_t p = 0; p < num_polys; ++p) {
    const int64_t v0 = poly_offsets[p];
    const int64_t v1 = poly_offsets[p + 1];
    const int64_t nv = v1 - v0;
    if (nv < 3) continue;
    const double* poly = vertices + v0 * 2;

    double min_x = poly[0], max_x = poly[0], min_y = poly[1], max_y = poly[1];
    for (int64_t v = 1; v < nv; ++v) {
      min_x = std::min(min_x, poly[v * 2]);
      max_x = std::max(max_x, poly[v * 2]);
      min_y = std::min(min_y, poly[v * 2 + 1]);
      max_y = std::max(max_y, poly[v * 2 + 1]);
    }
    const int64_t x0 = std::max<int64_t>(
        0, static_cast<int64_t>(std::floor(min_x * ss)));
    const int64_t x1 = std::min<int64_t>(
        ws, static_cast<int64_t>(std::ceil(max_x * ss)) + 1);
    const int64_t y0 = std::max<int64_t>(
        0, static_cast<int64_t>(std::floor(min_y * ss)));
    const int64_t y1 = std::min<int64_t>(
        hs, static_cast<int64_t>(std::ceil(max_y * ss)) + 1);

    for (int64_t yy = y0; yy < y1; ++yy) {
      const double py = ys[yy];
      for (int64_t xx = x0; xx < x1; ++xx) {
        const double px = xs[xx];
        // even-odd rule (matches cellrender._points_in_polygon)
        bool inside = false;
        int64_t j = nv - 1;
        for (int64_t v = 0; v < nv; ++v) {
          const double xi = poly[v * 2], yi = poly[v * 2 + 1];
          const double xj = poly[j * 2], yj = poly[j * 2 + 1];
          if (((yi > py) != (yj > py)) &&
              (px < (xj - xi) * (py - yi) / (yj - yi + 1e-12) + xi)) {
            inside = !inside;
          }
          j = v;
        }
        if (!inside) continue;

        int32_t* stack = indices + (yy * ws + xx) * depth;
        for (int64_t d = depth - 1; d > 0; --d) stack[d] = stack[d - 1];
        stack[0] = static_cast<int32_t>(p);
        counts[yy * ws + xx] += 1;
      }
    }
  }
}

}  // extern "C"
