// dray_native — host-side native runtime for distributed_raytracer_tpu.
//
// The reference implements its entire runtime in native code (Rust: the
// socket fleet, scene distribution, pixel fan-in).  The TPU build's device
// path is XLA/Pallas; this library is the native HOST runtime around it:
//
//   * tonemap/pack   — gamma-2 + clamp + ARGB packing (colors.rs:9-46), the
//                      per-snapshot progressive-display transform
//   * shuffle        — deterministic Fisher-Yates pixel permutation, the
//                      seeded replacement for CameraRayIterator's shuffled
//                      progressive fill (camera.rs:68-116, rand::rng there)
//   * accumulate     — raw-sum/count scatter accumulation (write_color,
//                      colors.rs:26-46) for host-side pixel fan-in
//   * morton sort +  — scene preprocessing for the block-culled intersect
//     cluster bounds    sweep (the TPU-shaped acceleration structure: spheres
//                      Morton-ordered so VMEM chunks are spatially tight,
//                      with per-chunk bounding spheres the kernel tests
//                      before sweeping — fixing, not copying, the broken
//                      AABB slab test at bounding_box.rs:50-76)
//
// C ABI, loaded from Python via ctypes (native.py); every entry point has a
// NumPy fallback so the framework still runs if the library isn't built.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// splitmix64 — deterministic seeding (the reference's RNG is unseeded
// thread RNG, prelude.rs:23-25; we require reproducibility)
// ---------------------------------------------------------------------------
static inline uint64_t splitmix64(uint64_t& state) {
  uint64_t z = (state += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

// Fisher-Yates shuffle of an int32 index array.
void dray_shuffle(int32_t* idx, int64_t n, uint64_t seed) {
  uint64_t s = seed;
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = (int64_t)(splitmix64(s) % (uint64_t)(i + 1));
    std::swap(idx[i], idx[j]);
  }
}

// ---------------------------------------------------------------------------
// tonemap: linear f32 RGB -> gamma-2, clamp [0, 0.999], scale 255.999
// (colors.rs:9-24) -> bytes or packed 0xFFRRGGBB u32 (colors.rs:43)
// ---------------------------------------------------------------------------
static inline uint32_t quant(float v) {
  float g = v > 0.0f ? std::sqrt(v) : 0.0f;
  g = g < 0.0f ? 0.0f : (g > 0.999f ? 0.999f : g);
  return (uint32_t)(255.999f * g);
}

void dray_tonemap_bytes(const float* rgb, int64_t n_pixels, uint8_t* out) {
  for (int64_t i = 0; i < n_pixels; ++i) {
    out[3 * i + 0] = (uint8_t)quant(rgb[3 * i + 0]);
    out[3 * i + 1] = (uint8_t)quant(rgb[3 * i + 1]);
    out[3 * i + 2] = (uint8_t)quant(rgb[3 * i + 2]);
  }
}

void dray_tonemap_pack(const float* rgb, int64_t n_pixels, uint32_t* out) {
  for (int64_t i = 0; i < n_pixels; ++i) {
    uint32_t r = quant(rgb[3 * i + 0]);
    uint32_t g = quant(rgb[3 * i + 1]);
    uint32_t b = quant(rgb[3 * i + 2]);
    out[i] = (255u << 24) | (r << 16) | (g << 8) | b;
  }
}

// ---------------------------------------------------------------------------
// accumulate: raw[pix] += color; count[pix] += 1  (write_color semantics,
// colors.rs:37-39) — the host-side pixel fan-in of the orchestrator's
// pixel-return path (orchestrator_server.rs:26-38)
// ---------------------------------------------------------------------------
void dray_accumulate(float* raw, int32_t* count, const float* colors,
                     const int32_t* pixel_ids, int64_t n, int64_t n_pix) {
  for (int64_t i = 0; i < n; ++i) {
    int32_t p = pixel_ids[i];
    if (p < 0 || p >= n_pix) continue;
    raw[3 * p + 0] += colors[3 * i + 0];
    raw[3 * p + 1] += colors[3 * i + 1];
    raw[3 * p + 2] += colors[3 * i + 2];
    count[p] += 1;
  }
}

// mean + pack in one pass (the per-refresh transform of colors.rs:40-44)
void dray_mean_pack(const float* raw, const int32_t* count, int64_t n_pix,
                    uint32_t* out) {
  for (int64_t i = 0; i < n_pix; ++i) {
    float denom = count[i] != 0 ? (float)count[i] : 1.0f;
    float rgb[3] = {raw[3 * i] / denom, raw[3 * i + 1] / denom,
                    raw[3 * i + 2] / denom};
    uint32_t r = quant(rgb[0]), g = quant(rgb[1]), b = quant(rgb[2]);
    out[i] = (255u << 24) | (r << 16) | (g << 8) | b;
  }
}

// ---------------------------------------------------------------------------
// Morton ordering + cluster bounds — the acceleration-structure builder.
//
// Spheres are sorted along a 3D Morton curve so that consecutive index
// ranges are spatially compact; the device kernel sweeps spheres in
// contiguous VMEM chunks, so chunk == cluster, and a per-chunk bounding
// sphere lets the kernel skip whole chunks per ray block.
// ---------------------------------------------------------------------------
static inline uint64_t expand_bits_21(uint64_t v) {
  v &= 0x1FFFFF;  // 21 bits
  v = (v | (v << 32)) & 0x1F00000000FFFFULL;
  v = (v | (v << 16)) & 0x1F0000FF0000FFULL;
  v = (v | (v << 8)) & 0x100F00F00F00F00FULL;
  v = (v | (v << 4)) & 0x10C30C30C30C30C3ULL;
  v = (v | (v << 2)) & 0x1249249249249249ULL;
  return v;
}

static inline uint64_t morton3(double x, double y, double z) {
  // x,y,z normalized to [0,1)
  auto q = [](double t) {
    t = t < 0.0 ? 0.0 : (t > 1.0 ? 1.0 : t);
    return (uint64_t)(t * 2097151.0);  // 2^21 - 1
  };
  return (expand_bits_21(q(x)) << 2) | (expand_bits_21(q(y)) << 1) |
         expand_bits_21(q(z));
}

// Sorts sphere indices by Morton code of their centers.
//   centers: [n*3] f32, radii: [n] f32
//   order_out: [n] int32 — permutation (new position -> old index)
//   cluster_size: spheres per cluster (device chunk size)
//   cluster_bounds_out: [ceil(n/cluster_size)*4] f32 — (cx, cy, cz, r) of a
//     bounding sphere per cluster (covering member spheres incl. radii)
// Returns number of clusters.
int32_t dray_build_clusters(const float* centers, const float* radii,
                            int32_t n, int32_t cluster_size,
                            int32_t* order_out, float* cluster_bounds_out) {
  if (n <= 0 || cluster_size <= 0) return 0;
  // bounding box for normalization
  double lo[3] = {1e30, 1e30, 1e30}, hi[3] = {-1e30, -1e30, -1e30};
  for (int32_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      double v = centers[3 * i + d];
      lo[d] = std::min(lo[d], v);
      hi[d] = std::max(hi[d], v);
    }
  double span[3];
  for (int d = 0; d < 3; ++d) span[d] = std::max(hi[d] - lo[d], 1e-12);

  std::vector<std::pair<uint64_t, int32_t>> keyed(n);
  for (int32_t i = 0; i < n; ++i) {
    keyed[i] = {morton3((centers[3 * i] - lo[0]) / span[0],
                        (centers[3 * i + 1] - lo[1]) / span[1],
                        (centers[3 * i + 2] - lo[2]) / span[2]),
                i};
  }
  std::sort(keyed.begin(), keyed.end());
  for (int32_t i = 0; i < n; ++i) order_out[i] = keyed[i].second;

  int32_t n_clusters = (n + cluster_size - 1) / cluster_size;
  for (int32_t c = 0; c < n_clusters; ++c) {
    int32_t b = c * cluster_size, e = std::min(n, b + cluster_size);
    // centroid
    double cx = 0, cy = 0, cz = 0;
    for (int32_t i = b; i < e; ++i) {
      int32_t o = order_out[i];
      cx += centers[3 * o];
      cy += centers[3 * o + 1];
      cz += centers[3 * o + 2];
    }
    double m = (double)(e - b);
    cx /= m; cy /= m; cz /= m;
    // radius covering every member sphere
    double r = 0;
    for (int32_t i = b; i < e; ++i) {
      int32_t o = order_out[i];
      double dx = centers[3 * o] - cx, dy = centers[3 * o + 1] - cy,
             dz = centers[3 * o + 2] - cz;
      r = std::max(r, std::sqrt(dx * dx + dy * dy + dz * dz) +
                          (double)radii[o]);
    }
    cluster_bounds_out[4 * c + 0] = (float)cx;
    cluster_bounds_out[4 * c + 1] = (float)cy;
    cluster_bounds_out[4 * c + 2] = (float)cz;
    cluster_bounds_out[4 * c + 3] = (float)r;
  }
  return n_clusters;
}

}  // extern "C"
