// sks_native — CPU-side runtime for the TPU framework.
//
// Capability parity with the reference's C++ stack: the scalar ACA/SKS
// solvers (modules/ACA_SKS.cpp), the wall-fixture reader
// (CPU_Runtime Test/utils.cpp:6-21 format: count header, then
// "x1 y1 x2 y2" per line), and the 10M-iteration hot-loop CPU benchmark
// (CPU_Runtime Test/main.cpp:61-114).  Implemented from the same independent
// derivation as sks_tpu/ops/aca.py (see that module's docstring for the
// math); templated over float/double instead of duplicated sources.
//
// Role in the TPU framework: fp64 oracle for solver parity tests (TPU has no
// native f64), host-side data loading, and the reference-comparable CPU
// latency numbers (BASELINE.md Table 5).

#include <chrono>
#include <cinttypes>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

// ---------------------------------------------------------------------------
// ACA: H = H_A2^{-1} . H_C . H_A1, division-free up to scale.
// Derivation in sks_tpu/ops/aca.py.  src/tar: [Mx,My,Nx,Ny,Px,Py,Qx,Qy].
template <typename T>
inline void aca_core(const T* s, const T* t, T* h) {
  const T e1x = s[2] - s[0], e1y = s[3] - s[1];
  const T f1x = s[4] - s[0], f1y = s[5] - s[1];
  const T g1x = s[6] - s[0], g1y = s[7] - s[1];
  const T f1 = e1x * f1y - e1y * f1x;
  const T alpha = f1y * g1x - f1x * g1y;
  const T beta = e1x * g1y - e1y * g1x;

  const T e2x = t[2] - t[0], e2y = t[3] - t[1];
  const T f2x = t[4] - t[0], f2y = t[5] - t[1];
  const T g2x = t[6] - t[0], g2y = t[7] - t[1];
  const T f2 = e2x * f2y - e2y * f2x;
  const T gamma = f2y * g2x - f2x * g2y;
  const T delta = e2x * g2y - e2y * g2x;

  const T c = beta * (gamma * (f1 - beta) - alpha * (f2 - delta));
  const T d = alpha * (delta * (f1 - alpha) - beta * (f2 - gamma));
  const T e = alpha * beta * (f2 - gamma - delta);
  const T ce = c + e, de = d + e;

  const T t00 = e2x * ce + t[0] * c, t01 = f2x * de + t[0] * d, t02 = t[0] * e;
  const T t10 = e2y * ce + t[1] * c, t11 = f2y * de + t[1] * d, t12 = t[1] * e;

  const T a00 = f1y, a01 = -f1x, a10 = -e1y, a11 = e1x;
  const T a02 = -(a00 * s[0] + a01 * s[1]);
  const T a12 = -(a10 * s[0] + a11 * s[1]);

  h[0] = t00 * a00 + t01 * a10;
  h[1] = t00 * a01 + t01 * a11;
  h[2] = t00 * a02 + t01 * a12 + t02 * f1;
  h[3] = t10 * a00 + t11 * a10;
  h[4] = t10 * a01 + t11 * a11;
  h[5] = t10 * a02 + t11 * a12 + t12 * f1;
  h[6] = c * a00 + d * a10;
  h[7] = c * a01 + d * a11;
  h[8] = c * a02 + d * a12 + e * f1;
}

// ---------------------------------------------------------------------------
// SKS: H = H_S2^{-1} . H_K . H_S1.  Derivation in sks_tpu/ops/sks.py.
template <typename T>
inline void sks_core(const T* s, const T* t, T* h) {
  // Similarity-canonical coords of P, Q for each plane.
  const T w1x = T(0.5) * (s[2] - s[0]), w1y = T(0.5) * (s[3] - s[1]);
  const T o1x = T(0.5) * (s[2] + s[0]), o1y = T(0.5) * (s[3] + s[1]);
  const T inv1 = T(1) / (w1x * w1x + w1y * w1y);
  const T p1dx = s[4] - o1x, p1dy = s[5] - o1y;
  const T q1dx = s[6] - o1x, q1dy = s[7] - o1y;
  const T p = (w1x * p1dx + w1y * p1dy) * inv1;
  const T q = (-w1y * p1dx + w1x * p1dy) * inv1;
  const T r = (w1x * q1dx + w1y * q1dy) * inv1;
  const T ss = (-w1y * q1dx + w1x * q1dy) * inv1;

  const T w2x = T(0.5) * (t[2] - t[0]), w2y = T(0.5) * (t[3] - t[1]);
  const T o2x = T(0.5) * (t[2] + t[0]), o2y = T(0.5) * (t[3] + t[1]);
  const T inv2 = T(1) / (w2x * w2x + w2y * w2y);
  const T p2dx = t[4] - o2x, p2dy = t[5] - o2y;
  const T q2dx = t[6] - o2x, q2dy = t[7] - o2y;
  const T p2 = (w2x * p2dx + w2y * p2dy) * inv2;
  const T q2 = (-w2y * p2dx + w2x * p2dy) * inv2;
  const T r2 = (w2x * q2dx + w2y * q2dy) * inv2;
  const T s2 = (-w2y * q2dx + w2x * q2dy) * inv2;

  // 4-DOF kernel fixing (+-1, 0): symmetric 2x2 solve (ops/sks.py docstring).
  const T k1 = q / q2, k3 = p2 * k1;
  const T k2 = ss / s2, k4 = r2 * k2;
  const T g = p * ss - r * q, hh = ss - q;
  const T invdet = T(1) / (g * g - hh * hh);
  const T rhs_a = k3 * ss - k4 * q, rhs_u = k1 * ss - k2 * q;
  const T a = (g * rhs_a - hh * rhs_u) * invdet;
  const T u = (g * rhs_u - hh * rhs_a) * invdet;
  const T invq = T(1) / q;
  const T v = (k1 - a - u * p) * invq;
  const T b = (k3 - a * p - u) * invq;

  // H_L = H_S2^{-1} @ H_K.
  const T l00 = w2x * a + o2x * u, l01 = w2x * b - w2y + o2x * v,
          l02 = w2x * u + o2x * a;
  const T l10 = w2y * a + o2y * u, l11 = w2y * b + w2x + o2y * v,
          l12 = w2y * u + o2y * a;
  const T l20 = u, l21 = v, l22 = a;

  // H = H_L @ H_S1h (up to scale).
  const T t0 = -(w1x * o1x + w1y * o1y);
  const T t1 = w1y * o1x - w1x * o1y;
  const T wsq1 = w1x * w1x + w1y * w1y;

  h[0] = l00 * w1x - l01 * w1y;
  h[1] = l00 * w1y + l01 * w1x;
  h[2] = l00 * t0 + l01 * t1 + l02 * wsq1;
  h[3] = l10 * w1x - l11 * w1y;
  h[4] = l10 * w1y + l11 * w1x;
  h[5] = l10 * t0 + l11 * t1 + l12 * wsq1;
  h[6] = l20 * w1x - l21 * w1y;
  h[7] = l20 * w1y + l21 * w1x;
  h[8] = l20 * t0 + l21 * t1 + l22 * wsq1;
}

template <typename T>
inline void normalize9(T* h) {
  const T inv = T(1) / h[8];
  for (int i = 0; i < 9; ++i) h[i] *= inv;
}

template <typename T, void (*Core)(const T*, const T*, T*)>
void batch(const T* src, const T* tar, T* out, int64_t n, int normalize) {
  for (int64_t i = 0; i < n; ++i) {
    Core(src + 8 * i, tar + 8 * i, out + 9 * i);
    if (normalize) normalize9(out + 9 * i);
  }
}

using clk = std::chrono::steady_clock;

template <typename T, void (*Core)(const T*, const T*, T*)>
double hot_loop_ns(const T* src, const T* tar, int64_t iters) {
  // The reference's CPU benchmark shape: one cache-hot 4-point set, solver in
  // a tight loop (main.cpp:61-114).  volatile sink defeats dead-code elim.
  T h[9];
  auto t0 = clk::now();
  for (int64_t i = 0; i < iters; ++i) {
    Core(src, tar, h);
    normalize9(h);
    asm volatile("" : : "r"(h[0]), "r"(h[8]) : "memory");
  }
  auto t1 = clk::now();
  return double(std::chrono::duration_cast<std::chrono::nanoseconds>(t1 - t0)
                    .count()) /
         double(iters);
}

}  // namespace

extern "C" {

// Batched solvers. src/tar: n*8 (AoS), out: n*9 row-major homographies.
void sks_aca_f32(const float* s, const float* t, float* o, int64_t n, int nrm) {
  batch<float, aca_core<float>>(s, t, o, n, nrm);
}
void sks_aca_f64(const double* s, const double* t, double* o, int64_t n,
                 int nrm) {
  batch<double, aca_core<double>>(s, t, o, n, nrm);
}
void sks_sks_f32(const float* s, const float* t, float* o, int64_t n, int nrm) {
  batch<float, sks_core<float>>(s, t, o, n, nrm);
}
void sks_sks_f64(const double* s, const double* t, double* o, int64_t n,
                 int nrm) {
  batch<double, sks_core<double>>(s, t, o, n, nrm);
}

// Hot-loop nanoseconds per solve (reference Table 5 configuration).
double sks_bench_aca_f32(const float* s, const float* t, int64_t iters) {
  return hot_loop_ns<float, aca_core<float>>(s, t, iters);
}
double sks_bench_aca_f64(const double* s, const double* t, int64_t iters) {
  return hot_loop_ns<double, aca_core<double>>(s, t, iters);
}
double sks_bench_sks_f32(const float* s, const float* t, int64_t iters) {
  return hot_loop_ns<float, sks_core<float>>(s, t, iters);
}
double sks_bench_sks_f64(const double* s, const double* t, int64_t iters) {
  return hot_loop_ns<double, sks_core<double>>(s, t, iters);
}

// Correspondence-file reader (reference format: count, then x1 y1 x2 y2).
// Returns the number of rows read (<= cap), or -1 on error.
int64_t sks_read_points(const char* path, double* src_xy, double* tar_xy,
                        int64_t cap) {
  FILE* f = std::fopen(path, "r");
  if (!f) return -1;
  int64_t count = 0;
  if (std::fscanf(f, "%" SCNd64, &count) != 1) {
    std::fclose(f);
    return -1;
  }
  if (count > cap) count = cap;
  int64_t i = 0;
  for (; i < count; ++i) {
    double x1, y1, x2, y2;
    if (std::fscanf(f, "%lf %lf %lf %lf", &x1, &y1, &x2, &y2) != 4) break;
    src_xy[2 * i] = x1;
    src_xy[2 * i + 1] = y1;
    tar_xy[2 * i] = x2;
    tar_xy[2 * i + 1] = y2;
  }
  std::fclose(f);
  return i;
}

}  // extern "C"
