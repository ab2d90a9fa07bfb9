// FMM cubic-spline coefficient solver — native hot path for DNDA.
//
// Implements EXACTLY the arithmetic of
// defensive_model_vae_tpu/dnda/spline.py::fmm_spline_coeffs (same operation
// order, double precision throughout); results agree with the Python/numpy
// version to the last ulp (occasional 1-ulp rounding differences from
// vectorized numpy ufuncs), which preserves all golden DNDA parity tests.  The Thomas forward/backward sweeps are inherently
// sequential, which is why this lives in C++ rather than numpy.
//
// C ABI:
//   dmv_fmm_spline(n, x, y, b_out, c_out, d_out) -> 0 ok / nonzero error
//
// Build: g++ -O2 -shared -fPIC -std=c++17 dnda_spline.cpp -o libdmvspline.so

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

int dmv_fmm_spline(int64_t n, const double *x, const double *y,
                   double *b, double *c, double *d) {
  if (n < 2)
    return 1;
  for (int64_t i = 1; i < n; ++i)
    if (!(x[i] > x[i - 1]))
      return 2;

  for (int64_t i = 0; i < n; ++i)
    b[i] = c[i] = d[i] = 0.0;

  if (n == 2) {
    b[0] = b[1] = (y[1] - y[0]) / (x[1] - x[0]);
    return 0;
  }

  std::vector<double> h(n - 1), slope(n - 1), diag(n, 0.0), rhs(n, 0.0);
  for (int64_t i = 0; i < n - 1; ++i) {
    h[i] = x[i + 1] - x[i];
    slope[i] = (y[i + 1] - y[i]) / h[i];
  }
  for (int64_t i = 1; i < n - 1; ++i) {
    diag[i] = 2.0 * (h[i - 1] + h[i]);
    rhs[i] = slope[i] - slope[i - 1];
  }
  diag[0] = -h[0];
  diag[n - 1] = -h[n - 2];
  if (n > 3) {
    // third-difference end conditions (c3 = diff(slope))
    const double c3_0 = slope[1] - slope[0];
    const double c3_1 = slope[2] - slope[1];
    rhs[0] = (c3_1 / (x[3] - x[1]) - c3_0 / (x[2] - x[0])) * h[0] * h[0] /
             (x[3] - x[0]);
    const double c3_m1 = slope[n - 2] - slope[n - 3];
    const double c3_m2 = slope[n - 3] - slope[n - 4];
    rhs[n - 1] = -(c3_m1 / (x[n - 1] - x[n - 3]) -
                   c3_m2 / (x[n - 2] - x[n - 4])) *
                 h[n - 2] * h[n - 2] / (x[n - 1] - x[n - 4]);
  }

  // Thomas sweep (same order as the Python implementation)
  std::vector<double> cp(n), dp(n), sigma(n);
  cp[0] = diag[0];
  dp[0] = rhs[0];
  for (int64_t i = 1; i < n; ++i) {
    const double m = h[i - 1] / cp[i - 1];
    cp[i] = diag[i] - m * h[i - 1];
    dp[i] = rhs[i] - m * dp[i - 1];
  }
  sigma[n - 1] = dp[n - 1] / cp[n - 1];
  for (int64_t i = n - 2; i >= 0; --i)
    sigma[i] = (dp[i] - h[i] * sigma[i + 1]) / cp[i];

  for (int64_t i = 0; i < n - 1; ++i) {
    b[i] = slope[i] - h[i] * (sigma[i + 1] + 2.0 * sigma[i]);
    d[i] = (sigma[i + 1] - sigma[i]) / h[i];
  }
  b[n - 1] = slope[n - 2] + h[n - 2] * (sigma[n - 2] + 2.0 * sigma[n - 1]);
  for (int64_t i = 0; i < n; ++i)
    c[i] = 3.0 * sigma[i];
  d[n - 1] = d[n - 2];
  return 0;
}

} // extern "C"
