// FMM cubic-spline kernels — native hot path for DNDA.
//
// Implements EXACTLY the arithmetic of the numpy reference implementations
// in defensive_model_vae_tpu/dnda/{spline,frenet,paths}.py (same operation
// order, double precision throughout); results agree with the Python/numpy
// versions to the last ulp (occasional 1-ulp rounding differences from
// numpy's pairwise summation), which preserves all golden DNDA parity
// tests.  The Thomas sweeps are inherently sequential and the per-frame
// call counts are large (~60 spline ops/frame), which is why these live in
// C++ rather than numpy.
//
// C ABI:
//   dmv_fmm_spline(n, x, y, b_out, c_out, d_out) -> 0 ok / nonzero error
//   dmv_spline_eval(n, x, y, b, c, d, m, u, val_out, curv_out)
//   dmv_max_curvature(n, x, y, k_out) -> 0 ok
//       (mirrors paths._max_curvature: chord rotation + fit + curvature max)
//   dmv_frenet(n, px, py, m_equal, trans_x, trans_y, bx, cx, by, cy,
//              unit_arc_out, arc_len_out) -> 0 ok
//       (mirrors frenet.cartesian_to_frenet; output arrays are m_equal+1)
//
// Build: g++ -O2 -shared -fPIC -std=c++17 dnda_spline.cpp -o libdmvspline.so

#include <algorithm>
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
    // h**2 is rounded FIRST, matching numpy's `expr * h[0] ** 2 / denom`
    // association bit-for-bit (spline.py, fmm_spline_coeffs' FMM
    // end-condition block)
    rhs[0] = (c3_1 / (x[3] - x[1]) - c3_0 / (x[2] - x[0])) * (h[0] * h[0]) /
             (x[3] - x[0]);
    const double c3_m1 = slope[n - 2] - slope[n - 3];
    const double c3_m2 = slope[n - 3] - slope[n - 4];
    rhs[n - 1] = -(c3_m1 / (x[n - 1] - x[n - 3]) -
                   c3_m2 / (x[n - 2] - x[n - 4])) *
                 (h[n - 2] * h[n - 2]) / (x[n - 1] - x[n - 4]);
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

// spline_eval: value + |curvature| at query points.  Segment lookup is
// numpy searchsorted(x, u, side='right') - 1, clipped to [0, n-2].
void dmv_spline_eval(int64_t n, const double *x, const double *y,
                     const double *b, const double *c, const double *d,
                     int64_t m, const double *u, double *val, double *curv) {
  for (int64_t j = 0; j < m; ++j) {
    int64_t idx =
        static_cast<int64_t>(std::upper_bound(x, x + n, u[j]) - x) - 1;
    if (idx < 0)
      idx = 0;
    if (idx > n - 2)
      idx = n - 2;
    const double w = u[j] - x[idx];
    const double d1 = 3.0 * d[idx] * (w * w) + 2.0 * c[idx] * w + b[idx];
    const double d2 = 6.0 * d[idx] * w + 2.0 * c[idx];
    if (curv)
      curv[j] = std::fabs(d2) / std::pow(1.0 + d1 * d1, 1.5);
    if (val)
      val[j] = y[idx] + w * (b[idx] + w * (c[idx] + w * d[idx]));
  }
}

// paths._max_curvature: rotate the chord to +x, fit y(x), evaluate the
// curvature at max(100, n-1) uniform x samples, return the max.
int dmv_max_curvature(int64_t n, const double *x, const double *y,
                      double *k_out) {
  if (n < 2)
    return 1;
  const double cx0 = x[n - 1] - x[0];
  const double cy0 = y[n - 1] - y[0];
  const double norm = std::sqrt(cx0 * cx0 + cy0 * cy0);
  double ratio = cx0 / norm;
  if (ratio > 1.0)
    ratio = 1.0;
  if (ratio < -1.0)
    ratio = -1.0;
  double ang = std::acos(ratio);
  if (cy0 < 0)
    ang = -ang;
  const double ca = std::cos(-ang), sa = std::sin(-ang);

  std::vector<double> px(n), py(n);
  for (int64_t i = 0; i < n; ++i) {
    px[i] = ca * x[i] - sa * y[i];
    py[i] = sa * x[i] + ca * y[i];
  }
  for (int64_t i = 1; i < n; ++i)
    if (!(px[i] > px[i - 1]))
      return 2;

  const int64_t n_eval = std::max<int64_t>(100, n - 1);
  std::vector<double> b(n), c(n), d(n);
  const int rc = dmv_fmm_spline(n, px.data(), py.data(), b.data(), c.data(),
                                d.data());
  if (rc != 0)
    return rc;

  // numpy evaluation-point rounding: x0 + (j * span) / (n_eval - 1)
  const double span = px[n - 1] - px[0];
  double kmax = -HUGE_VAL;
  for (int64_t j = 0; j < n_eval; ++j) {
    const double uj =
        px[0] + (static_cast<double>(j) * span) / static_cast<double>(n_eval - 1);
    double k;
    dmv_spline_eval(n, px.data(), py.data(), b.data(), c.data(), d.data(), 1,
                    &uj, nullptr, &k);
    if (std::isnan(k)) {  // numpy's k.max() propagates NaN
      kmax = k;
      break;
    }
    if (k > kmax)
      kmax = k;
  }
  *k_out = kmax;
  return 0;
}

// numpy-identical pairwise summation (np.sum accumulation order), so
// arc_len matches the numpy oracle to the bit.
static double pairwise_sum(const double *a, int64_t n) {
  if (n < 8) {
    double s = 0.0;
    for (int64_t i = 0; i < n; ++i)
      s += a[i];
    return s;
  }
  if (n <= 128) {
    double r[8];
    for (int j = 0; j < 8; ++j)
      r[j] = a[j];
    int64_t i = 8;
    const int64_t lim = n - (n % 8);
    for (; i < lim; i += 8)
      for (int j = 0; j < 8; ++j)
        r[j] += a[i + j];
    double res = ((r[0] + r[1]) + (r[2] + r[3])) + ((r[4] + r[5]) + (r[6] + r[7]));
    for (; i < n; ++i)
      res += a[i];
    return res;
  }
  int64_t n2 = n / 2;
  n2 -= n2 % 8;
  return pairwise_sum(a, n2) + pairwise_sum(a + n2, n - n2);
}

// frenet.cartesian_to_frenet: uniform-arc resampling of a polyline.
// Outputs trans_x/trans_y/bx/cx/by/cy are caller buffers of m_equal+1.
int dmv_frenet(int64_t n, const double *in_x, const double *in_y,
               int64_t m_equal, double *trans_x, double *trans_y, double *bx,
               double *cx, double *by, double *cy, double *unit_arc_out,
               double *arc_len_out) {
  if (n < 2 || m_equal < 2)
    return 1;
  const double chx = in_x[n - 1] - in_x[0];
  const double chy = in_y[n - 1] - in_y[0];
  const double norm = std::sqrt(chx * chx + chy * chy);
  double ratio = chx / norm;
  if (ratio > 1.0)
    ratio = 1.0;
  if (ratio < -1.0)
    ratio = -1.0;
  double rot = std::acos(ratio);
  if (chy < 0)
    rot = -rot;
  const double ca = std::cos(-rot), sa = std::sin(-rot);

  std::vector<double> x(n), y(n);
  for (int64_t i = 0; i < n; ++i) {
    x[i] = ca * in_x[i] - sa * in_y[i];
    y[i] = sa * in_x[i] + ca * in_y[i];
  }
  for (int64_t i = 1; i < n; ++i)
    if (!(x[i] > x[i - 1]))
      return 2;

  // resample y(x) at m_equal uniform x samples
  std::vector<double> b(n), c(n), d(n);
  int rc = dmv_fmm_spline(n, x.data(), y.data(), b.data(), c.data(), d.data());
  if (rc != 0)
    return rc;
  std::vector<double> u(m_equal), s(m_equal);
  // numpy evaluation-point rounding: x0 + (j * span) / (m_equal - 1)
  const double span = x[n - 1] - x[0];
  for (int64_t j = 0; j < m_equal; ++j)
    u[j] = x[0] +
           (static_cast<double>(j) * span) / static_cast<double>(m_equal - 1);
  dmv_spline_eval(n, x.data(), y.data(), b.data(), c.data(), d.data(), m_equal,
                  u.data(), s.data(), nullptr);

  // chordal arc lengths + cumulative (cum matches np.cumsum: sequential;
  // arc_len matches np.sum: pairwise)
  std::vector<double> seg(m_equal - 1), cum(m_equal);
  cum[0] = 0.0;
  for (int64_t j = 0; j < m_equal - 1; ++j) {
    seg[j] = std::hypot(u[j + 1] - u[j], s[j + 1] - s[j]);
    cum[j + 1] = cum[j] + seg[j];
  }
  const double arc_len = pairwise_sum(seg.data(), m_equal - 1);
  const double unit_arc = arc_len / static_cast<double>(m_equal);
  *arc_len_out = arc_len;
  *unit_arc_out = unit_arc;

  // equal-arc re-division: idx = searchsorted(cum, target, 'left') - 1,
  // clipped to [0, m_equal-2]
  std::vector<double> nx(m_equal + 1), ny(m_equal + 1);
  nx[0] = u[0];
  ny[0] = s[0];
  for (int64_t k = 0; k < m_equal; ++k) {
    const double target = static_cast<double>(k + 1) * unit_arc;
    int64_t idx = static_cast<int64_t>(
                      std::lower_bound(cum.data(), cum.data() + m_equal,
                                       target) -
                      cum.data()) -
                  1;
    if (idx < 0)
      idx = 0;
    if (idx > m_equal - 2)
      idx = m_equal - 2;
    const double frac = target - cum[idx];
    const double du = u[idx + 1] - u[idx];
    const double ds = s[idx + 1] - s[idx];
    if (du == 0.0) {
      nx[k + 1] = u[idx];
      const double sign = (ds > 0.0) ? 1.0 : (ds < 0.0 ? -1.0 : 0.0);
      ny[k + 1] = s[idx] + sign * frac;
    } else {
      const double seg_len = seg[idx];
      nx[k + 1] = u[idx] + frac * (du / seg_len);
      ny[k + 1] = s[idx] + frac * (ds / seg_len);
    }
  }

  // rotate back and fit x(s), y(s) over the uniform arc grid
  const double cb = std::cos(rot), sb = std::sin(rot);
  std::vector<double> sg(m_equal + 1);
  for (int64_t k = 0; k <= m_equal; ++k) {
    trans_x[k] = cb * nx[k] - sb * ny[k];
    trans_y[k] = sb * nx[k] + cb * ny[k];
    sg[k] = static_cast<double>(k) * unit_arc;
  }
  std::vector<double> dx(m_equal + 1), dy(m_equal + 1);
  rc = dmv_fmm_spline(m_equal + 1, sg.data(), trans_x, bx, cx, dx.data());
  if (rc != 0)
    return rc;
  rc = dmv_fmm_spline(m_equal + 1, sg.data(), trans_y, by, cy, dy.data());
  return rc;
}

// Batched variants: one ctypes crossing for all candidate paths of a frame
// (the per-call marshaling dominates the scalar kernels' cost at ~10-25
// paths x ~3000 frames per sweep).  Inputs are concatenated per-path
// arrays with offsets; arithmetic is EXACTLY the scalar kernels', called
// in path order.

// k paths; path i has n[i] points at xs[off[i]] / ys[off[i]].
// k_out[i] = max curvature, rc_out[i] = scalar-kernel return code.
int dmv_max_curvature_batch(int64_t k, const int64_t *n, const int64_t *off,
                            const double *xs, const double *ys, double *k_out,
                            int32_t *rc_out) {
  int any = 0;
  for (int64_t i = 0; i < k; ++i) {
    rc_out[i] = dmv_max_curvature(n[i], xs + off[i], ys + off[i], &k_out[i]);
    if (rc_out[i] != 0)
      any = 1;
  }
  return any;
}

// Fused two-pass Cartesian->Frenet of core.prepare_frame: pass 1 at
// m_coarse measures the arc length only, m_equal = nearbyint(arc_len /
// unit_len) (== Python round(): ties-to-even under the default FP
// rounding mode), pass 2 resamples at m_equal into caller buffers of
// capacity cap_m+1.  Returns 0 ok; 3 = m_equal < 2 or > cap_m (caller
// falls back to the two scalar calls); other codes propagate.
int dmv_frenet_two_pass(int64_t n, const double *px, const double *py,
                        int64_t m_coarse, double unit_len, int64_t cap_m,
                        double *trans_x, double *trans_y, double *bx,
                        double *cx, double *by, double *cy,
                        double *unit_arc_out, double *arc_len_out,
                        int64_t *m_equal_out) {
  std::vector<double> tx(m_coarse + 1), ty(m_coarse + 1), sbx(m_coarse + 1),
      scx(m_coarse + 1), sby(m_coarse + 1), scy(m_coarse + 1);
  double ua = 0.0, al = 0.0;
  int rc = dmv_frenet(n, px, py, m_coarse, tx.data(), ty.data(), sbx.data(),
                      scx.data(), sby.data(), scy.data(), &ua, &al);
  if (rc != 0)
    return rc;
  const int64_t m_equal = static_cast<int64_t>(std::nearbyint(al / unit_len));
  *m_equal_out = m_equal;
  if (m_equal < 2 || m_equal > cap_m)
    return 3;
  rc = dmv_frenet(n, px, py, m_equal, trans_x, trans_y, bx, cx, by, cy,
                  unit_arc_out, arc_len_out);
  return rc;
}

// k paths resampled at a SHARED m_equal; outputs are row-major (k,
// m_equal+1) blocks.  rc_out[i] = scalar-kernel return code.
int dmv_frenet_batch(int64_t k, const int64_t *n, const int64_t *off,
                     const double *xs, const double *ys, int64_t m_equal,
                     double *trans_x, double *trans_y, double *bx, double *cx,
                     double *by, double *cy, double *unit_arc,
                     double *arc_len, int32_t *rc_out) {
  const int64_t m1 = m_equal + 1;
  int any = 0;
  for (int64_t i = 0; i < k; ++i) {
    rc_out[i] =
        dmv_frenet(n[i], xs + off[i], ys + off[i], m_equal, trans_x + i * m1,
                   trans_y + i * m1, bx + i * m1, cx + i * m1, by + i * m1,
                   cy + i * m1, &unit_arc[i], &arc_len[i]);
    if (rc_out[i] != 0)
      any = 1;
  }
  return any;
}

} // extern "C"
