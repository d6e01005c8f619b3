// KITTI odometry evaluation: translational / rotational segment errors.
//
// Clean-room implementation of the benchmark metric semantics
// (SURVEY.md R13 / §3.3): for each start frame (every `step` frames)
// and each segment length in {100..800} m of driven path, compute the
// relative-pose error E = inv(inv(gt_i) gt_j) * (inv(pred_i) pred_j);
// t_err = |trans(E)| / len, r_err = angle(E) / len. Averages reported
// as percent and deg per 100 m. Mirrors davo_tpu/eval/metrics.py —
// each implementation cross-checks the other in tests/test_devkit.py.
//
// Build: g++ -O2 -shared -fPIC -o libkitti_eval.so evaluate_odometry.cc
//        g++ -O2 -o evaluate_odometry evaluate_odometry.cc -DKITTI_MAIN

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Mat4 {
  double m[16];  // row-major

  static Mat4 identity() {
    Mat4 r{};
    r.m[0] = r.m[5] = r.m[10] = r.m[15] = 1.0;
    return r;
  }
};

Mat4 matmul(const Mat4& a, const Mat4& b) {
  Mat4 r{};
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      double s = 0.0;
      for (int k = 0; k < 4; ++k) s += a.m[4 * i + k] * b.m[4 * k + j];
      r.m[4 * i + j] = s;
    }
  return r;
}

// Rigid-transform inverse: R^T, -R^T t.
Mat4 inverse_rigid(const Mat4& a) {
  Mat4 r = Mat4::identity();
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) r.m[4 * i + j] = a.m[4 * j + i];
  for (int i = 0; i < 3; ++i) {
    double s = 0.0;
    for (int j = 0; j < 3; ++j) s += r.m[4 * i + j] * a.m[4 * j + 3];
    r.m[4 * i + 3] = -s;
  }
  return r;
}

double rotation_angle(const Mat4& e) {
  // atan2 form: well-conditioned near zero angle (acos(trace) loses
  // half the float digits there). Matches davo_tpu/eval/metrics.py.
  double tr = e.m[0] + e.m[5] + e.m[10];
  double c = 0.5 * (tr - 1.0);
  if (c > 1.0) c = 1.0;
  if (c < -1.0) c = -1.0;
  double vx = e.m[9] - e.m[6];
  double vy = e.m[2] - e.m[8];
  double vz = e.m[4] - e.m[1];
  double s = 0.5 * std::sqrt(vx * vx + vy * vy + vz * vz);
  return std::atan2(s, c);
}

double translation_norm(const Mat4& e) {
  return std::sqrt(e.m[3] * e.m[3] + e.m[7] * e.m[7] + e.m[11] * e.m[11]);
}

const double kLengths[] = {100, 200, 300, 400, 500, 600, 700, 800};
const int kNumLengths = 8;

std::vector<double> trajectory_distances(const std::vector<Mat4>& poses) {
  std::vector<double> dist(poses.size(), 0.0);
  for (size_t i = 1; i < poses.size(); ++i) {
    double dx = poses[i].m[3] - poses[i - 1].m[3];
    double dy = poses[i].m[7] - poses[i - 1].m[7];
    double dz = poses[i].m[11] - poses[i - 1].m[11];
    dist[i] = dist[i - 1] + std::sqrt(dx * dx + dy * dy + dz * dz);
  }
  return dist;
}

// First frame index j with dist[j] STRICTLY > dist[first] + len, or
// -1 (official devkit lastFrameFromSegmentLength tie semantics).
int frame_at_distance(const std::vector<double>& dist, int first, double len) {
  double target = dist[first] + len;
  for (size_t j = first; j < dist.size(); ++j)
    if (dist[j] > target) return static_cast<int>(j);
  return -1;
}

}  // namespace

extern "C" {

// gt/pred: n x 16 row-major 4x4 pose matrices. Returns the number of
// evaluated segments; outputs mean t_err (fraction) and r_err (rad/m).
int kitti_evaluate(const double* gt_data, const double* pred_data, int n,
                   int step, double* t_err_out, double* r_err_out) {
  if (n <= 1) return 0;
  std::vector<Mat4> gt(n), pred(n);
  for (int i = 0; i < n; ++i) {
    std::memcpy(gt[i].m, gt_data + 16 * i, sizeof(double) * 16);
    std::memcpy(pred[i].m, pred_data + 16 * i, sizeof(double) * 16);
  }
  std::vector<double> dist = trajectory_distances(gt);

  double t_sum = 0.0, r_sum = 0.0;
  int count = 0;
  for (int first = 0; first < n; first += step) {
    for (int li = 0; li < kNumLengths; ++li) {
      double len = kLengths[li];
      int last = frame_at_distance(dist, first, len);
      if (last < 0) continue;
      Mat4 gt_rel = matmul(inverse_rigid(gt[first]), gt[last]);
      Mat4 pr_rel = matmul(inverse_rigid(pred[first]), pred[last]);
      Mat4 e = matmul(inverse_rigid(gt_rel), pr_rel);
      t_sum += translation_norm(e) / len;
      r_sum += rotation_angle(e) / len;
      ++count;
    }
  }
  if (count == 0) return 0;
  *t_err_out = t_sum / count;
  *r_err_out = r_sum / count;
  return count;
}

}  // extern "C"

#ifdef KITTI_MAIN
namespace {

std::vector<Mat4> load_poses(const char* path) {
  std::vector<Mat4> poses;
  FILE* f = std::fopen(path, "r");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path);
    std::exit(1);
  }
  double v[12];
  while (std::fscanf(f, "%lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf",
                     &v[0], &v[1], &v[2], &v[3], &v[4], &v[5], &v[6], &v[7],
                     &v[8], &v[9], &v[10], &v[11]) == 12) {
    Mat4 p = Mat4::identity();
    std::memcpy(p.m, v, sizeof(double) * 12);
    poses.push_back(p);
  }
  std::fclose(f);
  return poses;
}

}  // namespace

int main(int argc, char** argv) {
  int step = 10;
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s gt.txt pred.txt [step]\n", argv[0]);
    return 1;
  }
  if (argc > 3) step = std::atoi(argv[3]);
  std::vector<Mat4> gt = load_poses(argv[1]);
  std::vector<Mat4> pred = load_poses(argv[2]);
  if (gt.size() != pred.size()) {
    std::fprintf(stderr, "pose count mismatch: %zu vs %zu\n", gt.size(),
                 pred.size());
    return 1;
  }
  std::vector<double> flat_gt(gt.size() * 16), flat_pred(gt.size() * 16);
  for (size_t i = 0; i < gt.size(); ++i) {
    std::memcpy(&flat_gt[16 * i], gt[i].m, sizeof(double) * 16);
    std::memcpy(&flat_pred[16 * i], pred[i].m, sizeof(double) * 16);
  }
  double t_err = 0.0, r_err = 0.0;
  int count = kitti_evaluate(flat_gt.data(), flat_pred.data(),
                             static_cast<int>(gt.size()), step, &t_err, &r_err);
  std::printf(
      "{\"t_err_pct\": %.6f, \"r_err_deg_per_100m\": %.6f, "
      "\"n_segments\": %d}\n",
      100.0 * t_err, r_err * 180.0 / M_PI * 100.0, count);
  return 0;
}
#endif
