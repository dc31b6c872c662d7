// Baseline measurement: single-thread C++ kd-tree hypothesis verification.
//
// Re-derivation (not a copy) of the reference's hottest loop - per-candidate
// WeightedVerify (reference match4pcsBase.cc:1733-1766): for each of H rigid
// transforms, every validation-cloud point is transformed and queried against
// a kd-tree over the segment cloud with a restricted radius (delta); a match
// within delta whose rotated normal agrees with the matched segment normal
// within 30 degrees (angle folded about 180) accumulates that segment point's
// probability. Shapes match bench.py: NV=4096 model points, NS=1024 segment
// points, delta=0.005.
//
// The kd-tree here is a standard median-split 3D tree with
// prune-by-splitting-plane radius-restricted NN descent - functionally the
// same query the reference's fixed-depth kd-tree performs
// (accelerators/kdtree.h doQueryRestrictedClosestIndex).
//
// Build + run (see scripts/measure_baseline.py):
//   g++ -O3 -march=native -std=c++17 baseline_kdtree.cc -o baseline_kdtree
//   ./baseline_kdtree [H=512] [mode=easy|clutter]
// Prints one JSON line: {"hyps_per_sec": ..., "nn_queries_per_sec": ...}.
//
// Modes mirror bench.py's two configs: "easy" = all hypotheses are sigma=1cm
// perturbations of the true offset (most queries hit); "clutter" = half the
// hypotheses are garbage and a quarter of the segment is uniform clutter
// (most queries miss - exercises full-radius kd-tree descents).

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <string_view>
#include <vector>

struct Vec3 {
  float x, y, z;
};

static inline float sqdist(const Vec3 &a, const Vec3 &b) {
  const float dx = a.x - b.x, dy = a.y - b.y, dz = a.z - b.z;
  return dx * dx + dy * dy + dz * dz;
}

// ---- median-split kd-tree over a fixed point set --------------------------
class KdTree3 {
 public:
  explicit KdTree3(const std::vector<Vec3> &pts) : pts_(pts) {
    idx_.resize(pts.size());
    for (size_t i = 0; i < pts.size(); ++i) idx_[i] = static_cast<int>(i);
    nodes_.reserve(2 * pts.size());
    root_ = build(0, static_cast<int>(pts.size()), 0);
  }

  // Nearest neighbor within sqrt(sq_radius); -1 if none.
  int queryRestricted(const Vec3 &q, float sq_radius) const {
    int best = -1;
    float best_d2 = sq_radius;
    search(root_, q, best, best_d2);
    return best;
  }

 private:
  struct Node {
    int axis;       // -1 for leaf
    float split;
    int left, right;   // children (internal) or [begin,end) into idx_ (leaf)
  };

  int build(int begin, int end, int depth) {
    Node n;
    const int id = static_cast<int>(nodes_.size());
    nodes_.push_back(n);
    if (end - begin <= 8) {
      nodes_[id] = {-1, 0.f, begin, end};
      return id;
    }
    const int axis = depth % 3;
    const int mid = (begin + end) / 2;
    std::nth_element(
        idx_.begin() + begin, idx_.begin() + mid, idx_.begin() + end,
        [&](int a, int b) { return coord(pts_[a], axis) < coord(pts_[b], axis); });
    const float split = coord(pts_[idx_[mid]], axis);
    const int l = build(begin, mid, depth + 1);
    const int r = build(mid, end, depth + 1);
    nodes_[id] = {axis, split, l, r};
    return id;
  }

  static inline float coord(const Vec3 &p, int axis) {
    return axis == 0 ? p.x : (axis == 1 ? p.y : p.z);
  }

  void search(int id, const Vec3 &q, int &best, float &best_d2) const {
    const Node &n = nodes_[id];
    if (n.axis < 0) {  // leaf
      for (int i = n.left; i < n.right; ++i) {
        const float d2 = sqdist(q, pts_[idx_[i]]);
        if (d2 < best_d2) {
          best_d2 = d2;
          best = idx_[i];
        }
      }
      return;
    }
    const float diff = coord(q, n.axis) - n.split;
    const int near = diff <= 0 ? n.left : n.right;
    const int far = diff <= 0 ? n.right : n.left;
    search(near, q, best, best_d2);
    if (diff * diff < best_d2) search(far, q, best, best_d2);
  }

  const std::vector<Vec3> &pts_;
  std::vector<int> idx_;
  std::vector<Node> nodes_;
  int root_ = 0;
};

// ---- workload (mirrors bench.py make_inputs) -------------------------------
int main(int argc, char **argv) {
  const int H = argc > 1 ? std::atoi(argv[1]) : 512;
  const bool clutter = argc > 2 && std::string_view(argv[2]) == "clutter";
  const int NV = 4096;  // validation cloud (queries per hypothesis)
  const int NS = 1024;  // segment cloud (kd-tree)
  const float delta = 0.005f;
  const float sq_eps = delta * delta;
  const float cos30 = std::cos(30.0 * M_PI / 180.0);

  std::mt19937 gen(0);
  std::uniform_real_distribution<float> u(-0.06f, 0.06f);
  std::normal_distribution<float> g(0.f, 1.f);

  std::vector<Vec3> model(NV), model_nrm(NV);
  for (auto &p : model) p = {u(gen), u(gen), u(gen)};
  for (auto &n : model_nrm) {
    Vec3 v{g(gen), g(gen), g(gen)};
    const float inv = 1.f / std::sqrt(v.x * v.x + v.y * v.y + v.z * v.z);
    n = {v.x * inv, v.y * inv, v.z * inv};
  }
  // Segment = first NS model points shifted by the true offset (bench.py:42);
  // in clutter mode the last quarter is uniform clutter around the offset.
  const int n_clutter = clutter ? NS / 4 : 0;
  std::vector<Vec3> seg(NS), seg_nrm(NS);
  std::vector<float> seg_prob(NS);
  std::uniform_real_distribution<float> up(0.5f, 1.0f);
  std::uniform_real_distribution<float> uc(-0.2f, 0.2f);
  for (int i = 0; i < NS; ++i) {
    if (i >= NS - n_clutter) {
      seg[i] = {uc(gen) + 0.05f, uc(gen), uc(gen) + 0.6f};
      Vec3 v{g(gen), g(gen), g(gen)};
      const float inv = 1.f / std::sqrt(v.x * v.x + v.y * v.y + v.z * v.z);
      seg_nrm[i] = {v.x * inv, v.y * inv, v.z * inv};
    } else {
      seg[i] = {model[i].x + 0.05f, model[i].y, model[i].z + 0.6f};
      seg_nrm[i] = model_nrm[i];
    }
    seg_prob[i] = up(gen);
  }
  // H hypotheses: translation perturbations around the true offset; in
  // clutter mode the second half are garbage (0.1-0.3 m off -> NN misses).
  std::normal_distribution<float> pert(0.f, 0.01f);
  std::uniform_real_distribution<float> ug(0.1f, 0.3f);
  std::vector<Vec3> trans(H);
  for (int h = 0; h < H; ++h) {
    trans[h] = {0.05f + pert(gen), pert(gen), 0.6f + pert(gen)};
    if (clutter && h % 2 == 1) {
      trans[h].x += ug(gen) * (h % 4 == 1 ? 1.f : -1.f);
      trans[h].y += ug(gen);
    }
  }

  KdTree3 tree(seg);

  volatile float sink = 0.f;  // defeat dead-code elimination
  const auto t0 = std::chrono::steady_clock::now();
  for (int h = 0; h < H; ++h) {
    float weighted = 0.f;
    for (int i = 0; i < NV; ++i) {
      // Identity rotation + perturbed translation (matches the bench's
      // hypothesis distribution; rotation cost is 9 mul-adds either way).
      const Vec3 q{model[i].x + trans[h].x, model[i].y + trans[h].y,
                   model[i].z + trans[h].z};
      const int j = tree.queryRestricted(q, sq_eps);
      if (j >= 0) {
        const Vec3 &nq = model_nrm[i];
        const Vec3 &np = seg_nrm[j];
        const float dot = nq.x * np.x + nq.y * np.y + nq.z * np.z;
        // angle folded about 180: |dot| >= cos(30deg)
        if (std::fabs(dot) >= cos30) weighted += seg_prob[j];
      }
    }
    sink += weighted / NV;
  }
  const auto t1 = std::chrono::steady_clock::now();
  const double dt = std::chrono::duration<double>(t1 - t0).count();

  std::printf(
      "{\"hyps_per_sec\": %.1f, \"nn_queries_per_sec\": %.0f, "
      "\"H\": %d, \"NV\": %d, \"NS\": %d, \"delta\": %.3f, "
      "\"elapsed_s\": %.3f, \"checksum\": %.3f, \"mode\": \"%s\"}\n",
      H / dt, H * static_cast<double>(NV) / dt, H, NV, NS, delta, dt,
      static_cast<double>(sink), clutter ? "clutter" : "easy");
  return 0;
}
