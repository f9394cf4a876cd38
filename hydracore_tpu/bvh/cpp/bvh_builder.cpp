// Native SAH BVH builder — the performance path for large scenes.
//
// Role analogue of the reference's native builder (bvh_builder/ wraps a
// patched Embree 2.17; the builder is host-side native code while traversal
// runs on the device — the same split used here). Binned SAH over triangle
// centroids, identical output ABI to the numpy builder in
// hydracore_tpu/bvh/builder.py (FlatBVH: bmin/bmax/left/right/count/perm),
// exposed through a C interface consumed via ctypes (no pybind11 in the
// image).
//
// Build: see hydracore_tpu/bvh/native.py (compiled on first use with g++).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kBins = 16;
constexpr int kMaxLeaf = 4;
constexpr float kTravCost = 1.0f;
constexpr float kIsectCost = 1.0f;

struct V3 {
  float x, y, z;
};

inline V3 vmin(const V3& a, const V3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline V3 vmax(const V3& a, const V3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct AABB {
  V3 lo{3e38f, 3e38f, 3e38f};
  V3 hi{-3e38f, -3e38f, -3e38f};
  void grow(const AABB& o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  void grow(const V3& p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct Node {
  V3 bmin, bmax;
  int32_t left, right, count;
};

struct Builder {
  const AABB* boxes;
  const V3* centroids;
  std::vector<int32_t> order;
  std::vector<Node> nodes;

  int32_t new_node() {
    nodes.push_back({});
    return (int32_t)nodes.size() - 1;
  }

  void build_range(int32_t node, int32_t start, int32_t end) {
    AABB nb;
    AABB cb;
    for (int32_t i = start; i < end; ++i) {
      nb.grow(boxes[order[i]]);
      cb.grow(centroids[order[i]]);
    }
    nodes[node].bmin = nb.lo;
    nodes[node].bmax = nb.hi;
    int32_t n = end - start;
    if (n <= kMaxLeaf) {
      nodes[node].left = start;
      nodes[node].right = -1;
      nodes[node].count = n;
      return;
    }

    // widest centroid axis
    V3 ext = {cb.hi.x - cb.lo.x, cb.hi.y - cb.lo.y, cb.hi.z - cb.lo.z};
    int axis = 0;
    float w = ext.x;
    if (ext.y > w) { axis = 1; w = ext.y; }
    if (ext.z > w) { axis = 2; w = ext.z; }

    int32_t mid = -1;
    if (w > 1e-12f) {
      const float c_lo = axis == 0 ? cb.lo.x : (axis == 1 ? cb.lo.y : cb.lo.z);
      const float scale = kBins * (1.0f - 1e-6f) / w;
      AABB bin_box[kBins];
      int32_t bin_cnt[kBins] = {0};
      auto bin_of = [&](int32_t tri) {
        const V3& c = centroids[tri];
        float v = axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
        int b = (int)((v - c_lo) * scale);
        return b < 0 ? 0 : (b >= kBins ? kBins - 1 : b);
      };
      for (int32_t i = start; i < end; ++i) {
        int b = bin_of(order[i]);
        bin_box[b].grow(boxes[order[i]]);
        bin_cnt[b]++;
      }
      // sweep SAH
      float area_l[kBins], area_r[kBins];
      int32_t cnt_l[kBins], cnt_r[kBins];
      {
        AABB acc;
        int32_t c = 0;
        for (int b = 0; b < kBins; ++b) {
          acc.grow(bin_box[b]);
          c += bin_cnt[b];
          area_l[b] = acc.area();
          cnt_l[b] = c;
        }
      }
      {
        AABB acc;
        int32_t c = 0;
        for (int b = kBins - 1; b >= 0; --b) {
          acc.grow(bin_box[b]);
          c += bin_cnt[b];
          area_r[b] = acc.area();
          cnt_r[b] = c;
        }
      }
      int best = -1;
      float best_cost = 3e38f;
      for (int b = 0; b < kBins - 1; ++b) {
        if (cnt_l[b] == 0 || cnt_r[b + 1] == 0) continue;
        float cost = area_l[b] * cnt_l[b] + area_r[b + 1] * cnt_r[b + 1];
        if (cost < best_cost) { best_cost = cost; best = b; }
      }
      if (best >= 0) {
        float split_cost = kTravCost + kIsectCost * best_cost / std::max(nb.area(), 1e-12f);
        if (split_cost >= kIsectCost * n && n <= 2 * kMaxLeaf) {
          nodes[node].left = start;
          nodes[node].right = -1;
          nodes[node].count = n;
          return;
        }
        auto it = std::partition(order.begin() + start, order.begin() + end,
                                 [&](int32_t t) { return bin_of(t) <= best; });
        mid = (int32_t)(it - order.begin());
        if (mid == start || mid == end) mid = -1;
      }
    }
    if (mid < 0) mid = start + n / 2;  // degenerate: median split

    int32_t l = new_node();
    int32_t r = new_node();
    nodes[node].left = l;
    nodes[node].right = r;
    nodes[node].count = 0;
    build_range(l, start, mid);
    build_range(r, mid, end);
  }
};

}  // namespace

extern "C" {

// Builds the BVH. Returns node count. Caller allocates outputs:
//   out_bmin/out_bmax: (2*T) * 3 floats (upper bound on node count)
//   out_left/out_right/out_count: 2*T int32
//   out_perm: T int32
int32_t hydra_build_bvh(const float* v0, const float* v1, const float* v2,
                        int32_t num_tris, float* out_bmin, float* out_bmax,
                        int32_t* out_left, int32_t* out_right,
                        int32_t* out_count, int32_t* out_perm) {
  if (num_tris <= 0) return 0;
  std::vector<AABB> boxes(num_tris);
  std::vector<V3> cents(num_tris);
  for (int32_t i = 0; i < num_tris; ++i) {
    V3 a = {v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]};
    V3 b = {v1[3 * i], v1[3 * i + 1], v1[3 * i + 2]};
    V3 c = {v2[3 * i], v2[3 * i + 1], v2[3 * i + 2]};
    AABB bb;
    bb.grow(a);
    bb.grow(b);
    bb.grow(c);
    boxes[i] = bb;
    cents[i] = {(bb.lo.x + bb.hi.x) * 0.5f, (bb.lo.y + bb.hi.y) * 0.5f,
                (bb.lo.z + bb.hi.z) * 0.5f};
  }
  Builder bld;
  bld.boxes = boxes.data();
  bld.centroids = cents.data();
  bld.order.resize(num_tris);
  for (int32_t i = 0; i < num_tris; ++i) bld.order[i] = i;
  bld.nodes.reserve(2 * num_tris);
  int32_t root = bld.new_node();
  bld.build_range(root, 0, num_tris);

  int32_t n = (int32_t)bld.nodes.size();
  for (int32_t i = 0; i < n; ++i) {
    const Node& nd = bld.nodes[i];
    std::memcpy(out_bmin + 3 * i, &nd.bmin, 12);
    std::memcpy(out_bmax + 3 * i, &nd.bmax, 12);
    out_left[i] = nd.left;
    out_right[i] = nd.right;
    out_count[i] = nd.count;
  }
  std::memcpy(out_perm, bld.order.data(), sizeof(int32_t) * num_tris);
  return n;
}
}
