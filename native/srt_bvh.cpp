// srt_bvh: binned-SAH BVH8 builder (host, C++).
//
// The TPU-native replacement for what Embree's rtcCommitScene gives
// the reference for free (scene.cpp:101-107): a surface-area-heuristic
// tree. Round 1 used an implicit Morton-median 8-ary heap built
// on-device; its equal-size subtree constraint produces overlapping
// children on uneven scenes (measured ~85-visit unions for coherent
// 128-ray packets on sponza_proc). This builder produces an
// explicit-pointer 8-wide tree:
//
//   1. top-down binary binned SAH (16 bins, all 3 axes swept and the
//      cheapest (axis, bin) split taken — round-3: the largest-extent-
//      only sweep left ~5-10% SAH on the table on architectural
//      scenes; forced split while count > leaf capacity),
//   2. collapse to 8-wide by a dynamic program that minimizes the
//      total surface area of wide-node roots (round 3). On the TPU
//      packet kernel a wide-node visit costs ~1 unit no matter how
//      many of its 8 slots are full, and binary leaves are immutable
//      (leaf-drain count is partition-independent), so expected node
//      visits ~ sum over wide nodes W of P(ray hits W's box) ~
//      sum A(W). The DP (the cost shape of Ylitie et al. 2017's
//      BVH8 collapse, with the member-wide cost constant dropped)
//      partitions the binary tree into fragments with <= 8 exits:
//        g(n, i) = min cost of covering subtree(n) with <= i exits
//                  (n strictly inside the current fragment)
//        g(leaf, i) = 0;  g(n, 1) = f(n)
//        g(n, i) = min(f(n), min_{i1+i2=i} g(l,i1) + g(r,i2))
//        f(n) = A(n) + min_{i1+i2=8} g(l,i1) + g(r,i2)
//      (round 2 expanded the largest-area child greedily; the DP is
//      measured vs it by tools/kernel_ab.py),
//   3. emit component-major children rows [NI, 48] + child ids
//      [NI, 8] + leaf order [L*K] (original triangle ids, -1 pad).
//
// Child id encoding matches ops/traverse_pallas2.py: internal child =
// its row index; leaf child = NI + leaf_row; empty slot = id 0 with a
// point-at-infinity box (never hit, never visited).
//
// Exposed via a C ABI consumed with ctypes (ops/sah.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr float kInf = 3.0e38f;
constexpr int kBins = 16;

struct Vec3 {
  float x = 0, y = 0, z = 0;
};

struct Box {
  float lo[3] = {kInf, kInf, kInf};
  float hi[3] = {-kInf, -kInf, -kInf};
  void grow(const float* p) {
    for (int c = 0; c < 3; c++) {
      lo[c] = std::min(lo[c], p[c]);
      hi[c] = std::max(hi[c], p[c]);
    }
  }
  void grow(const Box& b) {
    for (int c = 0; c < 3; c++) {
      lo[c] = std::min(lo[c], b.lo[c]);
      hi[c] = std::max(hi[c], b.hi[c]);
    }
  }
  float area() const {
    float dx = std::max(hi[0] - lo[0], 0.0f);
    float dy = std::max(hi[1] - lo[1], 0.0f);
    float dz = std::max(hi[2] - lo[2], 0.0f);
    return 2.0f * (dx * dy + dy * dz + dz * dx);
  }
};

struct BNode {            // binary SAH node
  Box box;
  int32_t left = -1;      // internal: children indices
  int32_t right = -1;
  int32_t start = 0;      // leaf: [start, start+count) in tri order
  int32_t count = 0;      // 0 = internal
};

struct Builder {
  const float* tv = nullptr;  // [n, 3, 3]
  int64_t n = 0;
  int32_t k = 8;              // leaf capacity
  std::vector<int32_t> order;     // current triangle permutation
  std::vector<Box> tbox;          // per-tri boxes (original ids)
  std::vector<Vec3> cent;         // per-tri centroids (original ids)
  std::vector<BNode> bnodes;

  // --- outputs (8-wide) ---
  std::vector<float> children;    // [NI, 48] component-major boxes
  std::vector<int32_t> child_ids; // [NI, 8]
  std::vector<int32_t> leaf_order;  // [L, k] original tri ids, -1 pad
  int32_t depth = 0;

  int32_t build_binary(int32_t start, int32_t count) {
    BNode node;
    for (int32_t i = start; i < start + count; i++)
      node.box.grow(tbox[order[i]]);
    int32_t me = (int32_t)bnodes.size();
    bnodes.push_back(node);
    if (count <= k) {
      bnodes[me].start = start;
      bnodes[me].count = count;
      return me;
    }

    // centroid bounds + split axis
    Box cb;
    for (int32_t i = start; i < start + count; i++) {
      const Vec3& c = cent[order[i]];
      float p[3] = {c.x, c.y, c.z};
      cb.grow(p);
    }
    // binned SAH sweep over ALL 3 axes; cheapest (axis, bin) wins
    float best = kInf;
    int best_axis = -1, best_b = -1;
    for (int axis = 0; axis < 3; axis++) {
      float ext = cb.hi[axis] - cb.lo[axis];
      if (ext <= 1e-20f) continue;
      Box bin_box[kBins];
      int32_t bin_cnt[kBins] = {0};
      float k1 = kBins * (1.0f - 1e-6f) / ext;
      float lo = cb.lo[axis];
      auto bin_of = [&](int32_t tri) {
        const Vec3& c = cent[tri];
        float v = axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
        int b = (int)((v - lo) * k1);
        return std::min(std::max(b, 0), kBins - 1);
      };
      for (int32_t i = start; i < start + count; i++) {
        int b = bin_of(order[i]);
        bin_box[b].grow(tbox[order[i]]);
        bin_cnt[b]++;
      }
      // sweep: left-to-right and right-to-left prefix areas
      float rarea[kBins];
      Box acc;
      int32_t rcnt[kBins];
      int32_t cnt = 0;
      for (int b = kBins - 1; b > 0; b--) {
        acc.grow(bin_box[b]);
        cnt += bin_cnt[b];
        rarea[b] = acc.area();
        rcnt[b] = cnt;
      }
      acc = Box();
      cnt = 0;
      for (int b = 0; b < kBins - 1; b++) {
        acc.grow(bin_box[b]);
        cnt += bin_cnt[b];
        if (cnt == 0 || rcnt[b + 1] == 0) continue;
        float cost = acc.area() * cnt + rarea[b + 1] * rcnt[b + 1];
        if (cost < best) { best = cost; best_axis = axis; best_b = b; }
      }
    }

    int32_t mid;
    if (best_b < 0) {
      mid = start + count / 2;  // degenerate: median split
    } else {
      int axis = best_axis;
      float ext = cb.hi[axis] - cb.lo[axis];
      float k1 = kBins * (1.0f - 1e-6f) / ext;
      float lo = cb.lo[axis];
      auto bin_of = [&](int32_t tri) {
        const Vec3& c = cent[tri];
        float v = axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
        int b = (int)((v - lo) * k1);
        return std::min(std::max(b, 0), kBins - 1);
      };
      auto* base = order.data();
      auto* split = std::partition(
          base + start, base + start + count,
          [&](int32_t t) { return bin_of(t) <= best_b; });
      mid = (int32_t)(split - base);
      if (mid == start || mid == start + count)
        mid = start + count / 2;  // partition failed; median
    }
    int32_t l = build_binary(start, mid - start);
    int32_t r = build_binary(mid, start + count - mid);
    bnodes[me].left = l;
    bnodes[me].right = r;
    return me;
  }

  // --- DP collapse (see file header): minimize sum of wide-node-root
  // areas over all partitions of the binary tree into fragments with
  // <= 8 exits. Exits become the wide node's children (leaf exits =
  // leaf slots; internal exits = new wide-node roots).
  std::vector<float> gtab;      // [m, 8]: g(n, i) at [n*8 + i-1]
  std::vector<float> fcost;     // [m]: f(n)
  std::vector<uint8_t> fsplit;  // [m]: f(n)'s left-budget choice
  std::vector<uint8_t> gsplit;  // [m, 8]: 0 = SELF (n is an exit),
                                //         else left-budget i1

  void dp_collapse_tables() {
    size_t m = bnodes.size();
    gtab.assign(m * 8, 0.0f);
    fcost.assign(m, 0.0f);
    fsplit.assign(m, 1);
    gsplit.assign(m * 8, 0);
    // build_binary pushes a node before recursing into its children,
    // so descending index order visits children before parents
    for (size_t n = m; n-- > 0;) {
      const BNode& nd = bnodes[n];
      if (nd.count > 0) continue;  // binary leaf: g = 0 everywhere
      const float* gl = &gtab[(size_t)nd.left * 8];
      const float* gr = &gtab[(size_t)nd.right * 8];
      float best = kInf;
      int bi = 1;
      for (int i1 = 1; i1 <= 7; i1++) {
        float c = gl[i1 - 1] + gr[8 - i1 - 1];
        if (c < best) { best = c; bi = i1; }
      }
      fcost[n] = nd.box.area() + best;
      fsplit[n] = (uint8_t)bi;
      float* gn = &gtab[n * 8];
      uint8_t* gs = &gsplit[n * 8];
      gn[0] = fcost[n];
      gs[0] = 0;  // at budget 1, n must itself be the exit
      for (int i = 2; i <= 8; i++) {
        best = fcost[n];
        int choice = 0;  // SELF
        for (int i1 = 1; i1 <= i - 1; i1++) {
          float c = gl[i1 - 1] + gr[i - i1 - 1];
          if (c < best) { best = c; choice = i1; }
        }
        gn[i - 1] = best;
        gs[i - 1] = (uint8_t)choice;
      }
    }
  }

  void exits_of(int32_t n, int budget, std::vector<int32_t>& out) {
    if (bnodes[n].count > 0) {  // binary leaf: always an exit
      out.push_back(n);
      return;
    }
    uint8_t c = gsplit[(size_t)n * 8 + budget - 1];
    if (c == 0) {  // SELF: n becomes a wide-node root
      out.push_back(n);
      return;
    }
    exits_of(bnodes[n].left, c, out);
    exits_of(bnodes[n].right, budget - c, out);
  }

  // children of the wide node rooted at binary node `b`
  void gather8(int32_t b, std::vector<int32_t>& out) {
    out.clear();
    if (bnodes[b].count > 0) {  // root itself a leaf
      out.push_back(b);
      return;
    }
    int i1 = fsplit[b];
    exits_of(bnodes[b].left, i1, out);
    exits_of(bnodes[b].right, 8 - i1, out);
  }

  void collapse() {
    // BFS over 8-wide nodes; each queue entry is a binary node that
    // becomes one 8-wide internal row (a binary leaf root degenerates
    // to a single-leaf-child row).
    struct Item { int32_t bnode; int32_t level; };
    std::vector<Item> queue;
    queue.push_back({0, 1});
    // internal rows are assigned on enqueue; leaf rows on discovery
    int32_t next_row = 1;
    for (size_t qi = 0; qi < queue.size(); qi++) {
      Item it = queue[qi];
      depth = std::max(depth, it.level);
      std::vector<int32_t> kids;
      gather8(it.bnode, kids);
      size_t row_base = children.size();
      children.resize(row_base + 48, kInf);
      size_t id_base = child_ids.size();
      child_ids.resize(id_base + 8, 0);
      for (int j = 0; j < (int)kids.size(); j++) {
        const BNode& nd = bnodes[kids[j]];
        for (int c = 0; c < 3; c++) {
          children[row_base + c * 8 + j] = nd.box.lo[c];
          children[row_base + (3 + c) * 8 + j] = nd.box.hi[c];
        }
        if (nd.count > 0) {
          // leaf child: final id = NI + leaf_row, fixed up once NI is
          // known (stored as -(leaf_row+1) meanwhile)
          int32_t leaf_row = (int32_t)(leaf_order.size() / k);
          leaf_order.resize(leaf_order.size() + k, -1);
          for (int32_t i = 0; i < nd.count; i++)
            leaf_order[leaf_row * k + i] = order[nd.start + i];
          child_ids[id_base + j] = -(leaf_row + 1);
        } else {
          child_ids[id_base + j] = next_row;
          queue.push_back({kids[j], it.level + 1});
          next_row++;
        }
      }
      // unfilled slots keep the point-at-infinity box and id 0
    }
    // fix up leaf ids now that NI is known
    int32_t ni = next_row;
    for (auto& id : child_ids)
      if (id < 0) id = ni + (-id - 1);
  }

  void run() {
    order.resize(n);
    tbox.resize(n);
    cent.resize(n);
    for (int64_t i = 0; i < n; i++) {
      order[i] = (int32_t)i;
      Box b;
      b.grow(tv + i * 9 + 0);
      b.grow(tv + i * 9 + 3);
      b.grow(tv + i * 9 + 6);
      tbox[i] = b;
      cent[i] = {(b.lo[0] + b.hi[0]) * 0.5f, (b.lo[1] + b.hi[1]) * 0.5f,
                 (b.lo[2] + b.hi[2]) * 0.5f};
    }
    if (n == 0) {
      children.assign(48, kInf);   // no child box is ever hit
      child_ids.assign(8, 0);
      child_ids[0] = 1;            // = NI + leaf 0 (never visited)
      leaf_order.assign(k, -1);
      depth = 1;
      return;
    }
    bnodes.reserve((size_t)(2.2 * (double)std::max<int64_t>(n / k, 1)) + 8);
    build_binary(0, (int32_t)n);
    dp_collapse_tables();
    collapse();
  }
};

}  // namespace

extern "C" {

void* srt_bvh_build(const float* tri_v, int64_t n, int32_t leaf_size) {
  auto* b = new Builder();
  b->tv = tri_v;
  b->n = n;
  b->k = leaf_size;
  b->run();
  return b;
}

int64_t srt_bvh_ni(void* h) {
  return (int64_t)(((Builder*)h)->child_ids.size() / 8);
}

int64_t srt_bvh_nleaves(void* h) {
  auto* b = (Builder*)h;
  return (int64_t)(b->leaf_order.size() / b->k);
}

int32_t srt_bvh_depth(void* h) { return ((Builder*)h)->depth; }

void srt_bvh_copy(void* h, float* children48, int32_t* child_ids8,
                  int32_t* order) {
  auto* b = (Builder*)h;
  std::memcpy(children48, b->children.data(),
              b->children.size() * sizeof(float));
  std::memcpy(child_ids8, b->child_ids.data(),
              b->child_ids.size() * sizeof(int32_t));
  std::memcpy(order, b->leaf_order.data(),
              b->leaf_order.size() * sizeof(int32_t));
}

void srt_bvh_free(void* h) { delete (Builder*)h; }

}  // extern "C"
