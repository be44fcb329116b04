// From-scratch 3-D KD-tree with k-NN queries — the host-side counterpart of
// the device brute-force k-NN kernels.
//
// The reference wraps vendored nanoflann (kd_tree_two.h / nanoflann_two.hpp);
// this is an independent classic implementation: iterative median-split
// build over an index array, best-first descent with a bounded max-heap for
// k-NN. Used as (a) the CPU oracle for device kernels, (b) the query engine
// for host-only deployments, (c) the dedupe/prune helper in the C++ frame
// pipeline. Thread-safe for concurrent queries after build.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct Node {
    float split;       // split coordinate value
    int32_t axis;      // 0..2, or -1 for leaf
    int32_t left;      // node index or -1
    int32_t right;     // node index or -1
    int32_t begin;     // leaf: range into indices
    int32_t end;
};

struct KdTree {
    std::vector<float> pts;      // (n, 3) row-major, owned copy
    std::vector<int32_t> idx;    // permutation of point ids
    std::vector<Node> nodes;
    int32_t root = -1;
    static constexpr int kLeafSize = 16;

    float px(int32_t i, int a) const { return pts[3 * size_t(idx[i]) + a]; }

    int32_t build(int32_t begin, int32_t end) {
        Node node{};
        int32_t id = int32_t(nodes.size());
        nodes.push_back(node);
        if (end - begin <= kLeafSize) {
            nodes[id] = Node{0.f, -1, -1, -1, begin, end};
            return id;
        }
        // split on the axis with the largest extent
        float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
        for (int32_t i = begin; i < end; ++i)
            for (int a = 0; a < 3; ++a) {
                float v = px(i, a);
                lo[a] = std::min(lo[a], v);
                hi[a] = std::max(hi[a], v);
            }
        int axis = 0;
        for (int a = 1; a < 3; ++a)
            if (hi[a] - lo[a] > hi[axis] - lo[axis]) axis = a;
        int32_t mid = (begin + end) / 2;
        std::nth_element(
            idx.begin() + begin, idx.begin() + mid, idx.begin() + end,
            [&](int32_t a, int32_t b) {
                return pts[3 * size_t(a) + axis] < pts[3 * size_t(b) + axis];
            });
        float split = pts[3 * size_t(idx[mid]) + axis];
        int32_t l = build(begin, mid);
        int32_t r = build(mid, end);
        nodes[id] = Node{split, int32_t(axis), l, r, begin, end};
        return id;
    }

    void knn(const float* q, int k, std::priority_queue<std::pair<float, int32_t>>& heap,
             int32_t node_id) const {
        const Node& n = nodes[node_id];
        if (n.axis < 0) {
            for (int32_t i = n.begin; i < n.end; ++i) {
                const float* p = &pts[3 * size_t(idx[i])];
                float d2 = 0;
                for (int a = 0; a < 3; ++a) {
                    float d = p[a] - q[a];
                    d2 += d * d;
                }
                if (int(heap.size()) < k)
                    heap.emplace(d2, idx[i]);
                else if (d2 < heap.top().first) {
                    heap.pop();
                    heap.emplace(d2, idx[i]);
                }
            }
            return;
        }
        float delta = q[n.axis] - n.split;
        int32_t near = delta <= 0 ? n.left : n.right;
        int32_t far = delta <= 0 ? n.right : n.left;
        knn(q, k, heap, near);
        if (int(heap.size()) < k || delta * delta < heap.top().first)
            knn(q, k, heap, far);
    }
};

}  // namespace

extern "C" {

void* kdtree_build(const float* points, int32_t n) {
    auto* t = new KdTree();
    t->pts.assign(points, points + 3 * size_t(n));
    t->idx.resize(n);
    for (int32_t i = 0; i < n; ++i) t->idx[i] = i;
    t->nodes.reserve(2 * size_t(n) / KdTree::kLeafSize + 4);
    if (n > 0) t->root = t->build(0, n);
    return t;
}

void kdtree_destroy(void* tree) { delete static_cast<KdTree*>(tree); }

// k-NN for m queries. out_idx: (m, k) point ids (-1 padding), out_d2: (m, k)
// squared distances (inf padding), ascending.
void kdtree_knn(void* tree, const float* queries, int32_t m, int32_t k,
                int32_t* out_idx, float* out_d2) {
    auto* t = static_cast<KdTree*>(tree);
    for (int32_t qi = 0; qi < m; ++qi) {
        std::priority_queue<std::pair<float, int32_t>> heap;
        if (t->root >= 0) t->knn(&queries[3 * size_t(qi)], k, heap, t->root);
        int cnt = int(heap.size());
        for (int j = cnt - 1; j >= 0; --j) {
            out_idx[size_t(qi) * k + j] = heap.top().second;
            out_d2[size_t(qi) * k + j] = heap.top().first;
            heap.pop();
        }
        for (int j = cnt; j < k; ++j) {
            out_idx[size_t(qi) * k + j] = -1;
            out_d2[size_t(qi) * k + j] = INFINITY;
        }
    }
}

}  // extern "C"
