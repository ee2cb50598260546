// Felzenszwalb-Huttenlocher graph segmentation over a triangle mesh.
//
// Native (C++) replacement for the reference's `segmentator` dependency
// (Karbo123/segmentator, used at
// /root/reference/data/scannet/batch_load_scannet_data.py:84-89) which
// produces the ScanNet "superpoints": vertices are graph nodes, mesh edges
// are graph edges weighted by 1 - dot(normal_u, normal_v), segmented with
// the FH criterion (threshold k / |component|) and a minimum-segment-size
// merge pass.
//
// Exposed as a C ABI for ctypes:
//   int segment_mesh(const float* vertices, int n_vertices,
//                    const int* faces, int n_faces,
//                    float kthr, int seg_min_verts, int* out_labels);
// Returns the number of segments; out_labels gets compacted ids [0, n_seg).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_set>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int> parent;
  std::vector<int> size;
  std::vector<float> internal;  // max internal edge weight ("Int(C)")

  explicit UnionFind(int n) : parent(n), size(n, 1), internal(n, 0.f) {
    for (int i = 0; i < n; ++i) parent[i] = i;
  }
  int find(int x) {
    int root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }
  int join(int a, int b, float w) {
    if (size[a] < size[b]) std::swap(a, b);
    parent[b] = a;
    size[a] += size[b];
    internal[a] = std::max(w, std::max(internal[a], internal[b]));
    return a;
  }
};

struct Edge {
  int u, v;
  float w;
};

inline void cross(const float* a, const float* b, float* out) {
  out[0] = a[1] * b[2] - a[2] * b[1];
  out[1] = a[2] * b[0] - a[0] * b[2];
  out[2] = a[0] * b[1] - a[1] * b[0];
}

}  // namespace

extern "C" {

int segment_mesh(const float* vertices, int n_vertices, const int* faces,
                 int n_faces, float kthr, int seg_min_verts,
                 int* out_labels) {
  if (n_vertices <= 0) return 0;

  // --- vertex normals: area-weighted face-normal accumulation ---
  std::vector<float> normals(3 * static_cast<size_t>(n_vertices), 0.f);
  for (int f = 0; f < n_faces; ++f) {
    const int i0 = faces[3 * f], i1 = faces[3 * f + 1], i2 = faces[3 * f + 2];
    float e1[3], e2[3], fn[3];
    for (int d = 0; d < 3; ++d) {
      e1[d] = vertices[3 * i1 + d] - vertices[3 * i0 + d];
      e2[d] = vertices[3 * i2 + d] - vertices[3 * i0 + d];
    }
    cross(e1, e2, fn);  // magnitude = 2*area — the area weighting
    for (int d = 0; d < 3; ++d) {
      normals[3 * i0 + d] += fn[d];
      normals[3 * i1 + d] += fn[d];
      normals[3 * i2 + d] += fn[d];
    }
  }
  for (int v = 0; v < n_vertices; ++v) {
    float* n = &normals[3 * v];
    const float len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    if (len > 1e-12f)
      for (int d = 0; d < 3; ++d) n[d] /= len;
  }

  // --- unique undirected edges from faces ---
  std::vector<Edge> edges;
  edges.reserve(static_cast<size_t>(n_faces) * 3);
  {
    std::unordered_set<uint64_t> seen;
    seen.reserve(static_cast<size_t>(n_faces) * 3);
    auto add_edge = [&](int a, int b) {
      if (a == b) return;
      const uint64_t key =
          (static_cast<uint64_t>(std::min(a, b)) << 32) |
          static_cast<uint32_t>(std::max(a, b));
      if (!seen.insert(key).second) return;
      const float* na = &normals[3 * a];
      const float* nb = &normals[3 * b];
      const float dot =
          na[0] * nb[0] + na[1] * nb[1] + na[2] * nb[2];
      edges.push_back({a, b, 1.f - dot});
    };
    for (int f = 0; f < n_faces; ++f) {
      add_edge(faces[3 * f], faces[3 * f + 1]);
      add_edge(faces[3 * f + 1], faces[3 * f + 2]);
      add_edge(faces[3 * f], faces[3 * f + 2]);
    }
  }

  std::sort(edges.begin(), edges.end(),
            [](const Edge& a, const Edge& b) { return a.w < b.w; });

  // --- FH segmentation ---
  UnionFind uf(n_vertices);
  for (const Edge& e : edges) {
    int a = uf.find(e.u), b = uf.find(e.v);
    if (a == b) continue;
    const float ta = uf.internal[a] + kthr / uf.size[a];
    const float tb = uf.internal[b] + kthr / uf.size[b];
    if (e.w <= std::min(ta, tb)) uf.join(a, b, e.w);
  }

  // --- merge undersized segments into an adjacent one ---
  for (const Edge& e : edges) {
    int a = uf.find(e.u), b = uf.find(e.v);
    if (a == b) continue;
    if (uf.size[a] < seg_min_verts || uf.size[b] < seg_min_verts)
      uf.join(a, b, e.w);
  }

  // --- compact ids ---
  std::vector<int> remap(n_vertices, -1);
  int next_id = 0;
  for (int v = 0; v < n_vertices; ++v) {
    const int root = uf.find(v);
    if (remap[root] < 0) remap[root] = next_id++;
    out_labels[v] = remap[root];
  }
  return next_id;
}

}  // extern "C"
