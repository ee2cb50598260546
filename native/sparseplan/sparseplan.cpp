// Host-side sparse-conv plan builder: voxel dedup, kernel maps, pyramid.
//
// The CPU counterpart of spconv/MinkowskiEngine's GPU coordinate managers
// (reference deps N1/N2, SURVEY.md 搂2.2): builds everything the TPU U-Net
// needs as *static-shaped index arrays* — point->voxel inverse mapping,
// per-level neighbor tables (gather indices), and 2x-downsample parent
// links — so the device never touches a hash table.  TPU gathers are
// memory-latency bound (~140M elem/s measured on v5e through XLA), while a
// CPU open-addressing hash map sustains >50M lookups/s/core; plan building
// overlaps with device compute in the input pipeline.
//
// All functions are C ABI for ctypes.  Coordinates are int32 (b, x, y, z),
// non-negative, AoS rows.  Keys pack into int64.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline int64_t pack(int32_t b, int32_t x, int32_t y, int32_t z) {
  return (static_cast<int64_t>(b) << 48) | (static_cast<int64_t>(x) << 32) |
         (static_cast<int64_t>(y) << 16) | static_cast<int64_t>(z);
}

// open-addressing hash map int64 -> int32, linear probing
struct HashMap {
  std::vector<int64_t> keys;
  std::vector<int32_t> vals;
  uint64_t mask;

  explicit HashMap(size_t capacity) {
    size_t size = 16;
    while (size < capacity * 2) size <<= 1;
    keys.assign(size, -1);
    vals.assign(size, -1);
    mask = size - 1;
  }
  static inline uint64_t mix(int64_t k) {
    uint64_t x = static_cast<uint64_t>(k) * 0x9E3779B97F4A7C15ull;
    x ^= x >> 29;
    x *= 0xBF58476D1CE4E5B9ull;
    x ^= x >> 32;
    return x;
  }
  // returns existing value if present, else inserts and returns -1
  inline int32_t insert(int64_t k, int32_t v) {
    uint64_t slot = mix(k) & mask;
    for (;;) {
      if (keys[slot] == -1) {
        keys[slot] = k;
        vals[slot] = v;
        return -1;
      }
      if (keys[slot] == k) return vals[slot];
      slot = (slot + 1) & mask;
    }
  }
  inline int32_t find(int64_t k) const {
    uint64_t slot = mix(k) & mask;
    for (;;) {
      if (keys[slot] == -1) return -1;
      if (keys[slot] == k) return vals[slot];
      slot = (slot + 1) & mask;
    }
  }
};

}  // namespace

extern "C" {

// Deduplicate voxel coordinates (first-occurrence order).
// coords: (n, 4) int32; valid: (n) uint8; out_inverse: (n) int32;
// out_vox_coords: (cap, 4) int32. Returns the voxel count (may exceed cap —
// caller must check; coords beyond cap are not written).
int64_t voxel_dedup(const int32_t* coords, const uint8_t* valid, int64_t n,
                    int32_t* out_inverse, int32_t* out_vox_coords,
                    int64_t cap) {
  // size by n, not cap: every unique key inserts even past cap (the cap
  // only limits coordinate writes), and the open-addressing map never grows
  HashMap map(static_cast<size_t>(n + 16));
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (valid && !valid[i]) {
      out_inverse[i] = -1;
      continue;
    }
    const int32_t* c = coords + 4 * i;
    const int64_t k = pack(c[0], c[1], c[2], c[3]);
    int32_t existing = map.insert(k, static_cast<int32_t>(count));
    if (existing < 0) {
      if (count < cap) std::memcpy(out_vox_coords + 4 * count, c, 16);
      out_inverse[i] = static_cast<int32_t>(count);
      ++count;
    } else {
      out_inverse[i] = existing;
    }
  }
  return count;
}

// Neighbor table: for each of v voxels and n_off offsets, the index of the
// voxel at coords + offset, or -1.  out is offset-major (n_off, v_cap).
// Only the first v_valid rows are queried; the rest get -1.
void neighbor_table(const int32_t* vox_coords, int64_t v_cap, int64_t v_valid,
                    const int32_t* offsets, int32_t n_off, int32_t* out) {
  HashMap map(static_cast<size_t>(v_valid + 16));
  for (int64_t i = 0; i < v_valid; ++i) {
    const int32_t* c = vox_coords + 4 * i;
    map.insert(pack(c[0], c[1], c[2], c[3]), static_cast<int32_t>(i));
  }
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int32_t o = 0; o < n_off; ++o) {
    const int32_t dx = offsets[3 * o], dy = offsets[3 * o + 1],
                  dz = offsets[3 * o + 2];
    int32_t* row = out + static_cast<int64_t>(o) * v_cap;
    for (int64_t i = 0; i < v_valid; ++i) {
      const int32_t* c = vox_coords + 4 * i;
      const int32_t x = c[1] + dx, y = c[2] + dy, z = c[3] + dz;
      row[i] = (x < 0 || y < 0 || z < 0)
                   ? -1
                   : map.find(pack(c[0], x, y, z));
    }
    for (int64_t i = v_valid; i < v_cap; ++i) row[i] = -1;
  }
}

// Assign voxels to axis-aligned cubic blocks of `edge` voxels (the
// block-dense conv layout: dense (n_blocks, edge^3, C) tiles that run
// submanifold convs as real MXU convolutions instead of per-voxel
// gathers).  Blocks are keyed by (b, x>>log2(edge), ...) in
// first-occurrence order.  Outputs:
//   out_vox_slot: (v_cap) int32 = block_id * edge^3 + local linear offset
//                 (x-major: lx*edge^2 + ly*edge + lz), -1 for invalid voxels
//   out_block_nbr: (26, block_cap) int32 neighbor block ids over the 3x3x3
//                  shell in itertools.product(-1,0,1)^3 order with the
//                  center (0,0,0) skipped, -1 where absent
// Returns the block count (may exceed block_cap — caller must check;
// slots/neighbors beyond block_cap are not written).
int64_t block_assign(const int32_t* vox_coords, int64_t v_cap, int64_t v_valid,
                     int32_t edge, int32_t* out_vox_slot,
                     int32_t* out_block_nbr, int64_t block_cap) {
  int32_t shift = 0;
  while ((1 << shift) < edge) ++shift;
  const int64_t vol = static_cast<int64_t>(edge) * edge * edge;
  // worst case one voxel per block: size by v_valid (the map never grows)
  HashMap map(static_cast<size_t>(v_valid + 16));
  std::vector<int32_t> block_coords;
  block_coords.reserve(static_cast<size_t>(std::min<int64_t>(
                           block_cap, v_valid) * 4));
  int64_t count = 0;
  for (int64_t i = 0; i < v_valid; ++i) {
    const int32_t* c = vox_coords + 4 * i;
    const int32_t bx = c[1] >> shift, by = c[2] >> shift, bz = c[3] >> shift;
    const int64_t k = pack(c[0], bx, by, bz);
    int32_t id = map.insert(k, static_cast<int32_t>(count));
    if (id < 0) {
      id = static_cast<int32_t>(count);
      block_coords.push_back(c[0]);
      block_coords.push_back(bx);
      block_coords.push_back(by);
      block_coords.push_back(bz);
      ++count;
    }
    const int32_t lx = c[1] & (edge - 1), ly = c[2] & (edge - 1),
                  lz = c[3] & (edge - 1);
    out_vox_slot[i] =
        (id < block_cap)
            ? static_cast<int32_t>(id * vol + lx * edge * edge + ly * edge + lz)
            : -1;
  }
  for (int64_t i = v_valid; i < v_cap; ++i) out_vox_slot[i] = -1;

  const int64_t n_blocks = std::min<int64_t>(count, block_cap);
  int32_t f = 0;
  for (int32_t dx = -1; dx <= 1; ++dx) {
    for (int32_t dy = -1; dy <= 1; ++dy) {
      for (int32_t dz = -1; dz <= 1; ++dz) {
        if (dx == 0 && dy == 0 && dz == 0) continue;
        int32_t* row = out_block_nbr + static_cast<int64_t>(f) * block_cap;
        for (int64_t i = 0; i < n_blocks; ++i) {
          const int32_t* c = block_coords.data() + 4 * i;
          const int32_t x = c[1] + dx, y = c[2] + dy, z = c[3] + dz;
          int32_t nb =
              (x < 0 || y < 0 || z < 0) ? -1 : map.find(pack(c[0], x, y, z));
          row[i] = (nb >= block_cap) ? -1 : nb;
        }
        for (int64_t i = n_blocks; i < block_cap; ++i) row[i] = -1;
        ++f;
      }
    }
  }
  return count;
}

// Count-only plan probe: unique voxels + block counts per pyramid level,
// WITHOUT building any tables.  One dedup pass + per-level block/downsample
// counting — ~10x cheaper than build_host_plan; used by the eval loader's
// capacity prescan (pin ONE static cap vector per shape rung so the whole
// val set compiles to a handful of programs).
// coords: (n, 4) int32; edges: per-level block edge (0 = skip block count).
// out_voxels/out_blocks: (num_levels) int64.
// stem_offsets/stem_n_off/stem_d (optional; stem_n_off = 0 skips): count
// the level-0 stem pairs beyond stem_d per voxel into *out_stem_overflow —
// lets the eval prescan pin a deterministic overflow capacity per rung.
void probe_plan_counts(const int32_t* coords, const uint8_t* valid, int64_t n,
                       const int32_t* edges, int32_t num_levels,
                       int64_t* out_voxels, int64_t* out_blocks,
                       const int32_t* stem_offsets, int32_t stem_n_off,
                       int32_t stem_d, int64_t* out_stem_overflow) {
  std::vector<int32_t> cur;
  cur.reserve(static_cast<size_t>(n) * 4);
  {
    HashMap map(static_cast<size_t>(n + 16));
    for (int64_t i = 0; i < n; ++i) {
      if (valid && !valid[i]) continue;
      const int32_t* c = coords + 4 * i;
      if (map.insert(pack(c[0], c[1], c[2], c[3]),
                     static_cast<int32_t>(1)) < 0) {
        cur.insert(cur.end(), c, c + 4);
      }
    }
  }
  if (stem_n_off > 0 && out_stem_overflow) {
    const int64_t v = static_cast<int64_t>(cur.size() / 4);
    HashMap map(static_cast<size_t>(v + 16));
    for (int64_t i = 0; i < v; ++i) {
      const int32_t* c = cur.data() + 4 * i;
      map.insert(pack(c[0], c[1], c[2], c[3]), static_cast<int32_t>(i));
    }
    int64_t ov = 0;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) reduction(+ : ov)
#endif
    for (int64_t i = 0; i < v; ++i) {
      const int32_t* c = cur.data() + 4 * i;
      int32_t deg = 0;
      for (int32_t o = 0; o < stem_n_off; ++o) {
        const int32_t x = c[1] + stem_offsets[3 * o],
                      y = c[2] + stem_offsets[3 * o + 1],
                      z = c[3] + stem_offsets[3 * o + 2];
        if (x >= 0 && y >= 0 && z >= 0 &&
            map.find(pack(c[0], x, y, z)) >= 0)
          ++deg;
      }
      if (deg > stem_d) ov += deg - stem_d;
    }
    *out_stem_overflow = ov;
  } else if (out_stem_overflow) {
    *out_stem_overflow = 0;
  }
  for (int32_t li = 0; li < num_levels; ++li) {
    const int64_t v = static_cast<int64_t>(cur.size() / 4);
    out_voxels[li] = v;
    out_blocks[li] = 0;
    const int32_t edge = edges[li];
    if (edge > 0) {
      int32_t shift = 0;
      while ((1 << shift) < edge) ++shift;
      HashMap bmap(static_cast<size_t>(v + 16));
      int64_t nb = 0;
      for (int64_t i = 0; i < v; ++i) {
        const int32_t* c = cur.data() + 4 * i;
        if (bmap.insert(pack(c[0], c[1] >> shift, c[2] >> shift,
                             c[3] >> shift),
                        static_cast<int32_t>(1)) < 0)
          ++nb;
      }
      out_blocks[li] = nb;
    }
    if (li + 1 < num_levels) {
      HashMap dmap(static_cast<size_t>(v + 16));
      std::vector<int32_t> next;
      next.reserve(cur.size() / 2);
      for (int64_t i = 0; i < v; ++i) {
        const int32_t* c = cur.data() + 4 * i;
        const int32_t cx = c[1] >> 1, cy = c[2] >> 1, cz = c[3] >> 1;
        if (dmap.insert(pack(c[0], cx, cy, cz),
                        static_cast<int32_t>(1)) < 0) {
          next.push_back(c[0]);
          next.push_back(cx);
          next.push_back(cy);
          next.push_back(cz);
        }
      }
      cur.swap(next);
    }
  }
}

// Degree-compacted stem table: the k^3 neighbor table rewritten as
// per-voxel slot lists.  On 2-manifold scenes only ~22% of a 5^3 stem's
// 125 offsets hit an occupied voxel (measured ScanNet-like avg degree 28),
// and XLA TPU row-gathers cost ~2 ns/row regardless of row width — so the
// device-side stem becomes ONE (V, Cin) @ (Cin, k^3*Cout) matmul plus D
// gathers over flat rows  y[j * n_off + o]  instead of k^3 gathers
// (ops/sparse_conv.stem_compact_conv).
//
// Outputs:
//   out_slots: (d_cap, v_cap) int32 flat indices nbr*n_off+o, -1 empty
//   out_ov_src/out_ov_dst: overflow pairs beyond d_cap per voxel (flat
//       idx, voxel idx), voxel-major deterministic order, written up to
//       p_cap; padding beyond the written count is left untouched
//       (caller pre-fills with -1 / dump-row values).
// Returns the total overflow-pair count (may exceed p_cap — caller must
// check and rebuild with a bigger cap).
int64_t stem_compact(const int32_t* vox_coords, int64_t v_cap,
                     int64_t v_valid, const int32_t* offsets, int32_t n_off,
                     int32_t d_cap, int32_t* out_slots, int32_t* out_ov_src,
                     int32_t* out_ov_dst, int64_t p_cap) {
  HashMap map(static_cast<size_t>(v_valid + 16));
  for (int64_t i = 0; i < v_valid; ++i) {
    const int32_t* c = vox_coords + 4 * i;
    map.insert(pack(c[0], c[1], c[2], c[3]), static_cast<int32_t>(i));
  }
  for (int32_t d = 0; d < d_cap; ++d)
    std::memset(out_slots + static_cast<int64_t>(d) * v_cap + v_valid, -1,
                static_cast<size_t>(v_cap - v_valid) * 4);

  // Parallel over voxels: each voxel owns one column of out_slots.
  // Overflow pairs collect thread-locally as (dst, off, flat) and merge
  // sorted by (dst, off) so the layout is deterministic and identical to
  // a sequential voxel-major walk regardless of thread count.
  struct Ov {
    int32_t dst, off, flat;
  };
  std::vector<Ov> overflow;
#ifdef _OPENMP
#pragma omp parallel
  {
    std::vector<Ov> loc;
#pragma omp for schedule(static) nowait
    for (int64_t i = 0; i < v_valid; ++i) {
      const int32_t* c = vox_coords + 4 * i;
      int32_t fill = 0;
      for (int32_t o = 0; o < n_off; ++o) {
        const int32_t x = c[1] + offsets[3 * o], y = c[2] + offsets[3 * o + 1],
                      z = c[3] + offsets[3 * o + 2];
        const int32_t nb =
            (x < 0 || y < 0 || z < 0) ? -1 : map.find(pack(c[0], x, y, z));
        if (nb < 0) continue;
        const int32_t flat = nb * n_off + o;
        if (fill < d_cap) {
          out_slots[static_cast<int64_t>(fill) * v_cap + i] = flat;
          ++fill;
        } else {
          loc.push_back({static_cast<int32_t>(i), o, flat});
        }
      }
      for (; fill < d_cap; ++fill)
        out_slots[static_cast<int64_t>(fill) * v_cap + i] = -1;
    }
#pragma omp critical
    overflow.insert(overflow.end(), loc.begin(), loc.end());
  }
  std::sort(overflow.begin(), overflow.end(), [](const Ov& a, const Ov& b) {
    return a.dst != b.dst ? a.dst < b.dst : a.off < b.off;
  });
#else
  for (int64_t i = 0; i < v_valid; ++i) {
    const int32_t* c = vox_coords + 4 * i;
    int32_t fill = 0;
    for (int32_t o = 0; o < n_off; ++o) {
      const int32_t x = c[1] + offsets[3 * o], y = c[2] + offsets[3 * o + 1],
                    z = c[3] + offsets[3 * o + 2];
      const int32_t nb =
          (x < 0 || y < 0 || z < 0) ? -1 : map.find(pack(c[0], x, y, z));
      if (nb < 0) continue;
      const int32_t flat = nb * n_off + o;
      if (fill < d_cap) {
        out_slots[static_cast<int64_t>(fill) * v_cap + i] = flat;
        ++fill;
      } else {
        overflow.push_back({static_cast<int32_t>(i), o, flat});
      }
    }
    for (; fill < d_cap; ++fill)
      out_slots[static_cast<int64_t>(fill) * v_cap + i] = -1;
  }
#endif
  const int64_t n_ov = static_cast<int64_t>(overflow.size());
  const int64_t n_write = std::min<int64_t>(n_ov, p_cap);
  for (int64_t t = 0; t < n_write; ++t) {
    out_ov_src[t] = overflow[static_cast<size_t>(t)].flat;
    out_ov_dst[t] = overflow[static_cast<size_t>(t)].dst;
  }
  return n_ov;
}

// 2x downsample: unique(floor(xyz/2)) in first-occurrence order.
// Writes parent index + kernel position per fine voxel and the coarse
// coordinates. Returns the coarse voxel count (check against coarse_cap).
int64_t downsample(const int32_t* vox_coords, int64_t v_cap, int64_t v_valid,
                   int32_t* out_parent, int32_t* out_kpos,
                   int32_t* out_coarse_coords, int64_t coarse_cap) {
  HashMap map(static_cast<size_t>(v_valid + 16));
  int64_t count = 0;
  for (int64_t i = 0; i < v_valid; ++i) {
    const int32_t* c = vox_coords + 4 * i;
    const int32_t cx = c[1] >> 1, cy = c[2] >> 1, cz = c[3] >> 1;
    const int64_t k = pack(c[0], cx, cy, cz);
    int32_t existing = map.insert(k, static_cast<int32_t>(count));
    int32_t parent;
    if (existing < 0) {
      if (count < coarse_cap) {
        int32_t* cc = out_coarse_coords + 4 * count;
        cc[0] = c[0];
        cc[1] = cx;
        cc[2] = cy;
        cc[3] = cz;
      }
      parent = static_cast<int32_t>(count);
      ++count;
    } else {
      parent = existing;
    }
    out_parent[i] = parent;
    out_kpos[i] = ((c[1] & 1) << 2) | ((c[2] & 1) << 1) | (c[3] & 1);
  }
  for (int64_t i = v_valid; i < v_cap; ++i) {
    out_parent[i] = -1;
    out_kpos[i] = 0;
  }
  return count;
}

}  // extern "C"
