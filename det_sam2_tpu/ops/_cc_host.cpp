// Host-side 8-connectivity connected components (union-find) on binary masks.
//
// TPU-native replacement for the runtime contract of the reference CUDA
// kernel /root/reference/sam2/csrc/connected_components.cu:213-289
// (get_connected_componnets): input [N, H, W] uint8, outputs int32 labels
// (>0 on foreground, 0 on background) and per-pixel component areas.
// Label VALUES differ from the CUDA kernel's block-encoded ids; all
// consumers only test labels > 0 and compare areas
// (sam2/utils/misc.py:365-393, sam2/utils/transforms.py:84-120).
//
// Built as a plain shared library (no pybind11); called through ctypes.
// Path-compressed weighted union-find over a raster scan: ~0.5 GB/s/core.

#include <cstdint>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(int32_t n) : parent(n) {
    for (int32_t i = 0; i < n; ++i) parent[i] = i;
  }
  int32_t find(int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int32_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a < b) parent[b] = a; else parent[a] = b;
  }
};

}  // namespace

extern "C" {

// masks:  [n, h, w] uint8 (nonzero = foreground)
// labels: [n, h, w] int32 out (0 background; >0 component id)
// areas:  [n, h, w] int32 out (component size at each pixel; 0 background)
void connected_components_u8(const uint8_t* masks, int64_t n, int64_t h,
                             int64_t w, int32_t* labels, int32_t* areas) {
  const int64_t hw = h * w;
  for (int64_t img = 0; img < n; ++img) {
    const uint8_t* m = masks + img * hw;
    int32_t* lab = labels + img * hw;
    int32_t* area = areas + img * hw;

    UnionFind uf(static_cast<int32_t>(hw));
    // first pass: union with west / north / north-west / north-east
    for (int64_t y = 0; y < h; ++y) {
      for (int64_t x = 0; x < w; ++x) {
        const int64_t i = y * w + x;
        if (!m[i]) continue;
        if (x > 0 && m[i - 1]) uf.unite(i, i - 1);
        if (y > 0) {
          const int64_t up = i - w;
          if (m[up]) uf.unite(i, up);
          if (x > 0 && m[up - 1]) uf.unite(i, up - 1);
          if (x + 1 < w && m[up + 1]) uf.unite(i, up + 1);
        }
      }
    }
    // second pass: root -> dense label + area accumulation
    std::vector<int32_t> count(hw, 0);
    for (int64_t i = 0; i < hw; ++i) {
      if (m[i]) count[uf.find(static_cast<int32_t>(i))]++;
    }
    std::vector<int32_t> dense(hw, 0);
    int32_t next_label = 1;
    for (int64_t i = 0; i < hw; ++i) {
      if (!m[i]) {
        lab[i] = 0;
        area[i] = 0;
        continue;
      }
      const int32_t root = uf.find(static_cast<int32_t>(i));
      if (dense[root] == 0) dense[root] = next_label++;
      lab[i] = dense[root];
      area[i] = count[root];
    }
  }
}

}  // extern "C"
