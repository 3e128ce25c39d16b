// Native host-side graph precompute kernels.
//
// The reference delegates its native performance to third-party CUDA/C++
// libraries (torch_scatter, PyG, dgl.sparse — SURVEY section 2.9). On the
// TPU stack the device path is XLA/Pallas, and the host-side graph
// construction is the part that benefits from native code: k-hop
// neighborhood expansion on big icospheres (splits 6: 40,962 nodes x
// 6 hops -> ~5M edges) is quadratic-memory with scipy's boolean matrix
// powers but linear with a stamped BFS here.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <cstddef>
#include <cstdint>
#include <vector>

extern "C" {

// K-hop neighborhoods over a CSR adjacency (indptr[n+1], indices[nnz]).
// Pass 1 (out_src == nullptr): fill out_counts[i] = |khop(i)| (no self).
// Pass 2: fill out_src/out_dst using offsets (exclusive prefix of counts).
// Returns total edge count.
//
// visited stamps avoid clearing an n-sized array per source node.
int64_t khop_edges(
    const int32_t* indptr,
    const int32_t* indices,
    int32_t n,
    int32_t k,
    int64_t* out_counts,
    const int64_t* offsets,
    int32_t* out_src,
    int32_t* out_dst) {
  std::vector<int32_t> stamp(n, -1);
  std::vector<int32_t> frontier;
  std::vector<int32_t> next;
  std::vector<int32_t> reached;
  frontier.reserve(1024);
  next.reserve(1024);
  reached.reserve(4096);

  int64_t total = 0;
  for (int32_t s = 0; s < n; ++s) {
    frontier.clear();
    reached.clear();
    stamp[s] = s;
    frontier.push_back(s);
    for (int32_t hop = 0; hop < k; ++hop) {
      next.clear();
      for (int32_t u : frontier) {
        for (int32_t e = indptr[u]; e < indptr[u + 1]; ++e) {
          int32_t v = indices[e];
          if (stamp[v] != s) {
            stamp[v] = s;
            next.push_back(v);
            reached.push_back(v);
          }
        }
      }
      frontier.swap(next);
      if (frontier.empty()) break;
    }
    if (out_counts != nullptr) {
      out_counts[s] = static_cast<int64_t>(reached.size());
    }
    if (out_src != nullptr) {
      int64_t off = offsets[s];
      for (std::size_t i = 0; i < reached.size(); ++i) {
        out_src[off + i] = s;
        out_dst[off + i] = reached[i];
      }
    }
    total += static_cast<int64_t>(reached.size());
  }
  return total;
}

// Padded-CSR table from destination-sorted receivers: edge_ids[n][kmax]
// (0-padded) and mask. Returns kmax.
int32_t build_padded_csr(
    const int32_t* receivers,
    int64_t n_edges,
    int32_t n_receivers,
    int32_t kmax_cap,
    int32_t* edge_ids,   // [n_receivers * kmax] preallocated, kmax computed
    uint8_t* mask,
    int32_t kmax) {
  for (int64_t i = 0; i < static_cast<int64_t>(n_receivers) * kmax; ++i) {
    edge_ids[i] = 0;
    mask[i] = 0;
  }
  std::vector<int32_t> fill(n_receivers, 0);
  for (int64_t e = 0; e < n_edges; ++e) {
    int32_t r = receivers[e];
    int32_t slot = fill[r]++;
    if (slot < kmax) {
      edge_ids[static_cast<int64_t>(r) * kmax + slot] = static_cast<int32_t>(e);
      mask[static_cast<int64_t>(r) * kmax + slot] = 1;
    }
  }
  int32_t max_fill = 0;
  for (int32_t r = 0; r < n_receivers; ++r) {
    if (fill[r] > max_fill) max_fill = fill[r];
  }
  (void)kmax_cap;
  return max_fill;
}

}  // extern "C"
