// graphprep — native host-side graph preprocessing for difformer_tpu.
//
// The reference delegates its preprocessing to torch_sparse/torch_cluster
// C++ kernels (CSR build at node classification/data_utils.py:183-200,
// knn_graph at physical particle/datasets/actstrack.py:178, induced
// subgraphs at node classification/main-batch.py:131). This library is the
// framework's own native equivalent: O(E) counting-sort CSR construction,
// degree/normalization, ELL bucket fill, induced-subgraph extraction and a
// multithreaded brute-force kNN — all exposed through a plain C ABI consumed
// via ctypes (no pybind11 dependency in this environment).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC graphprep.cpp -o libgraphprep.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Counting sort of edges by receiver; fills order (positions into the
// original arrays) and indptr (receiver CSR offsets, length n+1).
void sort_edges_by_receiver(const int32_t* receivers, int64_t e, int64_t n,
                            int64_t* order, int64_t* indptr) {
  std::vector<int64_t> count(n + 1, 0);
  for (int64_t i = 0; i < e; ++i) count[receivers[i] + 1]++;
  for (int64_t i = 0; i < n; ++i) count[i + 1] += count[i];
  std::memcpy(indptr, count.data(), sizeof(int64_t) * (n + 1));
  std::vector<int64_t> cursor(count.begin(), count.end() - 1);
  for (int64_t i = 0; i < e; ++i) order[cursor[receivers[i]]++] = i;
}

// degree of each node as receiver
void degree_count(const int32_t* receivers, int64_t e, int64_t n,
                  double* deg) {
  std::fill(deg, deg + n, 0.0);
  for (int64_t i = 0; i < e; ++i) deg[receivers[i]] += 1.0;
}

// reference-parity normalized GCN edge values:
// val = w * rsqrt(deg[recv]) * rsqrt(deg[send]); non-finite -> 0
void gcn_norm_values(const int32_t* senders, const int32_t* receivers,
                     const float* edge_weight, int64_t e, int64_t n,
                     float* out) {
  std::vector<double> deg(n, 0.0);
  for (int64_t i = 0; i < e; ++i) deg[receivers[i]] += 1.0;
  std::vector<float> inv(n);
  for (int64_t i = 0; i < n; ++i)
    inv[i] = deg[i] > 0.0 ? (float)(1.0 / std::sqrt(deg[i])) : 0.0f;
  for (int64_t i = 0; i < e; ++i) {
    float w = edge_weight ? edge_weight[i] : 1.0f;
    float v = w * inv[receivers[i]] * inv[senders[i]];
    out[i] = std::isfinite(v) ? v : 0.0f;
  }
}

// Fill one ELL bucket: for bucket rows (nodes), copy up to k neighbors
// (point_s) and values (val_s) from CSR ranges, zero-padded.
void ell_fill(const int64_t* nodes, int64_t nb, int64_t k,
              const int64_t* indptr, const int32_t* point_s,
              const float* val_s, int32_t* idx_out, float* w_out) {
  for (int64_t row = 0; row < nb; ++row) {
    int64_t node = nodes[row];
    int64_t a = indptr[node], b = indptr[node + 1];
    int64_t len = std::min<int64_t>(b - a, k);
    int32_t* ir = idx_out + row * k;
    float* wr = w_out + row * k;
    for (int64_t j = 0; j < len; ++j) {
      ir[j] = point_s[a + j];
      wr[j] = val_s[a + j];
    }
    for (int64_t j = len; j < k; ++j) {
      ir[j] = 0;
      wr[j] = 0.0f;
    }
  }
}

// Induced subgraph: keep edges with both endpoints selected; relabel via
// remap (remap[node] = position in chunk, -1 otherwise). Returns kept count.
int64_t induced_subgraph(const int32_t* senders, const int32_t* receivers,
                         int64_t e, const int64_t* remap,
                         int32_t* out_s, int32_t* out_r) {
  int64_t kept = 0;
  for (int64_t i = 0; i < e; ++i) {
    int64_t rs = remap[senders[i]];
    int64_t rr = remap[receivers[i]];
    if (rs >= 0 && rr >= 0) {
      out_s[kept] = (int32_t)rs;
      out_r[kept] = (int32_t)rr;
      ++kept;
    }
  }
  return kept;
}

// Synchronous label propagation over the symmetrized adjacency —
// community detection for the locality-aware shard layout
// (parallel/partition.locality_layout). Each pass assigns every node the
// highest-scoring neighbor label where score = count + 0.5 * prio(label)
// and prio is a deterministic splitmix64 hash in [0, 1) (breaks the
// symmetric-tie oscillation of plain synchronous LP without RNG state).
// Multithreaded over nodes; per-node work is sort + run-length over its
// neighbor labels. Stops early when a pass changes nothing. labels_out
// holds compacted labels in [0, n_communities).
static inline double prio_hash(uint64_t x) {
  x += 0x9e3779b97f4a7c15ull;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
  x = x ^ (x >> 31);
  return (double)(x >> 11) * (1.0 / 9007199254740992.0);  // [0, 1)
}

void label_propagation(const int32_t* senders, const int32_t* receivers,
                       int64_t e, int64_t n, int32_t iters,
                       int64_t* labels_out) {
  // symmetrized CSR (self-loops dropped)
  std::vector<int64_t> indptr(n + 1, 0);
  for (int64_t i = 0; i < e; ++i) {
    if (senders[i] == receivers[i]) continue;
    indptr[senders[i] + 1]++;
    indptr[receivers[i] + 1]++;
  }
  for (int64_t i = 0; i < n; ++i) indptr[i + 1] += indptr[i];
  std::vector<int32_t> nbr(indptr[n]);
  {
    std::vector<int64_t> cur(indptr.begin(), indptr.end() - 1);
    for (int64_t i = 0; i < e; ++i) {
      if (senders[i] == receivers[i]) continue;
      nbr[cur[senders[i]]++] = receivers[i];
      nbr[cur[receivers[i]]++] = senders[i];
    }
  }

  std::vector<int64_t> labels(n), next_labels(n);
  for (int64_t i = 0; i < n; ++i) labels[i] = i;
  unsigned nt = std::max(1u, std::thread::hardware_concurrency());

  for (int32_t it = 0; it < iters; ++it) {
    std::atomic<int64_t> chunk(0);
    std::atomic<bool> changed(false);
    auto worker = [&]() {
      std::vector<int64_t> ls;
      for (;;) {
        int64_t c = chunk.fetch_add(1);
        int64_t lo = c * 4096, hi = std::min<int64_t>(lo + 4096, n);
        if (lo >= n) break;
        for (int64_t v = lo; v < hi; ++v) {
          int64_t a = indptr[v], b = indptr[v + 1];
          if (a == b) { next_labels[v] = labels[v]; continue; }
          ls.clear();
          for (int64_t j = a; j < b; ++j) ls.push_back(labels[nbr[j]]);
          std::sort(ls.begin(), ls.end());
          double best_score = -1.0;
          int64_t best_lab = labels[v];
          for (size_t j = 0; j < ls.size();) {
            size_t j2 = j;
            while (j2 < ls.size() && ls[j2] == ls[j]) ++j2;
            double score = (double)(j2 - j) + 0.5 * prio_hash((uint64_t)ls[j]);
            if (score > best_score) { best_score = score; best_lab = ls[j]; }
            j = j2;
          }
          next_labels[v] = best_lab;
          if (best_lab != labels[v]) changed.store(true,
                                                  std::memory_order_relaxed);
        }
      }
    };
    std::vector<std::thread> threads;
    for (unsigned t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    labels.swap(next_labels);
    if (!changed.load()) break;
  }

  // compact labels to [0, n_communities)
  std::vector<int64_t> remap(n, -1);
  int64_t next_id = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (remap[labels[i]] < 0) remap[labels[i]] = next_id++;
    labels_out[i] = remap[labels[i]];
  }
}

// Brute-force kNN over rows of x [n, d]; writes nbr [n, k] sorted by
// distance. include_self=0 excludes the point itself. Multithreaded.
void knn_graph(const float* x, int64_t n, int64_t d, int64_t k,
               int include_self, int64_t* nbr) {
  int64_t kk = std::min<int64_t>(k, n);
  std::vector<double> sq(n);
  for (int64_t i = 0; i < n; ++i) {
    double s = 0;
    for (int64_t j = 0; j < d; ++j) s += (double)x[i * d + j] * x[i * d + j];
    sq[i] = s;
  }
  unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    std::vector<std::pair<double, int64_t>> dist(n);
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) break;
      for (int64_t j = 0; j < n; ++j) {
        double dot = 0;
        for (int64_t c = 0; c < d; ++c)
          dot += (double)x[i * d + c] * x[j * d + c];
        double dd = sq[i] - 2.0 * dot + sq[j];
        if (!include_self && j == i) dd = 1e300;
        dist[j] = {dd, j};
      }
      std::partial_sort(dist.begin(), dist.begin() + kk, dist.end());
      for (int64_t j = 0; j < kk; ++j) nbr[i * kk + j] = dist[j].second;
    }
  };
  std::vector<std::thread> threads;
  for (unsigned t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
