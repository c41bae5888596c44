// Native road-graph engine: Dijkstra shortest paths over the waypoint graph.
//
// This is the host-side runtime counterpart of CARLA's C++ GlobalRoutePlanner
// (the reference reaches it through the Python agents package,
// model/autonomous_drive.py:405-474). Route tracing happens at episode
// boundaries but for large fleets we trace hundreds of routes per setup;
// the pure-Python fallback in cilrs_tpu/maps/routing.py takes ~10 s per route
// on a full town graph — this runs in microseconds.
//
// Exposed as a C ABI for ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>
#include <cmath>
#include <limits>

namespace {

struct Graph {
  int32_t W = 0;
  int32_t max_next = 0;
  std::vector<float> xy;        // [W * 2]
  std::vector<int32_t> next;    // [W * max_next]
  std::vector<int32_t> num_next;

  // scratch reused across queries
  std::vector<float> dist;
  std::vector<int32_t> prev;
};

inline float edge_len(const Graph& g, int32_t u, int32_t v) {
  const float dx = g.xy[2 * v] - g.xy[2 * u];
  const float dy = g.xy[2 * v + 1] - g.xy[2 * u + 1];
  return std::sqrt(dx * dx + dy * dy);
}

}  // namespace

extern "C" {

Graph* rg_build(const float* xy, const int32_t* next, const int32_t* num_next,
                int32_t W, int32_t max_next) {
  auto* g = new Graph();
  g->W = W;
  g->max_next = max_next;
  g->xy.assign(xy, xy + 2 * W);
  g->next.assign(next, next + static_cast<size_t>(W) * max_next);
  g->num_next.assign(num_next, num_next + W);
  g->dist.resize(W);
  g->prev.resize(W);
  return g;
}

void rg_free(Graph* g) { delete g; }

// Returns path length (number of waypoints) or 0 if unreachable.
// Path is written src..dst into `out` (capacity max_len; truncated from the
// START if longer — callers want the prefix toward dst? No: we keep the prefix
// from src, matching fixed-length route buffers).
int32_t rg_shortest_path(Graph* g, int32_t src, int32_t dst,
                         int32_t* out, int32_t max_len) {
  if (src < 0 || dst < 0 || src >= g->W || dst >= g->W) return 0;
  const float INF = std::numeric_limits<float>::infinity();
  std::fill(g->dist.begin(), g->dist.end(), INF);
  std::fill(g->prev.begin(), g->prev.end(), -1);
  using QE = std::pair<float, int32_t>;
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
  g->dist[src] = 0.0f;
  pq.emplace(0.0f, src);
  while (!pq.empty()) {
    auto [d, u] = pq.top();
    pq.pop();
    if (u == dst) break;
    if (d > g->dist[u]) continue;
    const int32_t n = g->num_next[u];
    for (int32_t k = 0; k < n; ++k) {
      const int32_t v = g->next[static_cast<size_t>(u) * g->max_next + k];
      if (v == u || v < 0) continue;
      const float nd = d + edge_len(*g, u, v);
      if (nd < g->dist[v]) {
        g->dist[v] = nd;
        g->prev[v] = u;
        pq.emplace(nd, v);
      }
    }
  }
  if (g->dist[dst] == INF) return 0;
  // Reconstruct (reversed), then emit forward.
  std::vector<int32_t> rev;
  for (int32_t v = dst; v != -1; v = g->prev[v]) rev.push_back(v);
  int32_t n = static_cast<int32_t>(rev.size());
  int32_t m = n < max_len ? n : max_len;
  for (int32_t i = 0; i < m; ++i) out[i] = rev[n - 1 - i];
  return m;
}

// Batched variant: trace `count` (src, dst) pairs into a [count, max_len]
// buffer; lengths go to out_lens. Amortizes ctypes overhead for fleet setup.
void rg_shortest_paths(Graph* g, const int32_t* srcs, const int32_t* dsts,
                       int32_t count, int32_t* out, int32_t max_len,
                       int32_t* out_lens) {
  for (int32_t i = 0; i < count; ++i) {
    out_lens[i] = rg_shortest_path(g, srcs[i], dsts[i],
                                   out + static_cast<size_t>(i) * max_len, max_len);
  }
}

// Distances from src to every node (full relaxation; for spawn/route scoring).
void rg_distances(Graph* g, int32_t src, float* out) {
  const float INF = std::numeric_limits<float>::infinity();
  std::fill(g->dist.begin(), g->dist.end(), INF);
  using QE = std::pair<float, int32_t>;
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
  g->dist[src] = 0.0f;
  pq.emplace(0.0f, src);
  while (!pq.empty()) {
    auto [d, u] = pq.top();
    pq.pop();
    if (d > g->dist[u]) continue;
    const int32_t n = g->num_next[u];
    for (int32_t k = 0; k < n; ++k) {
      const int32_t v = g->next[static_cast<size_t>(u) * g->max_next + k];
      if (v == u || v < 0) continue;
      const float nd = d + edge_len(*g, u, v);
      if (nd < g->dist[v]) {
        g->dist[v] = nd;
        pq.emplace(nd, v);
      }
    }
  }
  std::memcpy(out, g->dist.data(), sizeof(float) * g->W);
}

}  // extern "C"
