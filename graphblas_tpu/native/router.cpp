// Clos-network router: 128-edge-coloring of regular bipartite multigraphs.
//
// This is the native runtime component of the permutation engine
// (graphblas_tpu/ops/permute.py).  The TPU moves data fast only in regular
// patterns (per-row 128-lane shuffles, tile transposes); an arbitrary
// permutation is realized as a Clos/Benes network whose middle-stage routing
// is a proper edge coloring of a k-regular bipartite multigraph — computed
// here by recursive Euler splitting (k -> k/2 -> ... -> 1), O(E log k) with
// O(V + E) scratch reused across all classes (per-class allocations would be
// O(V * k) and dominate at deep levels).
//
// The reference framework's native layer is SuiteSparse's C engine; this
// file plays the analogous role for the one genuinely sequential, pointer-
// chasing computation in our engine (Hierholzer circuit walks), which is
// ~100x slower in Python/numpy.
//
// Exposed via ctypes (no pybind11 in the image): plain C ABI.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Scratch {
  // vertex-indexed, allocated once; only entries for touched vertices are
  // ever written, and they are reset after each class.
  std::vector<int64_t> deg;    // degree within current class
  std::vector<int64_t> start;  // adjacency slot start
  std::vector<int64_t> cur;    // fill / walk cursor
  std::vector<int64_t> touched;
  // edge-indexed (local to class)
  std::vector<int64_t> adj;    // 2 * E_cls slots of local edge ids
  std::vector<uint8_t> used;
  std::vector<uint8_t> bits;
  // walk stacks
  std::vector<int64_t> vstack;
  std::vector<int64_t> estack;
  std::vector<int64_t> circuit;
};

// Split one class (2h-regular bipartite multigraph) into two h-regular
// halves by alternating edges along Euler circuits.  edge_ids[lo..hi) are
// global edge ids; writes a bit per LOCAL index into s.bits[0..len).
void euler_split(const int64_t *edge_ids, int64_t len, const int32_t *in_rows,
                 const int32_t *out_rows, int64_t R, Scratch &s) {
  s.touched.clear();
  for (int64_t t = 0; t < len; ++t) {
    const int64_t e = edge_ids[t];
    const int64_t u = in_rows[e];
    const int64_t v = R + out_rows[e];
    if (s.deg[u]++ == 0) s.touched.push_back(u);
    if (s.deg[v]++ == 0) s.touched.push_back(v);
  }
  int64_t acc = 0;
  for (const int64_t v : s.touched) {
    s.start[v] = acc;
    s.cur[v] = acc;
    acc += s.deg[v];
  }
  if ((int64_t)s.adj.size() < 2 * len) s.adj.resize(2 * len);
  if ((int64_t)s.used.size() < len) s.used.resize(len);
  if ((int64_t)s.bits.size() < len) s.bits.resize(len);
  std::memset(s.used.data(), 0, len);
  for (int64_t t = 0; t < len; ++t) {
    const int64_t e = edge_ids[t];
    s.adj[s.cur[in_rows[e]]++] = t;
    s.adj[s.cur[R + out_rows[e]]++] = t;
  }
  // walk pointers restart at slot starts; `cur` now holds slot ends
  for (const int64_t v : s.touched) {
    const int64_t end = s.cur[v];
    s.cur[v] = s.start[v];
    s.start[v] = end;  // start[] repurposed as end[]
  }

  for (const int64_t v0 : s.touched) {
    if (s.cur[v0] >= s.start[v0]) continue;
    s.vstack.clear();
    s.estack.clear();
    s.circuit.clear();
    s.vstack.push_back(v0);
    s.estack.push_back(-1);
    while (!s.vstack.empty()) {
      const int64_t v = s.vstack.back();
      int64_t p = s.cur[v];
      const int64_t pend = s.start[v];
      while (p < pend && s.used[s.adj[p]]) ++p;
      s.cur[v] = p;
      if (p == pend) {
        s.vstack.pop_back();
        const int64_t e_in = s.estack.back();
        s.estack.pop_back();
        if (e_in >= 0) s.circuit.push_back(e_in);
      } else {
        const int64_t t = s.adj[p];
        s.used[t] = 1;
        const int64_t e = edge_ids[t];
        const int64_t other =
            (v < R) ? (R + out_rows[e]) : static_cast<int64_t>(in_rows[e]);
        s.vstack.push_back(other);
        s.estack.push_back(t);
      }
    }
    uint8_t bit = 0;
    for (int64_t idx = static_cast<int64_t>(s.circuit.size()) - 1; idx >= 0; --idx) {
      s.bits[s.circuit[idx]] = bit;
      bit ^= 1;
    }
  }

  // reset vertex scratch for the next class
  for (const int64_t v : s.touched) {
    s.deg[v] = 0;
    s.start[v] = 0;
    s.cur[v] = 0;
  }
}

}  // namespace

extern "C" {

// Proper k-edge-coloring of a k-regular bipartite multigraph (k power of 2).
// in_rows/out_rows: E entries in [0, R).  colors: E entries out, in [0, k).
// Returns 0 on success.
int gbtpu_euler_color(const int32_t *in_rows, const int32_t *out_rows,
                      int64_t E, int64_t R, int32_t k, int32_t *colors) {
  if (k <= 0 || (k & (k - 1)) != 0) return 1;
  std::memset(colors, 0, sizeof(int32_t) * E);

  Scratch s;
  s.deg.assign(2 * R, 0);
  s.start.assign(2 * R, 0);
  s.cur.assign(2 * R, 0);
  s.touched.reserve(2 * R);

  // edges kept in one array, stably partitioned into classes level by level
  std::vector<int64_t> edges(E), next_edges(E);
  for (int64_t e = 0; e < E; ++e) edges[e] = e;
  std::vector<int64_t> bounds = {0, E}, next_bounds;

  int levels = 0;
  while ((1 << levels) < k) ++levels;

  std::vector<uint8_t> levelbits(E);
  const int hw = static_cast<int>(std::thread::hardware_concurrency());
  const int max_threads = hw > 0 ? hw : 4;

  for (int level = 0; level < levels; ++level) {
    const size_t nclasses = bounds.size() - 1;
    const int nthreads = static_cast<int>(
        nclasses < static_cast<size_t>(max_threads) ? nclasses : max_threads);
    if (nthreads <= 1) {
      for (size_t c = 0; c + 1 < bounds.size(); ++c) {
        const int64_t lo = bounds[c], hi = bounds[c + 1];
        euler_split(edges.data() + lo, hi - lo, in_rows, out_rows, R, s);
        std::memcpy(levelbits.data() + lo, s.bits.data(), hi - lo);
      }
    } else {
      // classes are independent: fan out with per-thread scratch
      std::atomic<size_t> next_class{0};
      auto worker = [&]() {
        Scratch ws;
        ws.deg.assign(2 * R, 0);
        ws.start.assign(2 * R, 0);
        ws.cur.assign(2 * R, 0);
        for (;;) {
          const size_t c = next_class.fetch_add(1);
          if (c + 1 >= bounds.size()) break;
          const int64_t lo = bounds[c], hi = bounds[c + 1];
          euler_split(edges.data() + lo, hi - lo, in_rows, out_rows, R, ws);
          std::memcpy(levelbits.data() + lo, ws.bits.data(), hi - lo);
        }
      };
      std::vector<std::thread> threads;
      threads.reserve(nthreads);
      for (int tix = 0; tix < nthreads; ++tix) threads.emplace_back(worker);
      for (auto &th : threads) th.join();
    }
    // serial stable partition into next level's classes
    next_bounds.clear();
    int64_t out_pos = 0;
    for (size_t c = 0; c + 1 < bounds.size(); ++c) {
      const int64_t lo = bounds[c], hi = bounds[c + 1];
      next_bounds.push_back(out_pos);
      for (int64_t t = lo; t < hi; ++t)
        if (!levelbits[t]) next_edges[out_pos++] = edges[t];
      next_bounds.push_back(out_pos);
      for (int64_t t = lo; t < hi; ++t)
        if (levelbits[t]) {
          const int64_t e = edges[t];
          colors[e] |= (1 << level);
          next_edges[out_pos++] = e;
        }
    }
    next_bounds.push_back(out_pos);
    bounds.swap(next_bounds);
    edges.swap(next_edges);
  }
  return 0;
}

// Host-side COO utilities (the hot graph-construction path; the reference
// uses numba-compiled helpers for the analogous conversions,
// core/ss/matrix.py:4169-4430).

// Stable counting sort by keys in [0, n); returns the permutation.
int gbtpu_counting_sort(const int32_t *keys, int64_t E, int64_t n,
                        int64_t *perm_out) {
  std::vector<int64_t> counts(n + 1, 0);
  for (int64_t e = 0; e < E; ++e) counts[keys[e] + 1]++;
  for (int64_t i = 0; i < n; ++i) counts[i + 1] += counts[i];
  for (int64_t e = 0; e < E; ++e) perm_out[counts[keys[e]]++] = e;
  return 0;
}

}  // extern "C"


extern "C" {

// Faster 128-edge-coloring via successor-pairing Euler splits.
//
// Standard Euler-split routing walks Hierholzer circuits over an adjacency
// structure rebuilt per class (gbtpu_euler_color above).  This variant uses
// the pairing formulation: keep the class's edges in two orders — EL
// (grouped by left vertex) and ER (grouped by right vertex).  Pair
// consecutive edges (i, i^1) in each order (valid: every vertex's per-class
// degree is even and segment starts stay even).  The union of the two
// pairings decomposes the class into even cycles over edges; alternating
// bits along each cycle is exactly an Euler split.  Per split level this is
// two linear position passes, one pointer walk with ~2 random reads per
// edge, and two segment-local stable partitions — no adjacency lists, no
// stacks, no used-flag scans.
int gbtpu_euler_color2(const int32_t *in_rows, const int32_t *out_rows,
                       int64_t E, int64_t R, int32_t k, int32_t *colors) {
  if (k <= 0 || (k & (k - 1)) != 0) return 1;
  std::memset(colors, 0, sizeof(int32_t) * E);
  if (E == 0 || k == 1) return 0;

  std::vector<int32_t> EL(E), ER(E), EL2(E), ER2(E);
  std::vector<int32_t> succL(E), succR(E), g(E);
  std::vector<uint8_t> bits(E), visited(E);

  // initial orders: counting sort by left / right vertex
  {
    std::vector<int64_t> cnt(R + 1, 0);
    for (int64_t e = 0; e < E; ++e) cnt[in_rows[e] + 1]++;
    for (int64_t i = 0; i < R; ++i) cnt[i + 1] += cnt[i];
    for (int64_t e = 0; e < E; ++e) EL[cnt[in_rows[e]]++] = (int32_t)e;
    std::fill(cnt.begin(), cnt.end(), 0);
    for (int64_t e = 0; e < E; ++e) cnt[out_rows[e] + 1]++;
    for (int64_t i = 0; i < R; ++i) cnt[i + 1] += cnt[i];
    for (int64_t e = 0; e < E; ++e) ER[cnt[out_rows[e]]++] = (int32_t)e;
  }

  std::vector<int64_t> bounds = {0, E}, next_bounds;
  int levels = 0;
  while ((1 << levels) < k) ++levels;

  for (int level = 0; level < levels; ++level) {
    // pairing successors (independent-access passes — MLP-friendly):
    //   succL[e] = the L-pair partner of e; succR likewise;
    //   g = succR ∘ succL, whose orbits are ALTERNATE edges of each pairing
    //   cycle — walking g touches E/2 edges with ONE dependent load each.
    for (int64_t i = 0; i < E; ++i) succL[EL[i]] = EL[i ^ 1];
    for (int64_t i = 0; i < E; ++i) succR[ER[i]] = ER[i ^ 1];
    for (int64_t e = 0; e < E; ++e) g[e] = succR[succL[e]];
    std::memset(visited.data(), 0, E);
    std::memset(bits.data(), 1, E);
    // orbit walk: one dependent load per TWO edges (g hops even positions)
    for (int64_t s0 = 0; s0 < E; ++s0) {
      if (visited[s0]) continue;
      int32_t e = (int32_t)s0;
      do {
        visited[e] = 1;
        bits[e] = 0;
        visited[succL[e]] = 1;  // the odd-position partner keeps bit 1
        e = g[e];
      } while (!visited[e]);
    }
    // apply this level's bit; segment-local stable partition keeps every
    // class contiguous (and every per-vertex run even-aligned)
    next_bounds.clear();
    int64_t outL = 0;
    for (size_t c = 0; c + 1 < bounds.size(); ++c) {
      const int64_t lo = bounds[c], hi = bounds[c + 1];
      next_bounds.push_back(outL);
      for (int64_t i = lo; i < hi; ++i)
        if (!bits[EL[i]]) EL2[outL++] = EL[i];
      next_bounds.push_back(outL);
      for (int64_t i = lo; i < hi; ++i)
        if (bits[EL[i]]) {
          colors[EL[i]] |= (1 << level);
          EL2[outL++] = EL[i];
        }
    }
    next_bounds.push_back(outL);
    int64_t outR = 0;
    for (size_t c = 0; c + 1 < bounds.size(); ++c) {
      const int64_t lo = bounds[c], hi = bounds[c + 1];
      for (int64_t i = lo; i < hi; ++i)
        if (!bits[ER[i]]) ER2[outR++] = ER[i];
      for (int64_t i = lo; i < hi; ++i)
        if (bits[ER[i]]) ER2[outR++] = ER[i];
    }
    EL.swap(EL2);
    ER.swap(ER2);
    bounds.swap(next_bounds);
  }
  return 0;
}

}  // extern "C"


extern "C" {

// Batched coloring of many INDEPENDENT k-regular bipartite subproblems
// (the stride decomposition of level>0 S-stage routings): one call, one
// loop in C — the per-call Python/ctypes overhead dominated when levels
// decomposed into tens of thousands of tiny groups.
// Every group g covers edges [g*seglen, (g+1)*seglen) with rows in [0, Rs).
// in_rows is the same repeating pattern for every group (slot/128).
int gbtpu_euler_color_batched(const int32_t *in_rows_local,
                              const int32_t *out_rows, int64_t seglen,
                              int64_t n_groups, int64_t Rs, int32_t k,
                              int32_t *colors) {
  for (int64_t g = 0; g < n_groups; ++g) {
    const int rc = gbtpu_euler_color2(in_rows_local, out_rows + g * seglen,
                                      seglen, Rs, k, colors + g * seglen);
    if (rc != 0) return rc;
  }
  return 0;
}

}  // extern "C"
