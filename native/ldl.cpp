#include "ldl.h"

#include <algorithm>
#include <queue>
#include <set>

namespace tpuqp {

std::vector<idx> mindeg_order(idx n, const idx* Ap, const idx* Ai) {
  // Elimination-graph minimum-degree ordering (greedy, exact degrees —
  // the simple ancestor of AMD). Declines (returns empty) on problems
  // where the quadratic-time scan or clique growth would hurt; the caller
  // falls back to RCM. Ties break on the smallest index for determinism.
  if (n > 6000) return {};
  std::vector<std::set<idx>> adj(n);
  for (idx j = 0; j < n; ++j)
    for (idx p = Ap[j]; p < Ap[j + 1]; ++p) {
      idx i = Ai[p];
      if (i == j) continue;
      adj[i].insert(j);
      adj[j].insert(i);
    }
  const size_t edge_cap = 8u * 1000u * 1000u;
  size_t edges = 0;
  for (idx j = 0; j < n; ++j) edges += adj[j].size();

  std::vector<idx> perm(n);  // perm[old] = new position
  std::vector<char> done(n, 0);
  for (idx k = 0; k < n; ++k) {
    idx best = -1;
    size_t best_deg = 0;
    for (idx v = 0; v < n; ++v) {
      if (done[v]) continue;
      size_t d = adj[v].size();
      if (best < 0 || d < best_deg) {
        best = v;
        best_deg = d;
      }
    }
    done[best] = 1;
    perm[best] = k;
    // eliminate: neighbors of best become a clique
    std::vector<idx> nb(adj[best].begin(), adj[best].end());
    for (idx a : nb) {
      adj[a].erase(best);
      edges -= 1;
    }
    for (size_t x = 0; x < nb.size(); ++x)
      for (size_t y = x + 1; y < nb.size(); ++y) {
        if (adj[nb[x]].insert(nb[y]).second) {
          adj[nb[y]].insert(nb[x]);
          edges += 2;
        }
      }
    adj[best].clear();
    if (edges > edge_cap) return {};
  }
  return perm;
}

std::vector<idx> rcm_order(idx n, const idx* Ap, const idx* Ai) {
  // Build the full (symmetrized) adjacency from the upper-triangular pattern.
  std::vector<idx> deg(n, 0);
  for (idx j = 0; j < n; ++j)
    for (idx p = Ap[j]; p < Ap[j + 1]; ++p) {
      idx i = Ai[p];
      if (i == j) continue;
      deg[i] += 1;
      deg[j] += 1;
    }
  std::vector<idx> ptr(n + 1, 0);
  for (idx j = 0; j < n; ++j) ptr[j + 1] = ptr[j] + deg[j];
  std::vector<idx> adj(ptr[n]);
  std::vector<idx> fill(ptr.begin(), ptr.end() - 1);
  for (idx j = 0; j < n; ++j)
    for (idx p = Ap[j]; p < Ap[j + 1]; ++p) {
      idx i = Ai[p];
      if (i == j) continue;
      adj[fill[i]++] = j;
      adj[fill[j]++] = i;
    }

  std::vector<idx> order;
  order.reserve(n);
  std::vector<char> visited(n, 0);
  std::vector<idx> nbrs;
  for (idx seed_scan = 0; seed_scan < n; ++seed_scan) {
    if (visited[seed_scan]) continue;
    // start each component from a minimum-degree node
    idx seed = seed_scan;
    // BFS (Cuthill-McKee): neighbors visited in increasing degree
    std::queue<idx> bfs;
    bfs.push(seed);
    visited[seed] = 1;
    while (!bfs.empty()) {
      idx v = bfs.front();
      bfs.pop();
      order.push_back(v);
      nbrs.clear();
      for (idx p = ptr[v]; p < ptr[v + 1]; ++p)
        if (!visited[adj[p]]) nbrs.push_back(adj[p]);
      std::sort(nbrs.begin(), nbrs.end(),
                [&](idx a, idx b) { return deg[a] < deg[b]; });
      for (idx w : nbrs) {
        visited[w] = 1;
        bfs.push(w);
      }
    }
  }
  // reverse ordering; perm[old] = new
  std::vector<idx> perm(n);
  for (idx k = 0; k < n; ++k) perm[order[n - 1 - k]] = k;
  return perm;
}

// Elimination tree and column counts for upper-triangular CSC input
// (Liu's algorithm with path compression via "ancestor" pointers).
bool ldl_symbolic(idx n, const idx* Ap, const idx* Ai, LDLSymbolic& S) {
  S.n = n;
  S.etree.assign(n, -1);
  std::vector<idx> ancestor(n, -1);
  bool diag_ok = true;
  for (idx j = 0; j < n; ++j) {
    bool has_diag = false;
    for (idx p = Ap[j]; p < Ap[j + 1]; ++p) {
      idx i = Ai[p];
      if (i == j) has_diag = true;
      if (i >= j) continue;  // only strictly-upper entries drive the tree
      // walk from i to the root with path compression
      while (i != -1 && i < j) {
        idx next = ancestor[i];
        ancestor[i] = j;
        if (next == -1) S.etree[i] = j;
        if (next == -1 || next == j) break;
        i = next;
      }
    }
    if (!has_diag) diag_ok = false;
  }
  // Column counts of L via per-column etree reach marking.
  S.Lnz.assign(n, 0);
  std::vector<idx> mark(n, -1);
  for (idx j = 0; j < n; ++j) {
    mark[j] = j;
    for (idx p = Ap[j]; p < Ap[j + 1]; ++p) {
      idx i = Ai[p];
      if (i >= j) continue;
      // follow etree path from i until marked this column
      while (mark[i] != j) {
        mark[i] = j;
        S.Lnz[i] += 1;  // L(j, i) exists
        i = S.etree[i];
        if (i == -1) break;
      }
    }
  }
  S.Lp.assign(n + 1, 0);
  for (idx j = 0; j < n; ++j) S.Lp[j + 1] = S.Lp[j] + S.Lnz[j];
  S.total_nz = S.Lp[n];
  return diag_ok;
}

bool ldl_numeric(idx n, const idx* Ap, const idx* Ai, const double* Ax,
                 const LDLSymbolic& S, LDLFactor& F) {
  F.Li.assign(S.total_nz, 0);
  F.Lx.assign(S.total_nz, 0.0);
  F.D.assign(n, 0.0);
  F.Dinv.assign(n, 0.0);
  F.num_pos = 0;

  std::vector<double> y(n, 0.0);      // dense accumulator for row j of L
  std::vector<idx> pattern(n, 0);     // reach stack
  std::vector<idx> mark(n, -1);
  std::vector<idx> next_in_col(n, 0); // fill position per column of L
  for (idx j = 0; j < n; ++j) next_in_col[j] = S.Lp[j];

  for (idx j = 0; j < n; ++j) {
    // --- compute the nonzero pattern of row j of L (reach in etree) ---
    idx top = n;
    double djj = 0.0;
    mark[j] = j;  // stop every etree walk at the diagonal node
    for (idx p = Ap[j]; p < Ap[j + 1]; ++p) {
      idx i = Ai[p];
      if (i > j) return false;  // input must be upper triangular
      if (i == j) {
        djj = Ax[p];
        continue;
      }
      y[i] += Ax[p];  // scatter A(i, j)
      idx len = 0;
      while (mark[i] != j) {
        pattern[len++] = i;
        mark[i] = j;
        i = S.etree[i];
        if (i == -1) break;
      }
      // reverse the discovered path onto the stack (topological order)
      while (len > 0) pattern[--top] = pattern[--len];
    }

    // --- sparse triangular solve: L(0:j,0:j) y = A(0:j,j), then form row ---
    for (idx t = top; t < n; ++t) {
      idx k = pattern[t];
      double yk = y[k];
      y[k] = 0.0;
      // apply column k of L to the accumulator
      for (idx p = S.Lp[k]; p < next_in_col[k]; ++p) {
        y[F.Li[p]] -= F.Lx[p] * yk;
      }
      double l_jk = yk * F.Dinv[k];
      djj -= l_jk * yk;
      // append L(j, k) to column k
      F.Li[next_in_col[k]] = j;
      F.Lx[next_in_col[k]] = l_jk;
      next_in_col[k] += 1;
    }

    if (djj == 0.0) return false;
    F.D[j] = djj;
    F.Dinv[j] = 1.0 / djj;
    if (djj > 0) F.num_pos += 1;
  }
  return true;
}

void ldl_solve(const LDLSymbolic& S, const LDLFactor& F, double* x) {
  const idx n = S.n;
  // forward: L y = b
  for (idx j = 0; j < n; ++j) {
    double xj = x[j];
    for (idx p = S.Lp[j]; p < S.Lp[j + 1]; ++p) {
      x[F.Li[p]] -= F.Lx[p] * xj;
    }
  }
  // diagonal
  for (idx j = 0; j < n; ++j) x[j] *= F.Dinv[j];
  // backward: L' x = y
  for (idx j = n - 1; j >= 0; --j) {
    double xj = x[j];
    for (idx p = S.Lp[j]; p < S.Lp[j + 1]; ++p) {
      xj -= F.Lx[p] * x[F.Li[p]];
    }
    x[j] = xj;
  }
}

}  // namespace tpuqp
