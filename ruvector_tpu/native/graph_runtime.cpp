// Native graph runtime: the host-side components of the TPU framework.
//
// TPU-native equivalent of the reference's Rust host machinery:
//   - halo-plan construction  (shard router / EdgeCutMinimizer,
//     ruvector-graph/src/distributed/shard.rs:209-433)
//   - BFS locality reorder    (HyperbatchIterator::reorder_bfs,
//     ruvector-gnn/src/cold_tier.rs:307)
//   - fixed-fanout sampling   (GraphSAGELayer::sample_neighbors,
//     ruvector-postgres/src/gnn/graphsage.rs:93-101)
//   - Dinic s-t min-cut gate  (DinicSolver, ruvector-attn-mincut/src/mincut.rs)
//   - CSR construction from padded adjacency
//
// The device compute path is JAX/XLA/Pallas; this library feeds it. Exposed
// as a C ABI consumed via ctypes (ruvector_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>
#include <algorithm>
#include <random>

extern "C" {

// ---------------------------------------------------------------------------
// BFS reorder: order[new_pos] = old_id
// ---------------------------------------------------------------------------
void bfs_reorder(const int32_t* nbr, const float* mask, int64_t n, int64_t m,
                 int64_t* order_out) {
    std::vector<uint8_t> visited(n, 0);
    int64_t pos = 0;
    std::vector<int64_t> queue;
    queue.reserve(1024);
    for (int64_t start = 0; start < n; ++start) {
        if (visited[start]) continue;
        size_t head = 0;
        queue.clear();
        queue.push_back(start);
        visited[start] = 1;
        while (head < queue.size()) {
            int64_t u = queue[head++];
            order_out[pos++] = u;
            const int32_t* row = nbr + u * m;
            const float* mrow = mask + u * m;
            for (int64_t j = 0; j < m; ++j) {
                if (mrow[j] > 0) {
                    int32_t v = row[j];
                    if (!visited[v]) { visited[v] = 1; queue.push_back(v); }
                }
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Label propagation clustering order: community detection on the adjacency,
// then order nodes by community. Minimizes edge cut for block partitioning
// far better than BFS (which interleaves clusters through bridge edges) —
// the EdgeCutMinimizer role (ruvector-graph/src/distributed/shard.rs:209).
// order_out[new_pos] = old_id.
// ---------------------------------------------------------------------------
void label_propagation_order(const int32_t* nbr, const float* mask,
                             int64_t n, int64_t m, int64_t iters,
                             int64_t* order_out) {
    std::vector<int32_t> label(n);
    for (int64_t i = 0; i < n; ++i) label[i] = (int32_t)i;
    std::vector<std::pair<float, int32_t>> votes;  // scratch
    // deterministic sweeps: ascending node order, ties -> smallest label
    for (int64_t it = 0; it < iters; ++it) {
        bool changed = false;
        std::vector<float> weight_of;  // label -> weight via small map
        for (int64_t i = 0; i < n; ++i) {
            // count weighted label frequencies among neighbors
            votes.clear();
            const int32_t* row = nbr + i * m;
            const float* mrow = mask + i * m;
            for (int64_t j = 0; j < m; ++j) {
                if (mrow[j] <= 0) continue;
                votes.push_back({1.0f, label[row[j]]});
            }
            if (votes.empty()) continue;
            // aggregate by label (votes are tiny: <= m entries)
            int32_t best_label = label[i];
            float best_w = 0.0f;
            for (size_t a = 0; a < votes.size(); ++a) {
                if (votes[a].first <= 0) continue;
                float w = votes[a].first;
                for (size_t b = a + 1; b < votes.size(); ++b) {
                    if (votes[b].second == votes[a].second) {
                        w += votes[b].first;
                        votes[b].first = 0;
                    }
                }
                if (w > best_w ||
                    (w == best_w && votes[a].second < best_label)) {
                    best_w = w;
                    best_label = votes[a].second;
                }
            }
            if (best_label != label[i]) {
                label[i] = best_label;
                changed = true;
            }
        }
        if (!changed) break;
    }
    // stable sort node ids by (label, id)
    std::vector<int64_t> ids(n);
    for (int64_t i = 0; i < n; ++i) ids[i] = i;
    std::stable_sort(ids.begin(), ids.end(), [&](int64_t a, int64_t b) {
        if (label[a] != label[b]) return label[a] < label[b];
        return a < b;
    });
    for (int64_t i = 0; i < n; ++i) order_out[i] = ids[i];
}

// ---------------------------------------------------------------------------
// Halo plan sizing pass: returns required halo (max rows any (src,dst) pair
// exchanges). nbr is the padded [n_pad, m] adjacency (n_pad = S*block).
// ---------------------------------------------------------------------------
int64_t halo_plan_size(const int32_t* nbr, const float* mask,
                       int64_t n_pad, int64_t m, int64_t n_shards,
                       int64_t block) {
    // bitmap per (src, dst): block bits
    std::vector<std::vector<uint8_t>> need(
        n_shards * n_shards, std::vector<uint8_t>(block, 0));
    for (int64_t g = 0; g < n_pad; ++g) {
        int64_t dst = g / block;
        const int32_t* row = nbr + g * m;
        const float* mrow = mask + g * m;
        for (int64_t j = 0; j < m; ++j) {
            if (mrow[j] <= 0) continue;
            int64_t t = row[j];
            int64_t src = t / block;
            if (src != dst) need[src * n_shards + dst][t % block] = 1;
        }
    }
    int64_t halo = 1;
    for (auto& bm : need) {
        int64_t c = 0;
        for (uint8_t b : bm) c += b;
        if (c > halo) halo = c;
    }
    return halo;
}

// ---------------------------------------------------------------------------
// Halo plan fill pass. Outputs (pre-allocated by caller):
//   send_idx  [S, S, halo] int32
//   send_mask [S, S, halo] float
//   local_nbr [S, block, m] int32
// ---------------------------------------------------------------------------
void halo_plan_fill(const int32_t* nbr, const float* mask,
                    int64_t n_pad, int64_t m, int64_t n_shards,
                    int64_t block, int64_t halo,
                    int32_t* send_idx, float* send_mask, int32_t* local_nbr) {
    const int32_t NONE = -1;
    // pos[src*S+dst][local_row] = halo position (or -1)
    std::vector<std::vector<int32_t>> pos(
        n_shards * n_shards, std::vector<int32_t>(block, NONE));
    std::vector<int64_t> counts(n_shards * n_shards, 0);

    // mark needed rows
    std::vector<std::vector<uint8_t>> need(
        n_shards * n_shards, std::vector<uint8_t>(block, 0));
    for (int64_t g = 0; g < n_pad; ++g) {
        int64_t dst = g / block;
        const int32_t* row = nbr + g * m;
        const float* mrow = mask + g * m;
        for (int64_t j = 0; j < m; ++j) {
            if (mrow[j] <= 0) continue;
            int64_t t = row[j];
            int64_t src = t / block;
            if (src != dst) need[src * n_shards + dst][t % block] = 1;
        }
    }
    // assign positions in sorted local-row order (deterministic)
    std::memset(send_idx, 0, sizeof(int32_t) * n_shards * n_shards * halo);
    std::memset(send_mask, 0, sizeof(float) * n_shards * n_shards * halo);
    for (int64_t src = 0; src < n_shards; ++src) {
        for (int64_t dst = 0; dst < n_shards; ++dst) {
            auto& bm = need[src * n_shards + dst];
            auto& pm = pos[src * n_shards + dst];
            int64_t c = 0;
            for (int64_t l = 0; l < block; ++l) {
                if (bm[l]) {
                    pm[l] = (int32_t)c;
                    send_idx[(src * n_shards + dst) * halo + c] = (int32_t)l;
                    send_mask[(src * n_shards + dst) * halo + c] = 1.0f;
                    ++c;
                }
            }
            counts[src * n_shards + dst] = c;
        }
    }
    // remap neighbors to local addressing
    for (int64_t g = 0; g < n_pad; ++g) {
        int64_t dst = g / block;
        int64_t i = g % block;
        const int32_t* row = nbr + g * m;
        const float* mrow = mask + g * m;
        int32_t* out = local_nbr + (dst * block + i) * m;
        for (int64_t j = 0; j < m; ++j) {
            if (mrow[j] <= 0) { out[j] = 0; continue; }
            int64_t t = row[j];
            int64_t src = t / block;
            if (src == dst) {
                out[j] = (int32_t)(t - src * block);
            } else {
                int32_t p = pos[src * n_shards + dst][t % block];
                out[j] = (int32_t)(block + src * halo + p);
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Fixed-fanout uniform sampling without replacement (partial Fisher-Yates).
// ---------------------------------------------------------------------------
void sample_fanout(const int32_t* nbr, const float* mask, int64_t n, int64_t m,
                   int64_t fanout, uint64_t seed,
                   int32_t* out_idx, float* out_mask) {
    std::mt19937_64 rng(seed);
    std::vector<int32_t> pool(m);
    for (int64_t i = 0; i < n; ++i) {
        const int32_t* row = nbr + i * m;
        const float* mrow = mask + i * m;
        int64_t deg = 0;
        for (int64_t j = 0; j < m; ++j) if (mrow[j] > 0) pool[deg++] = row[j];
        int32_t* oi = out_idx + i * fanout;
        float* om = out_mask + i * fanout;
        std::memset(oi, 0, sizeof(int32_t) * fanout);
        std::memset(om, 0, sizeof(float) * fanout);
        if (deg <= fanout) {
            for (int64_t j = 0; j < deg; ++j) { oi[j] = pool[j]; om[j] = 1.0f; }
        } else {
            for (int64_t j = 0; j < fanout; ++j) {
                std::uniform_int_distribution<int64_t> d(j, deg - 1);
                int64_t pick = d(rng);
                std::swap(pool[j], pool[pick]);
                oi[j] = pool[j];
                om[j] = 1.0f;
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Dinic max-flow min-cut gate over a dense logit matrix (mincut.rs:163-221).
// keep_out: [seq*seq] uint8. Returns cut_cost (applied or 0).
// ---------------------------------------------------------------------------
struct FlowEdge { int32_t to; int32_t rev; float cap; };

static bool dinic_bfs(std::vector<std::vector<FlowEdge>>& adj,
                      std::vector<int32_t>& level, int32_t s) {
    std::fill(level.begin(), level.end(), -1);
    level[s] = 0;
    std::queue<int32_t> q;
    q.push(s);
    while (!q.empty()) {
        int32_t u = q.front(); q.pop();
        for (auto& e : adj[u]) {
            if (e.cap > 0 && level[e.to] < 0) {
                level[e.to] = level[u] + 1;
                q.push(e.to);
            }
        }
    }
    return true;
}

static float dinic_dfs(std::vector<std::vector<FlowEdge>>& adj,
                       std::vector<int32_t>& level, std::vector<size_t>& it,
                       int32_t u, int32_t t, float f) {
    if (u == t) return f;
    for (; it[u] < adj[u].size(); ++it[u]) {
        FlowEdge& e = adj[u][it[u]];
        if (e.cap > 0 && level[u] < level[e.to]) {
            float d = dinic_dfs(adj, level, it, e.to, t, std::min(f, e.cap));
            if (d > 0) {
                e.cap -= d;
                adj[e.to][e.rev].cap += d;
                return d;
            }
        }
    }
    return 0.0f;
}

float dinic_mincut_gate(const float* logits, int64_t seq, float lambda,
                        float eps, uint8_t* keep_out) {
    int64_t n2 = seq * seq;
    // clamp + keep = positive logits
    std::vector<float> clamped(n2);
    int64_t n_pos = 0;
    double sum_w = 0;
    for (int64_t i = 0; i < n2; ++i) {
        float v = logits[i] > eps ? logits[i] : 0.0f;
        clamped[i] = v;
        keep_out[i] = v > 0 ? 1 : 0;
        if (v > 0) { ++n_pos; sum_w += v; }
    }
    if (n_pos == 0 || seq < 2) {
        std::memset(keep_out, 0, n2);
        return 0.0f;
    }
    float mean_w = (float)(sum_w / n_pos);
    float threshold = lambda * mean_w;

    std::vector<std::vector<FlowEdge>> adj(seq);
    for (int64_t i = 0; i < seq; ++i) {
        for (int64_t j = 0; j < seq; ++j) {
            float w = clamped[i * seq + j];
            if (w > 0) {
                int32_t rf = (int32_t)adj[j].size();
                int32_t rt = (int32_t)adj[i].size();
                adj[i].push_back({(int32_t)j, rf, w});
                adj[j].push_back({(int32_t)i, rt, 0.0f});
            }
        }
    }
    std::vector<int32_t> level(seq);
    std::vector<size_t> it(seq);
    int32_t s = 0, t = (int32_t)(seq - 1);
    float flow = 0;
    const float INF = 3.0e38f / 2;
    while (true) {
        dinic_bfs(adj, level, s);
        if (level[t] < 0) break;
        std::fill(it.begin(), it.end(), 0);
        while (true) {
            float f = dinic_dfs(adj, level, it, s, t, INF);
            if (f <= 0) break;
            flow += f;
        }
    }
    float applied_cost = 0.0f;
    if (flow <= threshold) {
        dinic_bfs(adj, level, s);  // residual reachability
        for (int64_t i = 0; i < seq; ++i) {
            for (int64_t j = 0; j < seq; ++j) {
                float w = clamped[i * seq + j];
                if (w > 0 && level[i] >= 0 && level[j] < 0) {
                    keep_out[i * seq + j] = 0;
                    applied_cost += w;
                }
            }
        }
    }
    return applied_cost;
}

// ---------------------------------------------------------------------------
// CSR from padded adjacency. Two-pass: count then fill. row_ptr [n+1].
// ---------------------------------------------------------------------------
int64_t csr_count(const float* mask, int64_t n, int64_t m) {
    int64_t e = 0;
    for (int64_t i = 0; i < n * m; ++i) if (mask[i] > 0) ++e;
    return e;
}

void csr_fill(const int32_t* nbr, const float* mask, const float* weight,
              int64_t n, int64_t m,
              int32_t* row_ptr, int32_t* col_idx, float* values) {
    int64_t e = 0;
    row_ptr[0] = 0;
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t j = 0; j < m; ++j) {
            if (mask[i * m + j] > 0) {
                col_idx[e] = nbr[i * m + j];
                values[e] = weight[i * m + j];
                ++e;
            }
        }
        row_ptr[i + 1] = (int32_t)e;
    }
}

}  // extern "C"
