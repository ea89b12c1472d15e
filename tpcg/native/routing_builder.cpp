// Native preprocessor for the routing-network SpMV (tpcg/ops/routing.py).
//
// Role parity: the reference delegates its sparse-matrix ingestion /
// format conversion to the native BeBOP Sparse Matrix Converter
// (main.c:20-33, CMakeLists.txt:8-13); tpcg's equivalent hot
// preprocessing step is the decomposition of a sparsity pattern into
// matching layers plus the per-layer Benes switch-mask construction.
// The Python implementation (tpcg/ops/routing.py) is the readable
// specification; this C++ translation of the same algorithms runs the
// one-time build ~10x faster on large matrices (m_t1-class: ~45s -> a
// few seconds) and is loaded lazily via ctypes with a silent Python
// fallback (tpcg/native/routing_native.py).
//
// Exposed C API (all int64 unless noted):
//   tpcg_route_build(n, nnz, rows*, cols*, seed) -> handle
//   tpcg_route_m / _layers / _stages(handle)
//   tpcg_route_fill(handle, int8* masks /*L*S*m*/, int32* layer /*nnz*/)
//   tpcg_route_free(handle)
//
// Mask semantics match routing.benes_masks exactly: stage k with stride
// s = strides[k] applies
//   up = roll(t, m-s); dn = roll(t, s)
//   t  = where(mask>0, up, where(mask<0, dn, t))
// i.e. a swapped XOR pair stores +1 at its low position and -1 at the
// high one.  Validated against the Python reference in
// tests/test_routing_native.py (route equivalence on random
// permutations + end-to-end matvec parity).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <vector>
#include <algorithm>
#include <random>

namespace {

struct RouteBuild {
    int64_t n = 0, m = 0, nnz = 0;
    int64_t n_layers = 0, n_stages = 0;
    std::vector<int8_t> masks;   // (L, S, m)
    std::vector<int32_t> layer;  // (nnz)
};

// Benes switch masks for one permutation: out[j] = in[perm[j]].
// masks points at (n_stages, m) int8, already zeroed.
void benes_masks(const std::vector<int64_t>& perm, int64_t m,
                 int8_t* masks, int64_t n_stages) {
    int b = 0;
    while ((int64_t{1} << b) < m) b++;
    // sig: element currently at position i must exit its block at
    // block-local position sig[i] (scatter view).  Globally sig =
    // argsort(perm).
    std::vector<int64_t> sig(m), inv(m);
    for (int64_t j = 0; j < m; j++) sig[perm[j]] = j;
    std::vector<uint8_t> upper(m), visited(m);

    for (int d = 0; d < b - 1; d++) {
        const int64_t mblk = m >> d;
        const int64_t h = mblk >> 1;
        int8_t* in_mask = masks + (int64_t)d * m;
        int8_t* out_mask = masks + (n_stages - 1 - d) * m;
        // inv within blocks: inv[blk + sig[i]] = i
        for (int64_t i = 0; i < m; i++) {
            const int64_t blk = i & ~(mblk - 1);
            inv[blk + sig[i]] = i;
        }
        std::fill(visited.begin(), visited.end(), 0);
        // 2-coloring by cycle walking (classic Benes looping): input
        // pair (i, i^h) splits across subnetworks; output pair
        // (t, t^h) must come from different subnetworks.
        // Each constraint chain alternates input-pair and output-pair
        // edges; following "output partner of my input partner" from an
        // unvisited start, every chain element takes the upper subnet
        // and its input partner the lower one (upper[j] = !upper[ip] =
        // upper[i] along the walk), so the assignment is constant 1 on
        // the chain.
        for (int64_t i0 = 0; i0 < m; i0++) {
            if (visited[i0]) continue;
            int64_t i = i0;
            while (true) {
                const int64_t blk = i & ~(mblk - 1);
                const int64_t ip = blk + ((i - blk) ^ h);  // input partner
                visited[i] = visited[ip] = 1;
                upper[i] = 1;
                upper[ip] = 0;
                // ip's target t = sig[ip]; the output partner t^h is
                // produced by j, which must sit opposite ip.
                const int64_t j = inv[blk + (sig[ip] ^ h)];
                if (visited[j]) break;
                i = j;
            }
        }
        // input-stage masks + apply the swaps to sig
        for (int64_t i = 0; i < m; i++) {
            const int64_t blk = i & ~(mblk - 1);
            const int64_t loc = i - blk;
            if (loc < h && !upper[i]) {
                in_mask[i] = 1;
                in_mask[i + h] = -1;
                std::swap(sig[i], sig[i + h]);
            }
        }
        // output-stage masks: the upper-subnet element exiting at local
        // slot o belongs at o + h iff its target's h-bit is set
        for (int64_t i = 0; i < m; i++) {
            const int64_t blk = i & ~(mblk - 1);
            const int64_t loc = i - blk;
            if (loc < h && (sig[i] & h)) {        // upper subnet = low half
                const int64_t o = blk + (sig[i] & (h - 1));
                out_mask[o] = 1;
                out_mask[o + h] = -1;
            }
        }
        // recurse: local coordinates within the half-blocks
        for (int64_t i = 0; i < m; i++) sig[i] &= (h - 1);
    }
    // middle stage: blocks of 2, stride 1
    int8_t* mid = masks + (int64_t)(b - 1) * m;
    for (int64_t i = 0; i < m; i += 2)
        if (sig[i] == 1) { mid[i] = 1; mid[i + 1] = -1; }
}

}  // namespace

extern "C" {

void* tpcg_route_build(int64_t n, int64_t nnz, const int64_t* rows,
                       const int64_t* cols, uint64_t seed) {
    auto* rb = new RouteBuild();
    rb->n = n;
    rb->nnz = nnz;
    int64_t m = 128;
    while (m < n) m <<= 1;
    rb->m = m;
    int b = 0;
    while ((int64_t{1} << b) < m) b++;
    rb->n_stages = 2 * b - 1;
    rb->layer.assign(nnz, -1);

    // greedy matching layers: shuffle edge order once, then per layer a
    // first-fit sweep over the remaining edges (<=1 per row & column)
    std::vector<int64_t> order(nnz);
    for (int64_t e = 0; e < nnz; e++) order[e] = e;
    std::mt19937_64 rng(seed);
    std::shuffle(order.begin(), order.end(), rng);

    // pass 1: layer decomposition.  Edges bucketed per row (shuffled
    // order within each row); each layer scans every still-alive row
    // for its first edge whose column is free this layer -- O(1-2)
    // probes per row per layer instead of sweeping the whole remaining
    // edge list (which made layering the build bottleneck at ~10M nnz).
    std::vector<std::vector<int64_t>> row_edges(n);
    for (int64_t e : order) row_edges[rows[e]].push_back(e);
    std::vector<int64_t> alive;
    alive.reserve(n);
    for (int64_t r = 0; r < n; r++)
        if (!row_edges[r].empty()) alive.push_back(r);

    std::vector<uint8_t> used_col(n);
    std::vector<int64_t> free_tgt, free_src;
    std::vector<uint8_t> src_used(m);
    std::vector<std::vector<int64_t>> perms;
    while (!alive.empty()) {
        std::fill(used_col.begin(), used_col.end(), 0);
        std::vector<int64_t> perm(m, -1);
        std::fill(src_used.begin(), src_used.end(), 0);
        const int32_t L = (int32_t)perms.size();
        size_t w = 0;
        // rotate which rows pick first each layer -- a fixed order
        // starves the tail rows (they lose every column race), which
        // shows up as ~10-15% extra layers on heavy matrices
        const size_t na = alive.size();
        const size_t roff = na ? (size_t)((uint64_t)(L + 1) * 9973u % na)
                               : 0;
        std::rotate(alive.begin(), alive.begin() + roff, alive.end());
        for (size_t a = 0; a < na; a++) {
            const int64_t r = alive[a];
            auto& es = row_edges[r];
            // rotate the scan start per layer: a fixed probe order
            // makes early edges' columns contended every layer and
            // costs ~10% more layers
            const size_t sz = es.size();
            const size_t start = (size_t)(L + r) % sz;
            for (size_t ii = 0; ii < sz; ii++) {
                const size_t i = (start + ii) % sz;
                const int64_t c = cols[es[i]];
                if (!used_col[c]) {
                    used_col[c] = 1;
                    rb->layer[es[i]] = L;
                    perm[r] = c;
                    src_used[c] = 1;
                    es[i] = es.back();
                    es.pop_back();
                    break;
                }
            }
            if (!es.empty()) alive[w++] = r;
        }
        alive.resize(w);
        // complete to a bijection with the unused sources
        free_tgt.clear();
        free_src.clear();
        for (int64_t i = 0; i < m; i++) {
            if (perm[i] < 0) free_tgt.push_back(i);
            if (!src_used[i]) free_src.push_back(i);
        }
        for (size_t k = 0; k < free_tgt.size(); k++)
            perm[free_tgt[k]] = free_src[k];
        perms.push_back(std::move(perm));
    }
    // pass 2: one mask allocation, per-layer Benes construction
    const auto t1 = std::chrono::steady_clock::now();
    rb->n_layers = (int64_t)perms.size();
    rb->masks.assign((size_t)rb->n_layers * rb->n_stages * m, 0);
    for (int64_t l = 0; l < rb->n_layers; l++)
        benes_masks(perms[l], m,
                    rb->masks.data() + (size_t)l * rb->n_stages * m,
                    rb->n_stages);
    if (std::getenv("TPCG_ROUTE_DEBUG")) {
        const auto t2 = std::chrono::steady_clock::now();
        std::fprintf(stderr, "[route] masks %.2fs (L=%lld)\n",
                     std::chrono::duration<double>(t2 - t1).count(),
                     (long long)rb->n_layers);
    }
    return rb;
}

int64_t tpcg_route_m(void* h) { return ((RouteBuild*)h)->m; }
int64_t tpcg_route_layers(void* h) { return ((RouteBuild*)h)->n_layers; }
int64_t tpcg_route_stages(void* h) { return ((RouteBuild*)h)->n_stages; }

void tpcg_route_fill(void* h, int8_t* masks, int32_t* layer) {
    auto* rb = (RouteBuild*)h;
    std::memcpy(masks, rb->masks.data(), rb->masks.size());
    std::memcpy(layer, rb->layer.data(),
                rb->layer.size() * sizeof(int32_t));
}

void tpcg_route_free(void* h) { delete (RouteBuild*)h; }

}  // extern "C"
