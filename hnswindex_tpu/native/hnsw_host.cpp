// hnsw_host.cpp — native host-side HNSW engine with a C ABI.
//
// TPU-native frameworks still need a native host runtime where the
// reference has one: the reference's entire core is AOT-compiled to a
// shared library with a 15-function cdecl ABI
// (bindings/HNSWIndex.Native/HNSWIndexExports.cs:27-273).  This file is
// that layer for the TPU build: a self-contained C++17 HNSW engine used
// for (a) CPU serving of small indexes without a TPU attached, (b) an
// independent oracle for parity-testing the TPU wave-construction path,
// and (c) FFI consumers of the reference ABI who want to switch.
//
// It is a from-scratch implementation of the published HNSW algorithm
// (Malkov & Yashunin 2016) — flat slot storage, per-level adjacency,
// exponential level sampling, efConstruction beam insertion with
// relative-neighbor pruning, removal with neighborhood repair — matching
// the reference's observable semantics (metric formulas incl. the
// cosine zero-norm guard, ef = max(min_nn, k), layer-0 degree 2*M,
// staged-parameter create, -1/NaN padding) without porting its code.
//
// Exports: the reference's 15 hnsw_* functions plus hnsw_serialize /
// hnsw_deserialize / hnsw_count (capabilities the reference's C# core has
// but never plumbed through its native ABI — SURVEY.md §5).
//
// Concurrency: batch add/knn/remove fan out over a thread pool; edge
// lists are guarded by per-node mutexes and slot allocation by a global
// mutex, mirroring the reference's contract that same-type batch ops are
// thread-safe (README.md "Concurrency notes").

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <limits>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <unordered_set>
#include <vector>

#if defined(__x86_64__) || defined(_M_X64)
#include <immintrin.h>
#define HNSW_X86 1
#endif

namespace {

// ---------------------------------------------------------------------
// distance kernels (SIMD where available, autovectorized otherwise)
// ---------------------------------------------------------------------

float dot_f32(const float* a, const float* b, int n) {
#if defined(HNSW_X86) && defined(__AVX__)
    __m256 acc = _mm256_setzero_ps();
    int i = 0;
    for (; i + 8 <= n; i += 8) {
#if defined(__FMA__)
        acc = _mm256_fmadd_ps(_mm256_loadu_ps(a + i),
                              _mm256_loadu_ps(b + i), acc);
#else
        acc = _mm256_add_ps(acc, _mm256_mul_ps(_mm256_loadu_ps(a + i),
                                               _mm256_loadu_ps(b + i)));
#endif
    }
    alignas(32) float buf[8];
    _mm256_store_ps(buf, acc);
    float s = buf[0] + buf[1] + buf[2] + buf[3] + buf[4] + buf[5] + buf[6] +
              buf[7];
    for (; i < n; ++i) s += a[i] * b[i];
    return s;
#else
    float s = 0.f;
    for (int i = 0; i < n; ++i) s += a[i] * b[i];
    return s;
#endif
}

float sq_l2(const float* a, const float* b, int n) {
#if defined(HNSW_X86) && defined(__AVX__)
    __m256 acc = _mm256_setzero_ps();
    int i = 0;
    for (; i + 8 <= n; i += 8) {
        __m256 d = _mm256_sub_ps(_mm256_loadu_ps(a + i),
                                 _mm256_loadu_ps(b + i));
#if defined(__FMA__)
        acc = _mm256_fmadd_ps(d, d, acc);
#else
        acc = _mm256_add_ps(acc, _mm256_mul_ps(d, d));
#endif
    }
    alignas(32) float buf[8];
    _mm256_store_ps(buf, acc);
    float s = buf[0] + buf[1] + buf[2] + buf[3] + buf[4] + buf[5] + buf[6] +
              buf[7];
    for (; i < n; ++i) {
        float d = a[i] - b[i];
        s += d * d;
    }
    return s;
#else
    float s = 0.f;
    for (int i = 0; i < n; ++i) {
        float d = a[i] - b[i];
        s += d * d;
    }
    return s;
#endif
}

enum class Metric { SqEuclid, Cosine, UCosine };

float metric_dist(Metric m, const float* a, const float* b, int n) {
    switch (m) {
        case Metric::SqEuclid:
            return sq_l2(a, b, n);
        case Metric::Cosine: {
            float d = dot_f32(a, b, n);
            float na = std::sqrt(dot_f32(a, a, n));
            float nb = std::sqrt(dot_f32(b, b, n));
            float den = na * nb;
            if (den <= 0.f) return 1.f;  // zero-norm guard
            return 1.f - d / den;
        }
        case Metric::UCosine:
            return 1.f - dot_f32(a, b, n);
    }
    return 0.f;
}

// ---------------------------------------------------------------------
// engine
// ---------------------------------------------------------------------

struct Params {
    int max_edges = 16;
    double dist_rate = 1.0 / std::log(16.0);
    int min_nn = 5;
    int max_candidates = 100;
    int remove_max_candidates = 100;
    int collection_size = 65536;
    int random_seed = 31337;
    bool allow_removals = true;
};

struct Cand {
    float d;
    int id;
};
struct CloserFirst {
    bool operator()(const Cand& a, const Cand& b) const { return a.d > b.d; }
};
struct FartherFirst {
    bool operator()(const Cand& a, const Cand& b) const { return a.d < b.d; }
};

class HostIndex {
  public:
    HostIndex(Metric metric, const Params& p, int dim = -1)
        : dim_(dim), metric_(metric), p_(p),
          rng_(p.random_seed < 0 ? std::random_device{}()
                                 : (unsigned)p.random_seed) {
        capacity_ = std::max(2, p.collection_size);
        if (dim_ > 0) items_.resize((size_t)capacity_ * dim_);
        levels_.resize(capacity_, -1);
        removed_.resize(capacity_, 0);
        out_.resize(capacity_);
    }

    int dim() const { return dim_; }
    int count() const { return count_.load(); }

    // bind dimensionality on first use (the reference ABI passes dim per
    // call rather than at create, HNSWIndexExports.cs:75)
    bool bind_dim(int dim) {
        std::lock_guard<std::mutex> g(slot_mu_);
        if (dim_ < 0) {
            dim_ = dim;
            items_.resize((size_t)capacity_ * dim_);
            return true;
        }
        return dim_ == dim;
    }

    int max_degree(int layer) const {
        return layer == 0 ? 2 * p_.max_edges : p_.max_edges;
    }

    // ---- insertion ---------------------------------------------------

    int add_one(const float* v) {
        int level = sample_level();
        int slot = alloc_slot();
        std::memcpy(&items_[(size_t)slot * dim_], v,
                    sizeof(float) * dim_);
        levels_[slot] = level;
        removed_[slot] = 0;
        out_[slot].assign(level + 1, {});

        int ep = entry_.load();
        if (ep < 0) {
            std::lock_guard<std::mutex> g(entry_mu_);
            if (entry_.load() < 0) {
                entry_.store(slot);
                count_.fetch_add(1);
                return slot;
            }
            ep = entry_.load();
        }
        connect(slot, level);
        count_.fetch_add(1);
        {
            std::lock_guard<std::mutex> g(entry_mu_);
            if (levels_[slot] > levels_[entry_.load()]) entry_.store(slot);
        }
        return slot;
    }

    void add_batch(const float* vs, int n, int* out_ids) {
        ensure_capacity(length_ + n);  // growth is not reader-safe
        parallel_for(n, [&](int i) {
            out_ids[i] = add_one(vs + (size_t)i * dim_);
        });
    }

    void ensure_capacity(int needed) {
        std::lock_guard<std::mutex> g(slot_mu_);
        while (capacity_ < needed) grow();
    }

    // ---- search ------------------------------------------------------

    void knn(const float* q, int k, int* ids, float* dists) const {
        int ef = std::max(p_.min_nn, k);
        std::vector<Cand> res = search_base(q, ef);
        std::sort(res.begin(), res.end(),
                  [](const Cand& a, const Cand& b) { return a.d < b.d; });
        for (int j = 0; j < k; ++j) {
            if (j < (int)res.size()) {
                ids[j] = res[j].id;
                dists[j] = res[j].d;
            } else {
                ids[j] = -1;
                dists[j] = std::numeric_limits<float>::quiet_NaN();
            }
        }
    }

    void knn_batch(const float* qs, int n, int k, int* ids,
                   float* dists) const {
        parallel_for(n, [&](int i) {
            knn(qs + (size_t)i * dim_, k, ids + (size_t)i * k,
                dists + (size_t)i * k);
        });
    }

    std::vector<Cand> range(const float* q, float radius) const {
        std::vector<Cand> out;
        int ep = entry_.load();
        if (ep < 0) return out;
        ep = descend(q, ep, 0);
        // BFS over the in-range subgraph (entry expanded unconditionally)
        std::unordered_set<int> visited{ep};
        std::priority_queue<Cand, std::vector<Cand>, CloserFirst> frontier;
        float d0 = dist_to(q, ep);
        frontier.push({d0, ep});
        if (d0 <= radius && !removed_[ep]) out.push_back({d0, ep});
        while (!frontier.empty()) {
            Cand c = frontier.top();
            frontier.pop();
            for (int nb : out_[c.id][0]) {
                if (!visited.insert(nb).second) continue;
                float d = dist_to(q, nb);
                if (d <= radius) {
                    frontier.push({d, nb});
                    if (!removed_[nb]) out.push_back({d, nb});
                }
            }
        }
        std::sort(out.begin(), out.end(),
                  [](const Cand& a, const Cand& b) { return a.d < b.d; });
        return out;
    }

    // ---- removal -----------------------------------------------------

    void remove_one(int id) {
        if (id < 0 || id >= capacity_ || levels_[id] < 0 || removed_[id])
            return;
        removed_[id] = 1;
        if (entry_.load() == id) replace_entry(id);
        for (int layer = levels_[id]; layer >= 0; --layer)
            repair_layer(id, layer);
        for (int layer = 0; layer <= levels_[id]; ++layer)
            out_[id][layer].clear();
        {
            std::lock_guard<std::mutex> g(slot_mu_);
            free_.push_back(id);
        }
        count_.fetch_sub(1);
    }

    void remove_batch(const int* ids, int n) {
        // repair is whole-graph surgery; serialize removals (the engine's
        // contract matches the reference: batch remove is safe, mixing op
        // types is not)
        for (int i = 0; i < n; ++i) remove_one(ids[i]);
    }

    bool allow_removals() const { return p_.allow_removals; }

    // ---- persistence -------------------------------------------------

    bool serialize(const char* path) const {
        FILE* f = std::fopen(path, "wb");
        if (!f) return false;
        auto w32 = [&](int32_t v) { std::fwrite(&v, 4, 1, f); };
        std::fwrite("HNSWHST1", 8, 1, f);
        w32(dim_);
        w32((int32_t)metric_);
        w32(p_.max_edges);
        w32(p_.min_nn);
        w32(p_.max_candidates);
        w32(p_.remove_max_candidates);
        w32(p_.collection_size);
        w32(p_.random_seed);
        w32(p_.allow_removals ? 1 : 0);
        double dr = p_.dist_rate;
        std::fwrite(&dr, 8, 1, f);
        w32(capacity_);
        w32(length_);
        w32(entry_.load());
        w32(count_.load());
        w32((int32_t)free_.size());
        for (int s : free_) w32(s);
        for (int i = 0; i < length_; ++i) {
            w32(levels_[i]);
            w32(removed_[i]);
            if (levels_[i] < 0) continue;
            std::fwrite(&items_[(size_t)i * dim_], 4, dim_, f);
            for (int l = 0; l <= levels_[i]; ++l) {
                w32((int32_t)out_[i][l].size());
                for (int e : out_[i][l]) w32(e);
            }
        }
        std::fclose(f);
        return true;
    }

    static HostIndex* deserialize(const char* path, std::string& err) {
        FILE* f = std::fopen(path, "rb");
        if (!f) {
            err = "cannot open file";
            return nullptr;
        }
        char magic[8];
        if (std::fread(magic, 8, 1, f) != 1 ||
            std::memcmp(magic, "HNSWHST1", 8) != 0) {
            err = "bad magic";
            std::fclose(f);
            return nullptr;
        }
        auto r32 = [&]() {
            int32_t v = 0;
            if (std::fread(&v, 4, 1, f) != 1) throw std::runtime_error("eof");
            return v;
        };
        try {
            int dim = r32();
            Metric m = (Metric)r32();
            Params p;
            p.max_edges = r32();
            p.min_nn = r32();
            p.max_candidates = r32();
            p.remove_max_candidates = r32();
            p.collection_size = r32();
            p.random_seed = r32();
            p.allow_removals = r32() != 0;
            if (std::fread(&p.dist_rate, 8, 1, f) != 1)
                throw std::runtime_error("eof");
            int capacity = r32();
            int length = r32();
            int entry = r32();
            int count = r32();
            p.collection_size = capacity;
            auto* ix = new HostIndex(m, p, dim);
            int nfree = r32();
            ix->free_.resize(nfree);
            for (int i = 0; i < nfree; ++i) ix->free_[i] = r32();
            ix->length_ = length;
            for (int i = 0; i < length; ++i) {
                ix->levels_[i] = r32();
                ix->removed_[i] = (char)r32();
                if (ix->levels_[i] < 0) continue;
                if (std::fread(&ix->items_[(size_t)i * dim], 4, dim, f) !=
                    (size_t)dim)
                    throw std::runtime_error("eof");
                ix->out_[i].assign(ix->levels_[i] + 1, {});
                for (int l = 0; l <= ix->levels_[i]; ++l) {
                    int deg = r32();
                    ix->out_[i][l].resize(deg);
                    for (int e = 0; e < deg; ++e) ix->out_[i][l][e] = r32();
                }
            }
            ix->entry_.store(entry);
            ix->count_.store(count);
            std::fclose(f);
            return ix;
        } catch (const std::exception& e) {
            err = e.what();
            std::fclose(f);
            return nullptr;
        }
    }

  private:
    float dist_to(const float* q, int id) const {
        return metric_dist(metric_, q, &items_[(size_t)id * dim_], dim_);
    }
    float dist_ij(int a, int b) const {
        return metric_dist(metric_, &items_[(size_t)a * dim_],
                           &items_[(size_t)b * dim_], dim_);
    }

    int sample_level() {
        std::lock_guard<std::mutex> g(rng_mu_);
        double u = std::uniform_real_distribution<double>(1e-30, 1.0)(rng_);
        return (int)(-std::log(u) * p_.dist_rate);
    }

    int alloc_slot() {
        std::lock_guard<std::mutex> g(slot_mu_);
        if (p_.allow_removals && !free_.empty()) {
            int s = free_.back();
            free_.pop_back();
            return s;
        }
        if (length_ >= capacity_) grow();
        return length_++;
    }

    void grow() {
        int newcap = capacity_ * 2;
        items_.resize((size_t)newcap * dim_);
        levels_.resize(newcap, -1);
        removed_.resize(newcap, 0);
        out_.resize(newcap);
        capacity_ = newcap;
    }

    // Copy a node's layer edge list under its stripe lock.  Build-path
    // readers must use this: concurrent connect() calls push_back/reassign
    // the vectors under lock_of, so an unlocked range-for can see a
    // reallocated buffer mid-iteration.  (The outer out_[id] layer vector
    // itself is assigned once before the node is published and never
    // resized, so reading its size unlocked is safe.)
    std::vector<int> neighbors_snapshot(int id, int layer) const {
        std::lock_guard<std::mutex> g(lock_of(id));
        if (layer >= (int)out_[id].size()) return {};
        return out_[id][layer];
    }

    // locked=true: snapshot edge lists under per-node locks (insert path,
    // runs concurrently with writers — the reference's SearchLayer).
    // locked=false: lock-free reads (query path, no concurrent writers —
    // the reference's SearchLayerQuery).
    int descend(const float* q, int ep, int to_layer,
                bool locked = false) const {
        int cur = ep;
        float curd = dist_to(q, cur);
        std::vector<int> snap;
        for (int layer = levels_[cur]; layer > to_layer; --layer) {
            bool changed = true;
            while (changed) {
                changed = false;
                if (layer > levels_[cur]) break;
                if (locked) snap = neighbors_snapshot(cur, layer);
                const std::vector<int>& lst =
                    locked ? snap : out_[cur][layer];
                for (int nb : lst) {
                    float d = dist_to(q, nb);
                    if (d < curd) {
                        curd = d;
                        cur = nb;
                        changed = true;
                    }
                }
            }
        }
        return cur;
    }

    std::vector<Cand> search_layer(const float* q, int ep, int layer,
                                   int ef, int exclude = -1,
                                   bool locked = false) const {
        std::priority_queue<Cand, std::vector<Cand>, CloserFirst> frontier;
        std::priority_queue<Cand, std::vector<Cand>, FartherFirst> top;
        std::unordered_set<int> visited{ep};
        float d0 = dist_to(q, ep);
        frontier.push({d0, ep});
        if (ep != exclude) top.push({d0, ep});
        float worst = top.empty() ? std::numeric_limits<float>::max()
                                  : top.top().d;
        std::vector<int> snap;
        while (!frontier.empty()) {
            Cand c = frontier.top();
            if (c.d > worst && (int)top.size() >= ef) break;
            frontier.pop();
            if (layer >= (int)out_[c.id].size()) continue;
            if (locked) snap = neighbors_snapshot(c.id, layer);
            const std::vector<int>& lst = locked ? snap : out_[c.id][layer];
            for (int nb : lst) {
                if (!visited.insert(nb).second) continue;
                float d = dist_to(q, nb);
                if ((int)top.size() < ef || d < worst) {
                    frontier.push({d, nb});
                    if (nb != exclude) top.push({d, nb});
                    if ((int)top.size() > ef) top.pop();
                    if (!top.empty()) worst = top.top().d;
                }
            }
        }
        std::vector<Cand> out;
        out.reserve(top.size());
        while (!top.empty()) {
            out.push_back(top.top());
            top.pop();
        }
        return out;
    }

    std::vector<Cand> search_base(const float* q, int ef) const {
        int ep = entry_.load();
        if (ep < 0) return {};
        ep = descend(q, ep, 0);
        auto res = search_layer(q, ep, 0, ef);
        // drop removed slots from results
        res.erase(std::remove_if(res.begin(), res.end(),
                                 [&](const Cand& c) {
                                     return removed_[c.id] != 0;
                                 }),
                  res.end());
        return res;
    }

    // relative-neighbor pruning (keep-all when below budget)
    std::vector<int> select_neighbors(std::vector<Cand>& cand,
                                      int max_edges) const {
        if ((int)cand.size() < max_edges) {
            std::sort(cand.begin(), cand.end(),
                      [](const Cand& a, const Cand& b) { return a.d < b.d; });
            std::vector<int> all;
            all.reserve(cand.size());
            for (auto& c : cand) all.push_back(c.id);
            return all;
        }
        std::sort(cand.begin(), cand.end(),
                  [](const Cand& a, const Cand& b) { return a.d < b.d; });
        std::vector<int> kept;
        for (auto& c : cand) {
            if ((int)kept.size() >= max_edges) break;
            bool ok = true;
            for (int s : kept) {
                if (dist_ij(s, c.id) < c.d) {
                    ok = false;
                    break;
                }
            }
            if (ok) kept.push_back(c.id);
        }
        return kept;
    }

    void connect(int slot, int level) {
        const float* q = &items_[(size_t)slot * dim_];
        int ep = entry_.load();
        int top = levels_[ep];
        int cur = descend(q, ep, std::min(level, top), /*locked=*/true);
        for (int layer = std::min(level, top); layer >= 0; --layer) {
            auto cand = search_layer(q, cur, layer, p_.max_candidates, -1,
                                     /*locked=*/true);
            auto sel = select_neighbors(cand, p_.max_edges);
            {
                std::lock_guard<std::mutex> g(lock_of(slot));
                out_[slot][layer] = sel;
            }
            for (int nb : sel) {
                std::lock_guard<std::mutex> g(lock_of(nb));
                if (layer >= (int)out_[nb].size()) continue;
                auto& lst = out_[nb][layer];
                lst.push_back(slot);
                if ((int)lst.size() > max_degree(layer)) {
                    std::vector<Cand> cc;
                    cc.reserve(lst.size());
                    for (int e : lst) cc.push_back({dist_ij(nb, e), e});
                    lst = select_neighbors(cc, max_degree(layer));
                }
            }
            if (!sel.empty()) cur = sel[0];
        }
    }

    void replace_entry(int removed_id) {
        std::lock_guard<std::mutex> g(entry_mu_);
        if (entry_.load() != removed_id) return;
        int best = -1, best_level = -1;
        for (int i = 0; i < length_; ++i) {
            if (i == removed_id || levels_[i] < 0 || removed_[i]) continue;
            if (levels_[i] > best_level) {
                best_level = levels_[i];
                best = i;
            }
        }
        entry_.store(best);
    }

    void repair_layer(int id, int layer) {
        // candidates around the removed node, excluding it
        auto scand = search_layer(&items_[(size_t)id * dim_], id, layer,
                                  p_.remove_max_candidates, id);
        scand.erase(std::remove_if(scand.begin(), scand.end(),
                                   [&](const Cand& c) {
                                       return removed_[c.id] != 0;
                                   }),
                    scand.end());
        // affected = in-neighbors at this layer (scan)
        std::vector<int> affected;
        for (int u = 0; u < length_; ++u) {
            if (u == id || levels_[u] < layer || removed_[u]) continue;
            auto& lst = out_[u][layer];
            if (std::find(lst.begin(), lst.end(), id) != lst.end())
                affected.push_back(u);
        }
        for (int u : affected) {
            std::vector<Cand> cand;
            std::unordered_set<int> seen{u, id};
            for (int e : out_[u][layer]) {
                if (e == id || removed_[e]) continue;
                if (!seen.insert(e).second) continue;
                cand.push_back({dist_ij(e, u), e});
            }
            for (auto& c : scand) {
                if (c.id == u || removed_[c.id]) continue;
                if (!seen.insert(c.id).second) continue;
                cand.push_back({dist_ij(c.id, u), c.id});
            }
            auto sel = select_neighbors(cand, max_degree(layer));
            std::lock_guard<std::mutex> g(lock_of(u));
            out_[u][layer] = sel;
        }
    }

    template <class F>
    void parallel_for(int n, F&& f) const {
        int nt = (int)std::min<size_t>(
            std::max(1u, std::thread::hardware_concurrency()), (size_t)n);
        if (nt <= 1) {
            for (int i = 0; i < n; ++i) f(i);
            return;
        }
        std::atomic<int> next{0};
        std::vector<std::thread> ts;
        ts.reserve(nt);
        for (int t = 0; t < nt; ++t)
            ts.emplace_back([&] {
                for (int i; (i = next.fetch_add(1)) < n;) f(i);
            });
        for (auto& t : ts) t.join();
    }

    int dim_;
    Metric metric_;
    Params p_;
    std::mt19937 rng_;
    std::mutex rng_mu_, slot_mu_, entry_mu_;
    int capacity_ = 0;
    int length_ = 0;
    std::vector<float> items_;
    std::vector<int> levels_;
    std::vector<char> removed_;
    std::vector<std::vector<std::vector<int>>> out_;  // [slot][layer][edge]
    // striped node locks: growth-safe (never reallocated)
    static constexpr int kStripes = 4096;
    mutable std::mutex locks_[kStripes];
    std::mutex& lock_of(int slot) const {
        return locks_[slot & (kStripes - 1)];
    }
    std::vector<int> free_;
    std::atomic<int> entry_{-1};
    std::atomic<int> count_{0};
};

// ---------------------------------------------------------------------
// C ABI (matches HNSWIndexExports.cs:27-273 + persistence extras)
// ---------------------------------------------------------------------

thread_local std::string g_last_error;
Params g_staged;  // staged parameters consumed by the next create
std::mutex g_staged_mu;

void set_error(const std::string& s) { g_last_error = s; }

}  // namespace

extern "C" {

void* hnsw_create(const char* metric) {
    try {
        Metric m;
        std::string s = metric ? metric : "";
        if (s == "sq_euclid")
            m = Metric::SqEuclid;
        else if (s == "cosine")
            m = Metric::Cosine;
        else if (s == "ucosine")
            m = Metric::UCosine;
        else {
            set_error("unknown metric: " + s);
            return nullptr;
        }
        Params p;
        {
            std::lock_guard<std::mutex> g(g_staged_mu);
            p = g_staged;
            g_staged = Params{};  // consumed + reset, like the reference
        }
        return new HostIndex(m, p);
    } catch (const std::exception& e) {
        set_error(e.what());
        return nullptr;
    }
}

void hnsw_free(void* h) { delete static_cast<HostIndex*>(h); }

int hnsw_add(void* h, const float* vecs, int count, int dim, int* out_ids) {
    auto* ix = static_cast<HostIndex*>(h);
    if (!ix) {
        set_error("null handle");
        return -1;
    }
    if (!ix->bind_dim(dim)) {
        set_error("dimension mismatch");
        return -1;
    }
    try {
        ix->add_batch(vecs, count, out_ids);
        return count;
    } catch (const std::exception& e) {
        set_error(e.what());
        return -1;
    }
}

int hnsw_remove(void* h, const int* ids, int count) {
    auto* ix = static_cast<HostIndex*>(h);
    if (!ix) {
        set_error("null handle");
        return -1;
    }
    if (!ix->allow_removals()) {
        set_error("Removals are disabled in this index instance.");
        return -1;
    }
    try {
        ix->remove_batch(ids, count);
        return count;
    } catch (const std::exception& e) {
        set_error(e.what());
        return -1;
    }
}

int hnsw_knn_query(void* h, const float* vecs, int count, int dim, int k,
                   int* out_ids, float* out_dists) {
    auto* ix = static_cast<HostIndex*>(h);
    if (!ix) {
        set_error("null handle");
        return -1;
    }
    if (dim != ix->dim()) {
        set_error("dimension mismatch");
        return -1;
    }
    try {
        ix->knn_batch(vecs, count, k, out_ids, out_dists);
        return count;
    } catch (const std::exception& e) {
        set_error(e.what());
        return -1;
    }
}

int hnsw_range_query(void* h, const float* vecs, int count, int dim,
                     float radius, void** out_ids, void** out_dists,
                     int* counts) {
    auto* ix = static_cast<HostIndex*>(h);
    if (!ix) {
        set_error("null handle");
        return -1;
    }
    if (dim != ix->dim()) {
        set_error("dimension mismatch");
        return -1;
    }
    int done = 0;  // slots [0, done) are assigned; later slots may hold
                   // caller garbage (the ABI does not promise zero-init)
    try {
        for (; done < count; ++done) {
            int i = done;
            auto res = ix->range(vecs + (size_t)i * dim, radius);
            int m = (int)res.size();
            counts[i] = m;
            if (m == 0) {
                out_ids[i] = nullptr;
                out_dists[i] = nullptr;
                continue;
            }
            int* ids = (int*)std::malloc(sizeof(int) * m);
            float* ds = (float*)std::malloc(sizeof(float) * m);
            if (!ids || !ds) {
                std::free(ids);
                std::free(ds);
                throw std::bad_alloc();
            }
            for (int j = 0; j < m; ++j) {
                ids[j] = res[j].id;
                ds[j] = res[j].d;
            }
            out_ids[i] = ids;
            out_dists[i] = ds;
        }
        return count;
    } catch (const std::exception& e) {
        set_error(e.what());
        // free only the slots this call actually assigned
        for (int i = 0; i < done; ++i) {
            std::free(out_ids[i]);
            std::free(out_dists[i]);
            out_ids[i] = nullptr;
            out_dists[i] = nullptr;
        }
        return -1;
    }
}

void hnsw_free_results(void** ids, void** dists, int count) {
    for (int i = 0; i < count; ++i) {
        std::free(ids[i]);
        std::free(dists[i]);
    }
}

#define STAGED_SETTER(name, field, type, check)                        \
    int name(type v) {                                                 \
        if (!(check)) {                                                \
            set_error(#name ": invalid value");                        \
            return -1;                                                 \
        }                                                              \
        std::lock_guard<std::mutex> g(g_staged_mu);                    \
        g_staged.field = v;                                            \
        return 0;                                                      \
    }

STAGED_SETTER(hnsw_set_collection_size, collection_size, int, v >= 1)
STAGED_SETTER(hnsw_set_max_edges, max_edges, int, v >= 1)
STAGED_SETTER(hnsw_set_max_candidates, max_candidates, int, v >= 1)
STAGED_SETTER(hnsw_set_remove_max_candidates, remove_max_candidates, int,
              v >= 1)
STAGED_SETTER(hnsw_set_distribution_rate, dist_rate, float, v >= 0)
STAGED_SETTER(hnsw_set_random_seed, random_seed, int, true)
STAGED_SETTER(hnsw_set_min_nn, min_nn, int, v >= 1)
STAGED_SETTER(hnsw_set_allow_removals, allow_removals, bool, true)

int hnsw_get_last_error_utf8(char* buf, int buflen) {
    if (!buf || buflen <= 0) return (int)g_last_error.size();
    int n = (int)std::min((size_t)(buflen - 1), g_last_error.size());
    std::memcpy(buf, g_last_error.data(), n);
    buf[n] = 0;
    return n;
}

// -- extras beyond the reference ABI ----------------------------------

int hnsw_count(void* h) {
    auto* ix = static_cast<HostIndex*>(h);
    return ix ? ix->count() : -1;
}

int hnsw_serialize(void* h, const char* path) {
    auto* ix = static_cast<HostIndex*>(h);
    if (!ix) {
        set_error("null handle");
        return -1;
    }
    if (!ix->serialize(path)) {
        set_error("serialize failed");
        return -1;
    }
    return 0;
}

void* hnsw_deserialize(const char* path) {
    std::string err;
    auto* ix = HostIndex::deserialize(path, err);
    if (!ix) set_error("deserialize failed: " + err);
    return ix;
}

}  // extern "C"
