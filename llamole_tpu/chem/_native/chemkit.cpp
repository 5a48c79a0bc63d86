// chemkit — native chemistry kernels for llamole_tpu's host-side runtime.
//
// The reference outsources these inner loops to RDKit C++ (SURVEY.md §2 L0);
// llamole_tpu's chemistry is first-party, so the hot paths get a first-party
// native implementation too:
//
//   ck_wl_ranks      canonical atom ranking (Weisfeiler-Lehman refinement
//                    with deterministic tie-breaking) — the inner loop of
//                    SMILES canonicalization, called for every molecule the
//                    planner touches
//   ck_morgan_bits   Morgan/ECFP environment hashing for the cost model
//
// Both functions are exact ports of the Python reference implementations in
// chem/smiles.py (canonical_ranks) and chem/fingerprint.py — outputs are
// bit-identical, so the ctypes wrapper can dispatch freely.
//
// C ABI over flat arrays; no global state; thread-safe.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Weisfeiler-Lehman canonical ranks
//
// invariants : n_atoms x inv_width row-major int64 initial invariant tuples
// edges      : m x 3 (a1, a2, order2x) int32
// out_ranks  : n_atoms int32
// ---------------------------------------------------------------------------

static void ranks_from_keys(const std::vector<std::vector<int64_t>>& keys,
                            std::vector<int32_t>& ranks) {
    std::vector<const std::vector<int64_t>*> uniq;
    uniq.reserve(keys.size());
    for (const auto& k : keys) uniq.push_back(&k);
    std::sort(uniq.begin(), uniq.end(),
              [](const auto* a, const auto* b) { return *a < *b; });
    uniq.erase(std::unique(uniq.begin(), uniq.end(),
                           [](const auto* a, const auto* b) { return *a == *b; }),
               uniq.end());
    std::map<std::vector<int64_t>, int32_t> lookup;
    for (size_t r = 0; r < uniq.size(); ++r) lookup[*uniq[r]] = (int32_t)r;
    for (size_t i = 0; i < keys.size(); ++i) ranks[i] = lookup[keys[i]];
}

static void refine(int32_t n,
                   const std::vector<std::vector<std::pair<int32_t, int32_t>>>& adj,
                   std::vector<int32_t>& ranks) {
    std::vector<std::vector<int64_t>> keys((size_t)n);
    std::vector<int32_t> new_ranks((size_t)n);
    while (true) {
        for (int32_t i = 0; i < n; ++i) {
            std::vector<std::pair<int32_t, int32_t>> nbrs;
            nbrs.reserve(adj[i].size());
            for (const auto& [w, order2] : adj[i])
                nbrs.emplace_back(order2, ranks[w]);
            std::sort(nbrs.begin(), nbrs.end());
            auto& key = keys[i];
            key.clear();
            key.push_back(ranks[i]);
            for (const auto& [o, r] : nbrs) {
                key.push_back(o);
                key.push_back(r);
            }
        }
        ranks_from_keys(keys, new_ranks);
        if (new_ranks == ranks) return;
        ranks.swap(new_ranks);
    }
}

int32_t ck_wl_ranks(int32_t n_atoms, int32_t inv_width,
                    const int64_t* invariants,
                    int32_t n_edges, const int32_t* edges,
                    int32_t* out_ranks) {
    if (n_atoms <= 0) return 0;
    std::vector<std::vector<std::pair<int32_t, int32_t>>> adj((size_t)n_atoms);
    for (int32_t e = 0; e < n_edges; ++e) {
        int32_t a = edges[3 * e], b = edges[3 * e + 1], o = edges[3 * e + 2];
        if (a < 0 || b < 0 || a >= n_atoms || b >= n_atoms) return -1;
        adj[a].emplace_back(b, o);
        adj[b].emplace_back(a, o);
    }
    std::vector<std::vector<int64_t>> keys((size_t)n_atoms);
    for (int32_t i = 0; i < n_atoms; ++i)
        keys[i].assign(invariants + (size_t)i * inv_width,
                       invariants + (size_t)(i + 1) * inv_width);
    std::vector<int32_t> ranks((size_t)n_atoms);
    ranks_from_keys(keys, ranks);
    refine(n_atoms, adj, ranks);

    // tie-breaking: promote the lowest atom index in the smallest tied class
    while (true) {
        std::map<int32_t, int32_t> counts;
        for (auto r : ranks) counts[r]++;
        int32_t target = -1;
        for (const auto& [r, c] : counts)
            if (c > 1) { target = r; break; }
        if (target < 0) break;
        int32_t pick = -1;
        for (int32_t i = 0; i < n_atoms; ++i)
            if (ranks[i] == target) { pick = i; break; }
        std::vector<std::vector<int64_t>> tb((size_t)n_atoms);
        for (int32_t i = 0; i < n_atoms; ++i)
            tb[i] = {ranks[i], i == pick ? 0 : 1};
        ranks_from_keys(tb, ranks);
        refine(n_atoms, adj, ranks);
    }
    std::memcpy(out_ranks, ranks.data(), sizeof(int32_t) * (size_t)n_atoms);
    return 0;
}

// ---------------------------------------------------------------------------
// Morgan fingerprint bits (FNV-chained environment hashing; exact port of
// chem/fingerprint.py _mix + morgan_fingerprint)
// ---------------------------------------------------------------------------

static const uint64_t MASK61 = ((uint64_t)1 << 61) - 1;

static uint64_t mix(const uint64_t* vals, size_t count) {
    uint64_t h = 0xCBF29CE484222325ULL;
    for (size_t i = 0; i < count; ++i) {
        uint64_t v = vals[i] & MASK61;
        do {
            h ^= v & 0xFF;
            h *= 0x100000001B3ULL;
            v >>= 8;
        } while (v != 0);
        h ^= 0xFF;
        h *= 0x100000001B3ULL;
    }
    return h;
}

// invariants: n x 7 int64 (z, charge+16, degree, total_h, bos2x, in_ring,
//             aromatic) — same layout the Python fingerprint builds
// edges:      m x 3 (a1, a2, order2x)
// out_bits:   n_bits bytes (0/1)
int32_t ck_morgan_bits(int32_t n_atoms, const int64_t* invariants,
                       int32_t n_edges, const int32_t* edges,
                       int32_t radius, int32_t n_bits, uint8_t* out_bits) {
    if (n_atoms <= 0 || n_bits <= 0) return -1;
    std::memset(out_bits, 0, (size_t)n_bits);
    std::vector<std::vector<std::pair<int32_t, int32_t>>> adj((size_t)n_atoms);
    for (int32_t e = 0; e < n_edges; ++e) {
        int32_t a = edges[3 * e], b = edges[3 * e + 1], o = edges[3 * e + 2];
        if (a < 0 || b < 0 || a >= n_atoms || b >= n_atoms) return -1;
        adj[a].emplace_back(b, o);
        adj[b].emplace_back(a, o);
    }
    std::vector<uint64_t> ids((size_t)n_atoms);
    for (int32_t i = 0; i < n_atoms; ++i) {
        uint64_t vals[7];
        for (int k = 0; k < 7; ++k)
            vals[k] = (uint64_t)invariants[(size_t)i * 7 + k];
        ids[i] = mix(vals, 7);
    }
    std::vector<uint64_t> bits(ids.begin(), ids.end());
    std::vector<uint64_t> new_ids((size_t)n_atoms);
    for (int32_t r = 0; r < radius; ++r) {
        for (int32_t i = 0; i < n_atoms; ++i) {
            std::vector<std::pair<uint64_t, uint64_t>> env;
            env.reserve(adj[i].size());
            for (const auto& [w, o] : adj[i])
                env.emplace_back((uint64_t)o, ids[w]);
            std::sort(env.begin(), env.end());
            std::vector<uint64_t> flat;
            flat.reserve(1 + 2 * env.size());
            flat.push_back(ids[i]);
            for (const auto& [o, nid] : env) {
                flat.push_back(o);
                flat.push_back(nid);
            }
            new_ids[i] = mix(flat.data(), flat.size());
        }
        ids = new_ids;
        bits.insert(bits.end(), ids.begin(), ids.end());
    }
    for (uint64_t b : bits) out_bits[b % (uint64_t)n_bits] = 1;
    return 0;
}

}  // extern "C"
