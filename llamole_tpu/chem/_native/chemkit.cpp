// chemkit — native chemistry kernels for llamole_tpu's host-side runtime.
//
// The reference outsources these inner loops to RDKit C++ (SURVEY.md §2 L0);
// llamole_tpu's chemistry is first-party, so the hot paths get a first-party
// native implementation too:
//
//   ck_wl_ranks         canonical atom ranking (Weisfeiler-Lehman refinement
//                       with deterministic tie-breaking) — the inner loop of
//                       SMILES canonicalization, called for every molecule
//                       the planner touches
//   ck_morgan_bits      Morgan/ECFP environment hashing for the cost model
//   ck_match_component  SMARTS subgraph-isomorphism matcher — the inner loop
//                       of retro-template application (the planner applies
//                       ~50 templates per expansion; reference outsources
//                       this to RDKit's substructure matcher via
//                       rdchiralRunText, graph_predictor/model.py:193)
//
// All functions are exact ports of the Python reference implementations in
// chem/smiles.py (canonical_ranks), chem/fingerprint.py and chem/smarts.py
// (match_component) — outputs are bit-identical (including enumeration
// order), so the ctypes wrapper can dispatch freely.
//
// C ABI over flat arrays; no global state; thread-safe.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <array>
#include <map>
#include <set>
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

// ---------------------------------------------------------------------------
// SMARTS component matching (exact port of chem/smarts.py match_component:
// same traversal order, same candidate order, same enumeration order, same
// max_matches cutoff — the Python path stays the reference implementation)
//
// Molecule side (serialized by chem/smarts.py _native_mol):
//   ctx        : n_atoms x 7 int32 [z, charge, aromatic, degree, total_h,
//                in_ring, ring_count]
//   ring_masks : n_atoms uint64 — bit s set when an SSSR ring of size s<64
//                passes through the atom (mols with a ring >=64 never get
//                serialized; Python path handles them)
//   adjacency  : CSR in bond-insertion order (matches the Python dict
//                insertion order): adj_off[n_atoms+1] into adj_nbr /
//                adj_order / adj_arom / adj_ring
//
// Query side (serialized by chem/smarts.py _native_query):
//   prog   : predicate program stream, per query atom:
//              n_groups, { n_alts, { n_terms, { neg, kind, val }* }* }*
//            AND over groups / OR over alternatives / AND over terms —
//            QueryAtom.matches semantics
//   qbonds : n_qbonds x 3 (a, b, bond_kind) in source order; duplicate
//            (a,b) pairs overwrite the kind but keep the first position,
//            mirroring QueryMol.adjacency()'s dict assignment
// ---------------------------------------------------------------------------

namespace {

// primitive kinds — keep in sync with smarts.py _PRIM_CODE
enum PrimKind {
    PK_ANY = 0, PK_ELEM = 1, PK_ELEM_AROM = 2, PK_ELEM_ALIPH = 3,
    PK_AROMATIC = 4, PK_ALIPHATIC = 5, PK_HCOUNT = 6, PK_DEGREE = 7,
    PK_CONNECTIVITY = 8, PK_RING = 9, PK_RING_COUNT = 10,
    PK_RINGSIZE = 11, PK_CHARGE = 12,
};

// bond kinds — keep in sync with smarts.py _BOND_CODE
enum BondKind {
    BK_DEFAULT = 0, BK_SINGLE = 1, BK_DOUBLE = 2, BK_TRIPLE = 3,
    BK_AROMATIC = 4, BK_ANY = 5, BK_RING = 6,
};

struct MolView {
    int32_t n;
    const int32_t* ctx;        // n x 7
    const uint64_t* ring_masks;
    const int32_t* off;
    const int32_t* nbr;
    const int32_t* order;
    const int32_t* arom;
    const int32_t* ring;
};

struct Term { int32_t neg, kind, val; };
struct QAtomProg {
    // groups[g] = list of alternatives; alternative = range into terms
    std::vector<std::vector<std::pair<int32_t, int32_t>>> groups;
    std::vector<Term> terms;
};

static bool eval_primitive(const Term& t, const MolView& m, int32_t mi) {
    const int32_t* c = m.ctx + (size_t)mi * 7;
    const int32_t z = c[0], charge = c[1], aromatic = c[2], degree = c[3],
                  total_h = c[4], in_ring = c[5], ring_count = c[6];
    bool v;
    switch (t.kind) {
        case PK_ANY:          v = true; break;
        case PK_ELEM:         v = z == t.val; break;
        case PK_ELEM_AROM:    v = z == t.val && aromatic; break;
        case PK_ELEM_ALIPH:   v = z == t.val && !aromatic; break;
        case PK_AROMATIC:     v = aromatic != 0; break;
        case PK_ALIPHATIC:    v = aromatic == 0; break;
        case PK_HCOUNT:       v = total_h == t.val; break;
        case PK_DEGREE:       v = degree == t.val; break;
        case PK_CONNECTIVITY: v = degree + total_h == t.val; break;
        case PK_RING:         v = in_ring != 0; break;
        case PK_RING_COUNT:   v = ring_count == t.val; break;
        case PK_RINGSIZE:
            v = t.val == 0 ? in_ring != 0
                           : (t.val < 64 &&
                              ((m.ring_masks[mi] >> t.val) & 1) != 0);
            break;
        case PK_CHARGE:       v = charge == t.val; break;
        default:              return false;  // unknown => never matches
    }
    return t.neg ? !v : v;
}

static bool atom_matches(const QAtomProg& q, const MolView& m, int32_t mi) {
    for (const auto& group : q.groups) {
        bool ok = false;
        for (const auto& [t0, t1] : group) {
            bool all = true;
            for (int32_t t = t0; t < t1; ++t)
                if (!eval_primitive(q.terms[(size_t)t], m, mi)) { all = false; break; }
            if (all) { ok = true; break; }
        }
        if (!ok) return false;
    }
    return true;
}

static bool bond_matches(int32_t kind, int32_t order, int32_t aromatic,
                         int32_t in_ring) {
    switch (kind) {
        case BK_ANY:      return true;
        case BK_DEFAULT:  return aromatic || order == 1;
        case BK_SINGLE:   return order == 1 && !aromatic;
        case BK_DOUBLE:   return order == 2 && !aromatic;
        case BK_TRIPLE:   return order == 3;
        case BK_AROMATIC: return aromatic != 0;
        case BK_RING:     return in_ring != 0;
        default:          return false;
    }
}

struct MatchState {
    const MolView& m;
    const std::vector<QAtomProg>& qatoms;
    const std::vector<std::vector<std::pair<int32_t, int32_t>>>& qadj;
    const std::vector<int32_t>& order;
    int32_t nq, max_matches;
    std::vector<int32_t> assignment;  // query idx -> mol idx, -1 unset
    std::vector<uint8_t> used;        // mol idx used
    int32_t* out;
    int32_t count = 0;

    MatchState(const MolView& m_, const std::vector<QAtomProg>& qa,
               const std::vector<std::vector<std::pair<int32_t, int32_t>>>& adj,
               const std::vector<int32_t>& ord, int32_t nq_, int32_t mm,
               int32_t* out_)
        : m(m_), qatoms(qa), qadj(adj), order(ord), nq(nq_),
          max_matches(mm), assignment((size_t)nq_, -1),
          used((size_t)m_.n, 0), out(out_) {}

    bool bond_ok(int32_t qi, int32_t mi) const {
        for (const auto& [qn, qb] : qadj[(size_t)qi]) {
            int32_t mn = assignment[(size_t)qn];
            if (mn < 0) continue;
            // find mol bond mi-mn in mi's adjacency
            int32_t found = -1;
            for (int32_t e = m.off[mi]; e < m.off[mi + 1]; ++e)
                if (m.nbr[e] == mn) { found = e; break; }
            if (found < 0) return false;
            if (!bond_matches(qb, m.order[found], m.arom[found],
                              m.ring[found]))
                return false;
        }
        return true;
    }

    bool backtrack(int32_t pos) {
        if (count >= max_matches) return true;
        if (pos == (int32_t)order.size()) {
            std::memcpy(out + (size_t)count * nq, assignment.data(),
                        sizeof(int32_t) * (size_t)nq);
            ++count;
            return count >= max_matches;
        }
        int32_t qi = order[(size_t)pos];
        // anchor: first already-assigned query neighbor (adjacency order)
        int32_t anchor = -1;
        for (const auto& [qn, qb] : qadj[(size_t)qi]) {
            (void)qb;
            if (assignment[(size_t)qn] >= 0) { anchor = qn; break; }
        }
        if (anchor >= 0) {
            int32_t ma = assignment[(size_t)anchor];
            for (int32_t e = m.off[ma]; e < m.off[ma + 1]; ++e)
                if (try_candidate(qi, m.nbr[e], pos)) return true;
        } else {
            for (int32_t mi = 0; mi < m.n; ++mi)
                if (try_candidate(qi, mi, pos)) return true;
        }
        return false;
    }

    bool try_candidate(int32_t qi, int32_t mi, int32_t pos) {
        if (used[(size_t)mi]) return false;
        if (!atom_matches(qatoms[(size_t)qi], m, mi)) return false;
        assignment[(size_t)qi] = mi;
        if (bond_ok(qi, mi)) {
            used[(size_t)mi] = 1;
            if (backtrack(pos + 1)) {
                used[(size_t)mi] = 0;
                assignment[(size_t)qi] = -1;
                return true;
            }
            used[(size_t)mi] = 0;
        }
        assignment[(size_t)qi] = -1;
        return false;
    }
};

}  // namespace

int32_t ck_match_component(
    int32_t n_atoms, const int32_t* ctx, const uint64_t* ring_masks,
    const int32_t* adj_off, const int32_t* adj_nbr, const int32_t* adj_order,
    const int32_t* adj_arom, const int32_t* adj_ring,
    int32_t nq, const int32_t* prog, int32_t prog_len,
    int32_t n_qbonds, const int32_t* qbonds,
    int32_t max_matches, int32_t* out, int32_t* out_count) {
    *out_count = 0;
    if (nq <= 0 || n_atoms <= 0 || max_matches <= 0) return 0;

    // parse the predicate program
    std::vector<QAtomProg> qatoms((size_t)nq);
    int32_t p = 0;
    for (int32_t q = 0; q < nq; ++q) {
        if (p >= prog_len) return -1;
        int32_t ngroups = prog[p++];
        auto& qa = qatoms[(size_t)q];
        qa.groups.resize((size_t)ngroups);
        for (int32_t g = 0; g < ngroups; ++g) {
            if (p >= prog_len) return -1;
            int32_t nalts = prog[p++];
            for (int32_t a = 0; a < nalts; ++a) {
                if (p >= prog_len) return -1;
                int32_t nterms = prog[p++];
                int32_t t0 = (int32_t)qa.terms.size();
                if (p + 3 * nterms > prog_len) return -1;
                for (int32_t t = 0; t < nterms; ++t) {
                    qa.terms.push_back({prog[p], prog[p + 1], prog[p + 2]});
                    p += 3;
                }
                qa.groups[(size_t)g].emplace_back(t0, t0 + nterms);
            }
        }
    }
    if (p != prog_len) return -1;

    // query adjacency: insertion order, duplicate pairs overwrite the kind
    // in place (QueryMol.adjacency() dict semantics)
    std::vector<std::vector<std::pair<int32_t, int32_t>>> qadj((size_t)nq);
    for (int32_t e = 0; e < n_qbonds; ++e) {
        int32_t a = qbonds[3 * e], b = qbonds[3 * e + 1], k = qbonds[3 * e + 2];
        if (a < 0 || b < 0 || a >= nq || b >= nq) return -1;
        auto upsert = [k](std::vector<std::pair<int32_t, int32_t>>& lst,
                          int32_t other) {
            for (auto& [o, kk] : lst)
                if (o == other) { kk = k; return; }
            lst.emplace_back(other, k);
        };
        upsert(qadj[(size_t)a], b);
        upsert(qadj[(size_t)b], a);
    }

    // traversal order: BFS from query atom 0 (smarts.py match_component)
    std::vector<int32_t> order;
    order.reserve((size_t)nq);
    std::vector<uint8_t> seen((size_t)nq, 0);
    order.push_back(0);
    seen[0] = 1;
    for (size_t head = 0; head < order.size(); ++head) {
        int32_t v = order[head];
        for (const auto& [w, kk] : qadj[(size_t)v]) {
            (void)kk;
            if (!seen[(size_t)w]) {
                seen[(size_t)w] = 1;
                order.push_back(w);
            }
        }
    }
    for (int32_t i = 0; i < nq; ++i)
        if (!seen[(size_t)i]) order.push_back(i);

    MolView m{n_atoms, ctx, ring_masks, adj_off, adj_nbr,
              adj_order, adj_arom, adj_ring};
    MatchState st(m, qatoms, qadj, order, nq, max_matches, out);
    st.backtrack(0);
    *out_count = st.count;
    return 0;
}

// ---------------------------------------------------------------------------
// Exact SSSR (minimum cycle basis) — port of Mol.smallest_rings
// (chem/mol.py): shortest cycle through every non-bridge bond as
// candidates, stable smallest-first selection under GF(2) edge-mask
// independence, Horton vertex-rooted top-up for the rank-deficient
// case. Enumeration orders follow the Python implementation exactly
// (CSR adjacency is serialized in `_adj` insertion order), so the
// output ring lists are identical element-for-element.
//
// Inputs: bonds = n_bonds x 2 (a1, a2); CSR adj with parallel bond-
// index array; target = m - n + c precomputed by the caller (> 0).
// Outputs: rings concatenated into out_atoms with out_off[k]..[k+1]
// delimiting ring k. Returns 0 on success, 1 when a cap would be
// exceeded (caller falls back to Python), -1 on malformed input.
// ---------------------------------------------------------------------------

namespace {

struct Bitset {
    std::vector<uint64_t> w;
    explicit Bitset(size_t words) : w(words, 0) {}
    void set(int32_t b) { w[(size_t)b >> 6] |= (uint64_t)1 << (b & 63); }
    void operator^=(const Bitset& o) {
        for (size_t i = 0; i < w.size(); ++i) w[i] ^= o.w[i];
    }
    int32_t leading_bit() const {  // -1 when empty
        for (size_t i = w.size(); i-- > 0;)
            if (w[i]) return (int32_t)(i * 64 + 63 - __builtin_clzll(w[i]));
        return -1;
    }
};

}  // namespace

int32_t ck_sssr(
    int32_t n_atoms, int32_t n_bonds, const int32_t* bonds,
    const int32_t* adj_off, const int32_t* adj_nbr, const int32_t* adj_bidx,
    int32_t target,
    int32_t* out_atoms, int32_t out_cap,
    int32_t* out_off, int32_t max_rings, int32_t* out_n_rings) {
    *out_n_rings = 0;
    if (n_atoms <= 0 || n_bonds <= 0 || target <= 0) return -1;

    // -- bridges (Tarjan lowlink; the bridge set is graph-unique) ---------
    std::vector<uint8_t> is_bridge((size_t)n_bonds, 0);
    {
        std::vector<int32_t> disc((size_t)n_atoms, -1), low((size_t)n_atoms, 0);
        int32_t timer = 0;
        // explicit stack: (vertex, parent-edge, next CSR cursor)
        std::vector<std::array<int32_t, 3>> st;
        for (int32_t root = 0; root < n_atoms; ++root) {
            if (disc[(size_t)root] != -1) continue;
            disc[(size_t)root] = low[(size_t)root] = timer++;
            st.push_back({root, -1, adj_off[root]});
            while (!st.empty()) {
                auto& top = st.back();
                int32_t v = top[0], pe = top[1];
                bool advanced = false;
                while (top[2] < adj_off[v + 1]) {
                    int32_t e = top[2]++;
                    int32_t w = adj_nbr[e], be = adj_bidx[e];
                    if (be == pe) continue;
                    if (disc[(size_t)w] == -1) {
                        disc[(size_t)w] = low[(size_t)w] = timer++;
                        st.push_back({w, be, adj_off[w]});
                        advanced = true;
                        break;
                    }
                    low[(size_t)v] = std::min(low[(size_t)v], disc[(size_t)w]);
                }
                if (!advanced && top[2] >= adj_off[v + 1]) {
                    st.pop_back();
                    if (!st.empty()) {
                        int32_t u = st.back()[0];
                        low[(size_t)u] = std::min(low[(size_t)u], low[(size_t)v]);
                        if (low[(size_t)v] > disc[(size_t)u])
                            is_bridge[(size_t)pe] = 1;
                    }
                }
            }
        }
    }

    // -- candidate rings: shortest cycle through each non-bridge bond -----
    std::vector<std::vector<int32_t>> cands;
    std::set<std::vector<int32_t>> seen;
    std::vector<int32_t> parent((size_t)n_atoms);
    std::vector<int32_t> queue;
    queue.reserve((size_t)n_atoms);
    for (int32_t bi = 0; bi < n_bonds; ++bi) {
        if (is_bridge[(size_t)bi]) continue;
        int32_t src = bonds[2 * bi], dst = bonds[2 * bi + 1];
        std::fill(parent.begin(), parent.end(), -2);
        parent[(size_t)src] = -1;
        queue.clear();
        queue.push_back(src);
        for (size_t head = 0; head < queue.size(); ++head) {
            int32_t v = queue[head];
            if (v == dst) break;
            for (int32_t e = adj_off[v]; e < adj_off[v + 1]; ++e) {
                int32_t w = adj_nbr[e];
                if (adj_bidx[e] == bi || parent[(size_t)w] != -2) continue;
                parent[(size_t)w] = v;
                queue.push_back(w);
            }
        }
        if (parent[(size_t)dst] == -2) continue;
        std::vector<int32_t> ring;
        for (int32_t x = dst; x != -1; x = parent[(size_t)x])
            ring.push_back(x);
        std::vector<int32_t> key(ring);
        std::sort(key.begin(), key.end());
        if (seen.insert(std::move(key)).second)
            cands.push_back(std::move(ring));
    }
    std::stable_sort(cands.begin(), cands.end(),
                     [](const std::vector<int32_t>& a,
                        const std::vector<int32_t>& b) {
                         return a.size() < b.size();
                     });

    // -- GF(2) independence selection -------------------------------------
    const size_t words = ((size_t)n_bonds + 63) / 64;
    std::vector<Bitset> basis((size_t)n_bonds, Bitset(0));  // by leading bit
    std::vector<uint8_t> has_basis((size_t)n_bonds, 0);

    auto edge_mask = [&](const std::vector<int32_t>& ring) {
        Bitset m(words);
        for (size_t j = 0; j < ring.size(); ++j) {
            int32_t v = ring[j], w = ring[(j + 1) % ring.size()];
            for (int32_t e = adj_off[v]; e < adj_off[v + 1]; ++e)
                if (adj_nbr[e] == w) { m.set(adj_bidx[e]); break; }
        }
        return m;
    };
    auto independent_add = [&](Bitset mask) {
        for (;;) {
            int32_t lb = mask.leading_bit();
            if (lb < 0) return false;
            if (has_basis[(size_t)lb]) {
                mask ^= basis[(size_t)lb];
            } else {
                basis[(size_t)lb] = std::move(mask);
                has_basis[(size_t)lb] = 1;
                return true;
            }
        }
    };

    std::vector<const std::vector<int32_t>*> chosen;
    for (const auto& ring : cands) {
        if ((int32_t)chosen.size() == target) break;
        if (independent_add(edge_mask(ring))) chosen.push_back(&ring);
    }

    // -- Horton top-up (rank-deficient case) ------------------------------
    std::vector<std::vector<int32_t>> horton;
    if ((int32_t)chosen.size() < target) {
        std::vector<int32_t> stamp((size_t)n_atoms, -1);
        int32_t stamp_id = 0;
        for (int32_t root = 0; root < n_atoms; ++root) {
            std::fill(parent.begin(), parent.end(), -2);
            parent[(size_t)root] = -1;
            queue.clear();
            queue.push_back(root);
            for (size_t head = 0; head < queue.size(); ++head) {
                int32_t v = queue[head];
                for (int32_t e = adj_off[v]; e < adj_off[v + 1]; ++e) {
                    int32_t w = adj_nbr[e];
                    if (parent[(size_t)w] != -2) continue;
                    parent[(size_t)w] = v;
                    queue.push_back(w);
                }
            }
            for (int32_t bi = 0; bi < n_bonds; ++bi) {
                int32_t x = bonds[2 * bi], y = bonds[2 * bi + 1];
                if (parent[(size_t)x] == -2 || parent[(size_t)y] == -2)
                    continue;
                if (parent[(size_t)y] == x || parent[(size_t)x] == y)
                    continue;  // tree edge
                // root-paths excluding the root must be disjoint
                std::vector<int32_t> px, py;
                for (int32_t v = x; v != -1; v = parent[(size_t)v])
                    px.push_back(v);  // x .. root
                for (int32_t v = y; v != -1; v = parent[(size_t)v])
                    py.push_back(v);
                ++stamp_id;
                bool overlap = false;
                for (size_t j = 0; j + 1 < px.size(); ++j)
                    stamp[(size_t)px[j]] = stamp_id;
                for (size_t j = 0; j + 1 < py.size(); ++j)
                    if (stamp[(size_t)py[j]] == stamp_id) { overlap = true; break; }
                if (overlap) continue;
                std::vector<int32_t> ring(px.begin(), px.end() - 1);
                ring.push_back(root);
                for (size_t j = py.size() - 1; j-- > 0;)
                    ring.push_back(py[j]);
                if (ring.size() < 3) continue;
                std::vector<int32_t> key(ring);
                std::sort(key.begin(), key.end());
                if (seen.insert(std::move(key)).second)
                    horton.push_back(std::move(ring));
            }
        }
        std::stable_sort(horton.begin(), horton.end(),
                         [](const std::vector<int32_t>& a,
                            const std::vector<int32_t>& b) {
                             return a.size() < b.size();
                         });
        for (const auto& ring : horton) {
            if ((int32_t)chosen.size() == target) break;
            if (independent_add(edge_mask(ring))) chosen.push_back(&ring);
        }
    }

    // -- emit --------------------------------------------------------------
    if ((int32_t)chosen.size() > max_rings) return 1;
    int32_t pos = 0;
    out_off[0] = 0;
    for (size_t k = 0; k < chosen.size(); ++k) {
        const auto& ring = *chosen[k];
        if (pos + (int32_t)ring.size() > out_cap) return 1;
        std::memcpy(out_atoms + pos, ring.data(),
                    ring.size() * sizeof(int32_t));
        pos += (int32_t)ring.size();
        out_off[k + 1] = pos;
    }
    *out_n_rings = (int32_t)chosen.size();
    return 0;
}

}  // extern "C"
