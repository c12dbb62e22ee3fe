// Native host-side mesh topology kernels.
//
// TPU-native replacement for the DOLFINx C++ topology/dofmap machinery the
// reference depends on (SURVEY.md section 2b: "DOLFINx mesh + topology +
// dofmap ... integer connectivity arrays built host-side once, shipped to
// device").  The Python fallback uses numpy's sort-based np.unique; these
// hash-based kernels build edge/facet enumerations in O(n) and are the hot
// path of mesh construction for production-size meshes.
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 in the
// image).  All arrays are int32, row-major.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// 64-bit key for a sorted pair of vertex ids
static inline uint64_t pair_key(int32_t a, int32_t b) {
    if (a > b) { int32_t t = a; a = b; b = t; }
    return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
           static_cast<uint32_t>(b);
}

struct FacetKey {
    int32_t v[4];  // sorted, padded with -1
    bool operator==(const FacetKey& o) const {
        return std::memcmp(v, o.v, sizeof(v)) == 0;
    }
};

struct FacetKeyHash {
    size_t operator()(const FacetKey& k) const {
        // FNV-1a over the 16 bytes
        uint64_t h = 1469598103934665603ULL;
        const unsigned char* p = reinterpret_cast<const unsigned char*>(k.v);
        for (size_t i = 0; i < sizeof(k.v); ++i) {
            h ^= p[i];
            h *= 1099511628211ULL;
        }
        return static_cast<size_t>(h);
    }
};

static inline void sort_small(int32_t* v, int n) {
    for (int i = 1; i < n; ++i) {
        int32_t x = v[i];
        int j = i - 1;
        while (j >= 0 && v[j] > x) { v[j + 1] = v[j]; --j; }
        v[j + 1] = x;
    }
}

}  // namespace

extern "C" {

// Enumerate unique edges of a cell array.
//
// cells:        (n_cells * nv) vertex ids
// local_edges:  (n_le * 2) local vertex index pairs
// out_cell_edges: (n_cells * n_le) -> global edge index per local edge
// out_edges:      capacity >= n_cells * n_le * 2; receives unique (a, b)
//                 pairs (a < b) in first-seen order
// returns the number of unique edges
int32_t build_edges(const int32_t* cells, int64_t n_cells, int32_t nv,
                    const int32_t* local_edges, int32_t n_le,
                    int32_t* out_cell_edges, int32_t* out_edges) {
    std::unordered_map<uint64_t, int32_t> seen;
    seen.reserve(static_cast<size_t>(n_cells) * n_le);
    int32_t next = 0;
    for (int64_t c = 0; c < n_cells; ++c) {
        const int32_t* cv = cells + c * nv;
        for (int32_t e = 0; e < n_le; ++e) {
            int32_t a = cv[local_edges[2 * e]];
            int32_t b = cv[local_edges[2 * e + 1]];
            uint64_t key = pair_key(a, b);
            auto it = seen.find(key);
            int32_t idx;
            if (it == seen.end()) {
                idx = next++;
                seen.emplace(key, idx);
                int32_t lo = a < b ? a : b, hi = a < b ? b : a;
                out_edges[2 * idx] = lo;
                out_edges[2 * idx + 1] = hi;
            } else {
                idx = it->second;
            }
            out_cell_edges[c * n_le + e] = idx;
        }
    }
    return next;
}

// Enumerate unique facets (up to 4 vertices each) with cell incidences.
//
// local_facets: (n_lf * nvf) local vertex indices
// out_cell_facets:   (n_cells * n_lf)
// out_facet_vertices:(cap * nvf)  UNSORTED order of first incident cell
// out_facet_cells:   (cap * 2)   incident cells, -1 padded
// out_facet_local:   (cap * 2)   local facet index within each cell
// returns number of unique facets
int32_t build_facets(const int32_t* cells, int64_t n_cells, int32_t nv,
                     const int32_t* local_facets, int32_t n_lf, int32_t nvf,
                     int32_t* out_cell_facets, int32_t* out_facet_vertices,
                     int32_t* out_facet_cells, int32_t* out_facet_local) {
    std::unordered_map<FacetKey, int32_t, FacetKeyHash> seen;
    seen.reserve(static_cast<size_t>(n_cells) * n_lf);
    int32_t next = 0;
    for (int64_t c = 0; c < n_cells; ++c) {
        const int32_t* cv = cells + c * nv;
        for (int32_t f = 0; f < n_lf; ++f) {
            FacetKey key;
            int32_t raw[4] = {-1, -1, -1, -1};
            for (int32_t k = 0; k < nvf; ++k) {
                raw[k] = cv[local_facets[f * nvf + k]];
                key.v[k] = raw[k];
            }
            for (int32_t k = nvf; k < 4; ++k) key.v[k] = -1;
            sort_small(key.v, nvf);
            auto it = seen.find(key);
            int32_t idx;
            if (it == seen.end()) {
                idx = next++;
                seen.emplace(key, idx);
                for (int32_t k = 0; k < nvf; ++k)
                    out_facet_vertices[idx * nvf + k] = raw[k];
                out_facet_cells[2 * idx] = static_cast<int32_t>(c);
                out_facet_cells[2 * idx + 1] = -1;
                out_facet_local[2 * idx] = f;
                out_facet_local[2 * idx + 1] = -1;
            } else {
                idx = it->second;
                out_facet_cells[2 * idx + 1] = static_cast<int32_t>(c);
                out_facet_local[2 * idx + 1] = f;
            }
            out_cell_facets[c * n_lf + f] = idx;
        }
    }
    return next;
}

// Recursive coordinate bisection: partition cells into n_parts spatially
// compact parts (for cell-shard locality over the device mesh).
// midpoints: (n_cells * gdim) cell midpoint coordinates (float64)
// out_part:  (n_cells) part id per cell
void partition_rcb(const double* midpoints, int64_t n_cells, int32_t gdim,
                   int32_t n_parts, int32_t* out_part) {
    struct Item { int64_t cell; };
    std::vector<int64_t> idx(n_cells);
    for (int64_t i = 0; i < n_cells; ++i) idx[i] = i;

    struct Range { int64_t lo, hi; int32_t part_lo, part_hi; };
    std::vector<Range> stack;
    stack.push_back({0, n_cells, 0, n_parts});
    while (!stack.empty()) {
        Range r = stack.back();
        stack.pop_back();
        int32_t nparts = r.part_hi - r.part_lo;
        if (nparts <= 1) {
            for (int64_t i = r.lo; i < r.hi; ++i) out_part[idx[i]] = r.part_lo;
            continue;
        }
        // widest axis
        int32_t axis = 0;
        double best = -1.0;
        for (int32_t d = 0; d < gdim; ++d) {
            double mn = 1e300, mx = -1e300;
            for (int64_t i = r.lo; i < r.hi; ++i) {
                double v = midpoints[idx[i] * gdim + d];
                if (v < mn) mn = v;
                if (v > mx) mx = v;
            }
            if (mx - mn > best) { best = mx - mn; axis = d; }
        }
        int32_t left_parts = nparts / 2;
        int64_t nleft = (r.hi - r.lo) * left_parts / nparts;
        std::nth_element(
            idx.begin() + r.lo, idx.begin() + r.lo + nleft, idx.begin() + r.hi,
            [&](int64_t a, int64_t b) {
                return midpoints[a * gdim + axis] < midpoints[b * gdim + axis];
            });
        stack.push_back({r.lo, r.lo + nleft, r.part_lo, r.part_lo + left_parts});
        stack.push_back({r.lo + nleft, r.hi, r.part_lo + left_parts, r.part_hi});
    }
}

}  // extern "C"
