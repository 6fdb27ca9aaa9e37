// Native runtime components for the TPU recommender engine.
//
// The reference is pure Python; its heavy host-side work (scipy dok-dict
// adjacency fills at `/root/reference/src/models/lightgcn.py:77-103`, pandas
// interaction parsing, python k-core loops in the preprocessing notebooks)
// is replaced here by a small C++ library exposed through ctypes
// (native/__init__.py).  Everything is plain C ABI; buffers are allocated by
// the caller (numpy) so no ownership crosses the boundary.
//
// Components:
//  - parse_inter_tsv: .inter TSV -> (user, item, label) int64 columns
//  - kcore_filter:    iterative k-core filtering over interaction edges
//  - build_csr:       row-sorted CSR (indptr + column-sorted indices)
//  - sym_norm_values: D^-1/2 A D^-1/2 edge values for bipartite u-i edges
//  - cooccurrence_topk: user-user co-interaction top-k neighbor lists

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <numeric>
#include <vector>
#include <cmath>

extern "C" {

// Count data rows (excluding header) of a TSV file. Returns -1 on error.
int64_t inter_count_rows(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    int64_t rows = -1;  // header line does not count
    int c;
    bool any = false;
    while ((c = fgetc(f)) != EOF) {
        any = true;
        if (c == '\n') rows++;
    }
    // file not ending in newline still has a final row
    fseek(f, -1, SEEK_END);
    if (any && fgetc(f) != '\n') rows++;
    fclose(f);
    return rows < 0 ? 0 : rows;
}

// Parse userID/itemID/x_label columns of a .inter TSV (header line skipped).
// col indices are 0-based positions within the tab-separated header.
// Returns number of rows parsed, or -1 on error.
int64_t inter_parse(
    const char* path,
    int32_t user_col, int32_t item_col, int32_t label_col,
    int64_t* users, int64_t* items, int64_t* labels, int64_t capacity) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    char buf[1 << 16];
    // skip header
    if (!fgets(buf, sizeof(buf), f)) { fclose(f); return -1; }
    int64_t n = 0;
    while (fgets(buf, sizeof(buf), f)) {
        if (n >= capacity) break;
        int32_t col = 0;
        char* p = buf;
        int64_t u = -1, i = -1, lab = 0;
        while (p && *p && *p != '\n') {
            char* end;
            long long v = strtoll(p, &end, 10);
            if (col == user_col) u = v;
            else if (col == item_col) i = v;
            else if (col == label_col) lab = v;
            p = strchr(p, '\t');
            if (p) p++;
            col++;
            (void)end;
        }
        if (u >= 0 && i >= 0) {
            users[n] = u; items[n] = i; labels[n] = lab; n++;
        }
    }
    fclose(f);
    return n;
}

// Iterative k-core filter: keep[j] = 1 iff edge j survives. Returns the
// number of iterations performed.
int32_t kcore_filter(
    const int64_t* users, const int64_t* items, int64_t n_edges,
    int64_t n_users, int64_t n_items, int32_t k, uint8_t* keep) {
    std::vector<int64_t> u_cnt(n_users, 0), i_cnt(n_items, 0);
    std::fill(keep, keep + n_edges, 1);
    int32_t iters = 0;
    bool changed = true;
    while (changed) {
        changed = false;
        iters++;
        std::fill(u_cnt.begin(), u_cnt.end(), 0);
        std::fill(i_cnt.begin(), i_cnt.end(), 0);
        for (int64_t e = 0; e < n_edges; e++) {
            if (keep[e]) { u_cnt[users[e]]++; i_cnt[items[e]]++; }
        }
        for (int64_t e = 0; e < n_edges; e++) {
            if (keep[e] && (u_cnt[users[e]] < k || i_cnt[items[e]] < k)) {
                keep[e] = 0;
                changed = true;
            }
        }
    }
    return iters;
}

// Row-sorted CSR with per-row sorted, deduplicated columns.
// indptr must have n_rows+1 slots; cols_out must have n_edges slots.
// Returns the deduplicated nnz.
int64_t build_csr(
    const int64_t* rows, const int64_t* cols, int64_t n_edges,
    int64_t n_rows, int64_t* indptr, int64_t* cols_out) {
    std::vector<int64_t> counts(n_rows + 1, 0);
    for (int64_t e = 0; e < n_edges; e++) counts[rows[e] + 1]++;
    std::partial_sum(counts.begin(), counts.end(), counts.begin());
    std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
    std::vector<int64_t> tmp(n_edges);
    for (int64_t e = 0; e < n_edges; e++) tmp[cursor[rows[e]]++] = cols[e];
    int64_t out = 0;
    indptr[0] = 0;
    for (int64_t r = 0; r < n_rows; r++) {
        int64_t s = counts[r], e = counts[r + 1];
        std::sort(tmp.begin() + s, tmp.begin() + e);
        int64_t prev = -1;
        for (int64_t j = s; j < e; j++) {
            if (tmp[j] != prev) { cols_out[out++] = tmp[j]; prev = tmp[j]; }
        }
        indptr[r + 1] = out;
    }
    return out;
}

// Symmetric-normalized bipartite edge values: 1/sqrt((deg_u+eps)(deg_i+eps)).
void sym_norm_values(
    const int64_t* users, const int64_t* items, int64_t n_edges,
    int64_t n_users, int64_t n_items, double eps, float* values) {
    std::vector<double> du(n_users, 0.0), di(n_items, 0.0);
    for (int64_t e = 0; e < n_edges; e++) { du[users[e]] += 1; di[items[e]] += 1; }
    for (int64_t e = 0; e < n_edges; e++) {
        values[e] = (float)(1.0 / std::sqrt((du[users[e]] + eps) * (di[items[e]] + eps)));
    }
}

// User-user co-interaction top-k: for each user, the k most co-interacting
// other users with counts. idx_out/w_out are [n_users*k]; empty slots get
// idx -1 / weight 0. Requires the CSR of user->items (from build_csr) plus
// the CSR of item->users.
void cooccurrence_topk(
    const int64_t* u_indptr, const int64_t* u_cols,   // user -> items
    const int64_t* i_indptr, const int64_t* i_cols,   // item -> users
    int64_t n_users, int32_t k,
    int32_t* idx_out, float* w_out) {
    std::vector<int64_t> count(n_users, 0);
    std::vector<int64_t> touched;
    touched.reserve(1024);
    for (int64_t u = 0; u < n_users; u++) {
        touched.clear();
        for (int64_t ii = u_indptr[u]; ii < u_indptr[u + 1]; ii++) {
            int64_t item = u_cols[ii];
            for (int64_t jj = i_indptr[item]; jj < i_indptr[item + 1]; jj++) {
                int64_t v = i_cols[jj];
                if (v == u) continue;
                if (count[v] == 0) touched.push_back(v);
                count[v]++;
            }
        }
        // partial top-k by count
        std::sort(touched.begin(), touched.end(), [&](int64_t a, int64_t b) {
            if (count[a] != count[b]) return count[a] > count[b];
            return a < b;
        });
        int64_t m = std::min<int64_t>(k, (int64_t)touched.size());
        for (int64_t j = 0; j < m; j++) {
            idx_out[u * k + j] = (int32_t)touched[j];
            w_out[u * k + j] = (float)count[touched[j]];
        }
        for (int64_t j = m; j < k; j++) {
            idx_out[u * k + j] = -1;
            w_out[u * k + j] = 0.0f;
        }
        for (int64_t v : touched) count[v] = 0;
    }
}

}  // extern "C"
