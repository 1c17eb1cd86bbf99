// Native host runtime for rangefilteredann_tpu.
//
// The TPU owns all distance work (JAX/XLA/Pallas); what remains on the host
// per batch is integer planning and result merging, which in the reference is
// C++ under parlay fork-join (src/range_filter_tree.h:234-471 planning,
// :399,542-549 merge). At 10k-query batches a Python per-query loop costs more
// than the device work, so those loops live here, exposed over a C ABI loaded
// with ctypes (no pybind11 in this toolchain).
//
// Semantics mirror rangefilteredann_tpu/models/range_filter_tree.py exactly
// (which in turn documents the reference lines); the Python implementations
// remain as the portable fallback and as the oracle for parity tests.

#include <algorithm>
#include <atomic>
#include <limits>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Run fn(i) for i in [0, n) across hardware threads.
template <typename F>
void parallel_for(int64_t n, F fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::min<int64_t>(n, hw ? hw : 1);
  if (n_threads <= 1) {
    for (int64_t i = 0; i < n; i++) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  const int64_t chunk = std::max<int64_t>(1, n / (n_threads * 8));
  for (int64_t t = 0; t < n_threads; t++) {
    threads.emplace_back([&] {
      for (;;) {
        int64_t lo = next.fetch_add(chunk);
        if (lo >= n) return;
        int64_t hi = std::min(lo + chunk, n);
        for (int64_t i = lo; i < hi; i++) fn(i);
      }
    });
  }
  for (auto& th : threads) th.join();
}

// One row of bucket offsets: offs[row_ptr[r]] .. offs[row_ptr[r+1]-1].
struct Rows {
  const int64_t* offs;
  const int64_t* row_ptr;
  int64_t n_rows;
  const int64_t* row(int64_t r) const { return offs + row_ptr[r]; }
  int64_t len(int64_t r) const { return row_ptr[r + 1] - row_ptr[r]; }
};

// upper_bound(off, index) - 1  (== np.searchsorted(side="right") - 1)
inline int64_t bucket_containing(const int64_t* off, int64_t len, int64_t idx) {
  return (std::upper_bound(off, off + len, idx) - off) - 1;
}

struct Center {
  bool found;
  int64_t row, first_idx, last_idx, cover_lo, cover_hi;
};

// ref: src/range_filter_tree.h:234-295
Center find_largest_ranges(const Rows& rows, int64_t lo, int64_t hi) {
  Center c{false, 0, 0, 0, 0, 0};
  int64_t range_size = hi - lo;
  int64_t first_row = -1;
  for (int64_t r = 0; r < rows.n_rows; r++) {
    const int64_t* off = rows.row(r);
    if (off[1] - off[0] - 1 <= range_size) {
      first_row = r;
      break;
    }
  }
  if (first_row < 0) return c;
  int64_t row = first_row;
  const int64_t* off = rows.row(row);
  int64_t len = rows.len(row);
  int64_t first_idx = lo == 0 ? 0 : bucket_containing(off, len, lo - 1) + 1;
  if (first_idx >= len - 1) return c;
  int64_t start = off[first_idx], end = off[first_idx + 1];
  if (end > hi) {
    row += 1;
    if (row >= rows.n_rows) return c;
    off = rows.row(row);
    len = rows.len(row);
    first_idx = lo == 0 ? 0 : bucket_containing(off, len, lo - 1) + 1;
    if (first_idx >= len - 1) return c;
    start = off[first_idx];
    end = off[first_idx + 1];
    if (start < lo || end > hi) return c;
  }
  int64_t last_idx = first_idx + 1;
  while (last_idx < len - 1) {
    int64_t nxt = off[last_idx + 1];
    if (nxt > hi) break;
    last_idx += 1;
    end = nxt;
  }
  c = {true, row, first_idx, last_idx, start, end};
  return c;
}

}  // namespace

extern "C" {

// Batched fenwick planning (ref: range_filter_tree.h:297-401). Per query q:
//   bucket_row/bucket_idx[q*cap .. q*cap+bucket_count[q])   covering buckets
//   fringe[q*4 .. q*4+4) = (s1, e1, s2, e2)                  brute windows
// Returns 0, or -1 if any query overflowed `cap`.
int64_t plan_fenwick_batch(
    const int64_t* offs, const int64_t* row_ptr, int64_t n_rows, int64_t split,
    const int64_t* lo_arr, const int64_t* hi_arr, int64_t n_queries,
    int32_t* bucket_row, int64_t* bucket_idx, int32_t* bucket_count,
    int64_t* fringe, int64_t cap) {
  Rows rows{offs, row_ptr, n_rows};
  std::atomic<int64_t> overflow(0);
  parallel_for(n_queries, [&](int64_t q) {
    int64_t lo = lo_arr[q], hi = hi_arr[q];
    int32_t* brow = bucket_row + q * cap;
    int64_t* bidx = bucket_idx + q * cap;
    int64_t nb = 0;
    int64_t* fr = fringe + q * 4;
    Center c = find_largest_ranges(rows, lo, hi);
    if (!c.found) {
      bucket_count[q] = 0;
      fr[0] = lo; fr[1] = hi; fr[2] = 0; fr[3] = 0;
      return;
    }
    for (int64_t b = c.first_idx; b < c.last_idx; b++) {
      if (nb < cap) { brow[nb] = (int32_t)c.row; bidx[nb] = b; }
      nb++;
    }
    int64_t cover_lo = c.cover_lo, cover_hi = c.cover_hi;
    int64_t left_idx = c.first_idx, right_idx = c.last_idx - 1;
    for (int64_t r = c.row + 1; r < n_rows; r++) {
      const int64_t* off = rows.row(r);
      int64_t len = rows.len(r);
      left_idx *= split;
      right_idx = right_idx * split + split - 1;
      while (left_idx > 0) {
        int64_t nxt = off[left_idx - 1];
        if (nxt < lo) break;
        cover_lo = nxt;
        left_idx -= 1;
        if (nb < cap) { brow[nb] = (int32_t)r; bidx[nb] = left_idx; }
        nb++;
      }
      while (right_idx < len - 2) {
        int64_t nxt = off[right_idx + 2];
        if (nxt > hi) break;
        cover_hi = nxt;
        right_idx += 1;
        if (nb < cap) { brow[nb] = (int32_t)r; bidx[nb] = right_idx; }
        nb++;
      }
    }
    if (nb > cap) overflow.store(1);
    bucket_count[q] = (int32_t)std::min(nb, cap);
    fr[0] = lo; fr[1] = cover_lo; fr[2] = cover_hi; fr[3] = hi;
  });
  return overflow.load() ? -1 : 0;
}

// Batched center finding (ref: range_filter_tree.h:234-295): the coarsest
// row whose buckets fit in [lo, hi) and its maximal run of wholly-contained
// buckets. found[q] = 0 if no center exists.
void plan_center_batch(
    const int64_t* offs, const int64_t* row_ptr, int64_t n_rows,
    const int64_t* lo_arr, const int64_t* hi_arr, int64_t n_queries,
    int32_t* found, int32_t* out_row, int64_t* out_first, int64_t* out_last,
    int64_t* out_cover_lo, int64_t* out_cover_hi) {
  Rows rows{offs, row_ptr, n_rows};
  parallel_for(n_queries, [&](int64_t q) {
    Center c = find_largest_ranges(rows, lo_arr[q], hi_arr[q]);
    found[q] = c.found ? 1 : 0;
    out_row[q] = (int32_t)c.row;
    out_first[q] = c.first_idx;
    out_last[q] = c.last_idx;
    out_cover_lo[q] = c.cover_lo;
    out_cover_hi[q] = c.cover_hi;
  });
}

// Batched optimized-postfilter routing (ref: range_filter_tree.h:403-471).
// kind[q]: 0 = fenwick fallback, 1 = bucket (row[q], idx[q]).
// min_ratio < 0 disables the "smart combined" ratio fallback.
void plan_optimized_batch(
    const int64_t* offs, const int64_t* row_ptr, int64_t n_rows, int64_t split,
    int64_t cutoff, double min_ratio,
    const int64_t* lo_arr, const int64_t* hi_arr, int64_t n_queries,
    int32_t* kind, int32_t* out_row, int64_t* out_idx) {
  Rows rows{offs, row_ptr, n_rows};
  parallel_for(n_queries, [&](int64_t q) {
    int64_t lo = lo_arr[q], hi = hi_arr[q];
    if (4 * (hi - lo) < cutoff) {
      kind[q] = 0; out_row[q] = 0; out_idx[q] = 0;
      return;
    }
    int64_t row = 0, idx = 0;
    while (row + 1 < n_rows) {
      const int64_t* off = rows.row(row + 1);
      int64_t len = rows.len(row + 1);
      int64_t found = -1;
      for (int64_t cand = idx * split; cand < idx * split + split; cand++) {
        if (cand >= len - 1) break;
        if (lo >= off[cand] && hi <= off[cand + 1]) found = cand;
      }
      if (found < 0) break;
      row += 1;
      idx = found;
    }
    const int64_t* off = rows.row(row);
    int64_t b_lo = off[idx], b_hi = off[idx + 1];
    double ratio = (double)(b_hi - b_lo) /
                   (double)std::max<int64_t>(hi - lo, 1);
    if (min_ratio >= 0.0 && ratio > min_ratio) {
      kind[q] = 0; out_row[q] = 0; out_idx[q] = 0;
    } else {
      kind[q] = 1; out_row[q] = (int32_t)row; out_idx[q] = idx;
    }
  });
}

// Super-postfilter-tree routing (ref: super_optimized_postfilter_tree.h:187-243).
// Rows are given by (bucket_size[r], bucket_shift[r], n_buckets[r]) for
// r in [0, n_rows); bucket b of row r spans [b*shift, min(b*shift+size, n)).
// Scans rows smallest-bucket-first (reverse order) for the first bucket
// containing [lo, hi); row 0 (whole dataset) is the fallback.
void route_super_batch(
    const int64_t* bucket_size, const int64_t* bucket_shift,
    const int64_t* n_buckets, int64_t n_rows, int64_t n_points,
    const int64_t* lo_arr, const int64_t* hi_arr, int64_t n_queries,
    int32_t* out_row, int64_t* out_idx) {
  parallel_for(n_queries, [&](int64_t q) {
    int64_t lo = lo_arr[q], hi = hi_arr[q];
    for (int64_t r = n_rows - 1; r >= 1; r--) {
      int64_t size = bucket_size[r], shift = bucket_shift[r];
      if (size < hi - lo) continue;
      int64_t first = std::min(lo / shift, n_buckets[r] - 1);
      int64_t last = std::min((hi - 1) / shift, n_buckets[r] - 1);
      for (int64_t b = first; b <= last; b++) {
        int64_t b_lo = b * shift;
        int64_t b_hi = std::min(b_lo + size, n_points);
        if (lo >= b_lo && hi <= b_hi) {
          out_row[q] = (int32_t)r;
          out_idx[q] = b;
          return;
        }
      }
    }
    out_row[q] = 0;
    out_idx[q] = 0;
  });
}

// Merge per-part top-k results into per-query top-k
// (ref: range_filter_tree.h:399,542-549 sort_and_truncate). Parts arrive as
// [n_parts, k] (ids, dists) with part_qi giving the owning query; parts of a
// query are disjoint by construction so no dedup is needed. Sort key is
// (dist, id) ascending; empty slots have dist = +inf.
void merge_topk_parts(
    const int64_t* part_ids, const float* part_dists, const int32_t* part_qi,
    int64_t n_parts, int64_t k, int64_t n_queries,
    const int64_t* query_part_offsets,  // [n_queries+1] into part-sorted order
    const int32_t* part_order,          // parts sorted by qi
    int64_t* out_ids, float* out_dists, int64_t empty_id) {
  parallel_for(n_queries, [&](int64_t q) {
    int64_t p_lo = query_part_offsets[q], p_hi = query_part_offsets[q + 1];
    int64_t* oi = out_ids + q * k;
    float* od = out_dists + q * k;
    for (int64_t j = 0; j < k; j++) {
      oi[j] = empty_id;
      od[j] = std::numeric_limits<float>::infinity();
    }
    if (p_lo >= p_hi) return;
    std::vector<std::pair<float, int64_t>> cand;
    cand.reserve((p_hi - p_lo) * k);
    for (int64_t pp = p_lo; pp < p_hi; pp++) {
      int32_t part = part_order[pp];
      const int64_t* ids = part_ids + (int64_t)part * k;
      const float* ds = part_dists + (int64_t)part * k;
      for (int64_t j = 0; j < k; j++) {
        if (ids[j] != empty_id) cand.emplace_back(ds[j], ids[j]);
      }
    }
    int64_t take = std::min<int64_t>(k, (int64_t)cand.size());
    std::partial_sort(cand.begin(), cand.begin() + take, cand.end());
    for (int64_t j = 0; j < take; j++) {
      od[j] = cand[j].first;
      oi[j] = cand[j].second;
    }
  });
}

// ---- Graph binary IO (ref: ParlayANN/algorithms/utils/graph.h:126-196) ----
// Format: uint32 n | uint32 maxDeg | uint32 degrees[n] | packed uint32 edges.

int64_t graph_file_sizes(const char* path, uint32_t* n, uint32_t* max_deg) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fread(n, 4, 1, f) != 1 || fread(max_deg, 4, 1, f) != 1) {
    fclose(f);
    return -1;
  }
  fclose(f);
  return 0;
}

// Reads into a caller-allocated padded [n, max_deg] int32 array (-1 padding).
int64_t read_graph_padded(const char* path, int32_t* nbrs, int64_t n,
                          int64_t max_deg) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint32_t n_file, deg_file;
  if (fread(&n_file, 4, 1, f) != 1 || fread(&deg_file, 4, 1, f) != 1 ||
      (int64_t)n_file != n || (int64_t)deg_file != max_deg) {
    fclose(f);
    return -1;
  }
  std::vector<uint32_t> degrees(n);
  if (fread(degrees.data(), 4, n, f) != (size_t)n) {
    fclose(f);
    return -1;
  }
  int64_t total = 0;
  for (int64_t i = 0; i < n; i++) total += degrees[i];
  std::vector<uint32_t> edges(total);
  if (total && fread(edges.data(), 4, total, f) != (size_t)total) {
    fclose(f);
    return -1;
  }
  fclose(f);
  int64_t pos = 0;
  for (int64_t i = 0; i < n; i++) {
    int64_t d = degrees[i];
    int32_t* row = nbrs + i * max_deg;
    for (int64_t j = 0; j < d; j++) row[j] = (int32_t)edges[pos + j];
    for (int64_t j = d; j < max_deg; j++) row[j] = -1;
    pos += d;
  }
  return 0;
}

// Writes a padded [n, max_deg] adjacency (-1 padding) in the reference format.
int64_t write_graph_padded(const char* path, const int32_t* nbrs, int64_t n,
                           int64_t max_deg) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  uint32_t hdr[2] = {(uint32_t)n, (uint32_t)max_deg};
  fwrite(hdr, 4, 2, f);
  std::vector<uint32_t> degrees(n);
  parallel_for(n, [&](int64_t i) {
    const int32_t* row = nbrs + i * max_deg;
    uint32_t d = 0;
    while (d < max_deg && row[d] >= 0) d++;
    degrees[i] = d;
  });
  fwrite(degrees.data(), 4, n, f);
  std::vector<uint32_t> buf;
  buf.reserve(1 << 20);
  for (int64_t i = 0; i < n; i++) {
    const int32_t* row = nbrs + i * max_deg;
    for (uint32_t j = 0; j < degrees[i]; j++) buf.push_back((uint32_t)row[j]);
    if (buf.size() >= (1u << 20)) {
      fwrite(buf.data(), 4, buf.size(), f);
      buf.clear();
    }
  }
  if (!buf.empty()) fwrite(buf.data(), 4, buf.size(), f);
  fclose(f);
  return 0;
}

}  // extern "C"
