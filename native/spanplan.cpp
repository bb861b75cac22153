// Native span-plan packer: the hot host-side preprocessing loop of the
// relation-banded fused kernels (ops/span_kernels.py:plan_rel_span).
//
// The Python packer walks every (bucket, relation-group) segment and pads
// chunks at band/bucket closures; at AM scale (12M directed edges, 267
// relation slots) that loop costs ~19s per plan — and four plans are built
// per distributed graph. This C++ port runs the identical algorithm (the
// outputs are asserted bitwise-equal in tests/test_native.py) in ~100ms.
//
// The reference repo has no native code at all (SURVEY.md §2: its only
// native surface is PyG's scatter kernels); this file is part of the
// TPU framework's own native graph-builder layer (with ntgraph.cpp).
//
// Contract: arrays arrive PRE-SORTED by (key/s, rel, key) — the caller
// does the lexsort with numpy's C machinery; this code only packs.

#include <cstdint>
#include <cstring>

extern "C" {

// Pass 1: EXACT padded size for one candidate chunk — a dry run of the
// span_pack walk below (window base slides when a chunk fills naturally,
// which a band-length-distribution estimate cannot see; such an estimate overstates
// padding for small chunks and mispicks the candidate — measured at the
// bench shape it chose 1024 where 512 is 4.20M vs 4.80M padded rows,
// a 2.5 ms/step difference on v5e).
int64_t span_padded_exact(int64_t e, const int64_t* key, const int32_t* rel,
                          int64_t s, int32_t chunk, int32_t kspan) {
  int64_t w = 0;
  int64_t fill = 0;
  int64_t cur_b = -1;
  int32_t last_rb = 0;
  for (int64_t i = 0; i < e;) {
    int64_t b = key[i] / s;
    int32_t r = rel[i];
    int64_t j = i;
    while (j < e && key[j] / s == b && rel[j] == r) ++j;
    if (b != cur_b) {
      if (fill) w += chunk - fill;
      fill = 0;
      cur_b = b;
    } else if (fill && r - last_rb >= kspan) {
      w += chunk - fill;
      fill = 0;
    }
    int64_t p = i;
    while (p < j) {
      if (fill == 0) last_rb = r;
      int64_t take = chunk - fill;
      if (take > j - p) take = j - p;
      w += take;
      fill += take;
      p += take;
      if (fill == chunk) fill = 0;
    }
    i = j;
  }
  if (fill) w += chunk - fill;
  return w;
}

// Pass 2: pack into chunk-aligned buckets, mirroring the Python greedy
// exactly: chunks close when the next relation overflows the current
// chunk's base band (pad to boundary) or when full; bucket tails pad to
// a whole chunk. Padding rows carry norm = 0 and code = pad_code | rbase.
//
// Outputs (caller-allocated):
//   out_g/out_c/out_n  [cap_edges]
//   rbase_stream       [cap_chunks]  per-chunk base relation, in order
//   chunk_counts       [nb]          chunks per bucket
//   offsets            [nb + 1]      per-bucket edge offsets
// Returns total padded edges, or -1 if a capacity would overflow.
int64_t span_pack(int64_t e, const int32_t* gather, const int64_t* key,
                  const int32_t* rel, const float* norm,
                  int64_t num_segments, int32_t num_slots,
                  int64_t s, int32_t chunk, int32_t kspan, int32_t shift,
                  int64_t cap_edges, int32_t* out_g, int32_t* out_c,
                  float* out_n, int64_t cap_chunks, int32_t* rbase_stream,
                  int32_t* chunk_counts, int64_t nb, int32_t* offsets) {
  const int32_t pad_base = (int32_t)(num_segments << shift);
  const int32_t rb_clamp = num_slots > kspan ? num_slots - kspan : 0;
  int64_t w = 0;        // write cursor into out_*
  int64_t wc = 0;       // write cursor into rbase_stream
  int64_t pos = 0;      // read cursor
  offsets[0] = 0;
  for (int64_t b = 0; b < nb; ++b) {
    int64_t fill = 0;
    int64_t bucket_chunks = 0;
    int32_t last_rb = 0;
    while (pos < e && key[pos] / s == b) {
      int32_t r = rel[pos];
      int64_t j = pos;
      while (j < e && key[j] / s == b && rel[j] == r) ++j;
      if (fill && r - last_rb >= kspan) {
        // close the chunk: pad to boundary
        int64_t pad = chunk - fill;
        if (w + pad > cap_edges) return -1;
        for (int64_t k = 0; k < pad; ++k) {
          out_g[w] = 0;
          out_c[w] = pad_base | last_rb;
          out_n[w] = 0.0f;
          ++w;
        }
        fill = 0;
      }
      int64_t p = pos;
      while (p < j) {
        if (fill == 0) {
          if (wc >= cap_chunks) return -1;
          last_rb = r;
          rbase_stream[wc++] = r < rb_clamp ? r : rb_clamp;
          ++bucket_chunks;
        }
        int64_t take = chunk - fill;
        if (take > j - p) take = j - p;
        if (w + take > cap_edges) return -1;
        std::memcpy(out_g + w, gather + p, take * sizeof(int32_t));
        for (int64_t k = 0; k < take; ++k)
          out_c[w + k] = (int32_t)(key[p + k] << shift) | rel[p + k];
        std::memcpy(out_n + w, norm + p, take * sizeof(float));
        w += take;
        fill += take;
        p += take;
        if (fill == chunk) fill = 0;
      }
      pos = j;
    }
    if (fill) {
      int64_t pad = chunk - fill;
      if (w + pad > cap_edges) return -1;
      for (int64_t k = 0; k < pad; ++k) {
        out_g[w] = 0;
        out_c[w] = pad_base | last_rb;
        out_n[w] = 0.0f;
        ++w;
      }
    }
    chunk_counts[b] = (int32_t)bucket_chunks;
    offsets[b + 1] = (int32_t)w;
  }
  return w;
}

}  // extern "C"
