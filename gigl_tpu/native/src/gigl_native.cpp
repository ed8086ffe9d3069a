// gigl_tpu native host engine.
//
// TPU-native replacement for the host-side duties of the reference's
// GraphLearn-for-PyTorch C++ engine (vendored build, see
// /root/reference/requirements/install_py_deps.sh:100-122): CSR graph
// store construction, out-of-core feature gather, deterministic neighbor
// sampling on the host (for graphs too large for device HBM), and the
// TFRecord record codec (the reference moves every inter-stage artifact as
// TFRecords via spark-tfrecord + tf.data; dep_vars.env:7-10).
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).
// Threading: std::thread fan-out over contiguous chunks — the gathers and
// samplers are embarrassingly parallel.
//
// Determinism: sampling uses the same lowbias32 counter-RNG keyed by
// (seed, node, hop, slot) as the device sampler
// (gigl_tpu/sampling/neighbor_sampler.py counter_rng_uniform), so host and
// device sampling agree bit-for-bit.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Threading helper
// ---------------------------------------------------------------------------

static void parallel_for(int64_t n, int num_threads,
                         const std::function<void(int64_t, int64_t)>& fn) {
  if (num_threads <= 1 || n < (1 << 14)) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// Counter RNG (lowbias32) — parity with neighbor_sampler._mix32
// ---------------------------------------------------------------------------

static inline uint32_t mix32(uint32_t x) {
  x ^= x >> 16;
  x *= 0x7FEB352Du;
  x ^= x >> 15;
  x *= 0x846CA68Bu;
  x ^= x >> 16;
  return x;
}

static inline uint32_t counter_rng(uint32_t node, uint32_t seed, uint32_t hop,
                                   uint32_t slot) {
  uint32_t base = node * 0x9E3779B9u + seed * 0x85EBCA6Bu + hop * 0xC2B2AE35u;
  return mix32(base ^ mix32(slot + 0x27220A95u));
}

// ---------------------------------------------------------------------------
// CSR build (counting sort; stable within anchor by original edge order)
// ---------------------------------------------------------------------------

// src/dst: [E]; anchor_is_dst selects the key side. Outputs: indptr
// [n_anchor+1] int64, indices [E] int32 (neighbor ids), edge_ids [E] int64.
int64_t gigl_build_csr(const int64_t* src, const int64_t* dst, int64_t E,
                       int64_t n_anchor, int anchor_is_dst, int64_t* indptr,
                       int32_t* indices, int64_t* edge_ids) {
  const int64_t* key = anchor_is_dst ? dst : src;
  const int64_t* nbr = anchor_is_dst ? src : dst;
  std::vector<int64_t> counts(n_anchor + 1, 0);
  for (int64_t e = 0; e < E; ++e) {
    if (key[e] < 0 || key[e] >= n_anchor) return -1;
    counts[key[e] + 1]++;
  }
  indptr[0] = 0;
  for (int64_t v = 0; v < n_anchor; ++v) indptr[v + 1] = indptr[v] + counts[v + 1];
  std::vector<int64_t> cursor(indptr, indptr + n_anchor);
  for (int64_t e = 0; e < E; ++e) {
    int64_t slot = cursor[key[e]]++;
    indices[slot] = static_cast<int32_t>(nbr[e]);
    edge_ids[slot] = e;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Feature gather (f32), threaded; optionally from an mmap'd table.
// ---------------------------------------------------------------------------

int64_t gigl_gather_f32(const float* table, int64_t N, int64_t D,
                        const int64_t* idx, int64_t M, float* out,
                        int num_threads) {
  std::atomic<int64_t> bad{0};
  parallel_for(M, num_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t r = idx[i];
      if (r < 0 || r >= N) {
        bad.store(i + 1);
        continue;
      }
      std::memcpy(out + i * D, table + r * D, sizeof(float) * D);
    }
  });
  return bad.load() ? -bad.load() : 0;
}

// ---------------------------------------------------------------------------
// Host fanout sampler — parity with device sample_neighbors(method=uniform)
// ---------------------------------------------------------------------------

// For each root: deg <= fanout -> first-deg slots (mask 1 for s < deg);
// deg > fanout -> with-replacement uniform via counter_rng.
// Outputs: nbr [R, fanout] int32 (0 where masked), mask [R, fanout] uint8,
// edge_slots [R, fanout] int64 (CSR slot, clamped).
int64_t gigl_sample_fanout(const int64_t* indptr, const int32_t* indices,
                           int64_t n_nodes, int64_t n_edges,
                           const int32_t* roots, int64_t R, int32_t fanout,
                           uint32_t seed, uint32_t hop, int32_t* nbr,
                           uint8_t* mask, int64_t* edge_slots,
                           int num_threads) {
  std::atomic<int64_t> bad{0};
  parallel_for(R, num_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int32_t v = roots[i];
      if (v < 0 || v >= n_nodes) {
        bad.store(i + 1);
        continue;
      }
      int64_t start = indptr[v];
      int64_t deg = indptr[v + 1] - start;
      for (int32_t s = 0; s < fanout; ++s) {
        int64_t off;
        uint8_t m;
        if (deg <= fanout) {
          off = std::min<int64_t>(s, deg > 0 ? deg - 1 : 0);
          m = s < deg;
        } else {
          uint32_t bits = counter_rng(static_cast<uint32_t>(v), seed, hop,
                                      static_cast<uint32_t>(s));
          off = bits % static_cast<uint32_t>(deg);
          m = 1;
        }
        int64_t slot = start + off;
        if (slot >= n_edges) slot = n_edges - 1;
        if (slot < 0) slot = 0;
        int64_t o = i * fanout + s;
        edge_slots[o] = slot;
        nbr[o] = m ? indices[slot] : 0;
        mask[o] = m;
      }
    }
  });
  return bad.load() ? -bad.load() : 0;
}

// ---------------------------------------------------------------------------
// TFRecord codec (crc32c framing)
// ---------------------------------------------------------------------------

static uint32_t crc32c_table[256];
static bool crc32c_init_done = false;

static void crc32c_init() {
  if (crc32c_init_done) return;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k)
      c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
    crc32c_table[i] = c;
  }
  crc32c_init_done = true;
}

static uint32_t crc32c(const uint8_t* data, size_t n) {
  crc32c_init();
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i)
    c = crc32c_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

static uint32_t masked_crc(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

uint32_t gigl_masked_crc32c(const uint8_t* data, int64_t n) {
  return masked_crc(data, static_cast<size_t>(n));
}

// Writes one TFRecord frame into out (caller allocates 16 + len bytes).
// Layout: u64 len | u32 masked_crc(len) | payload | u32 masked_crc(payload).
int64_t gigl_tfrecord_encode(const uint8_t* payload, int64_t len,
                             uint8_t* out) {
  uint64_t l = static_cast<uint64_t>(len);
  std::memcpy(out, &l, 8);
  uint32_t lc = masked_crc(out, 8);
  std::memcpy(out + 8, &lc, 4);
  std::memcpy(out + 12, payload, len);
  uint32_t dc = masked_crc(payload, len);
  std::memcpy(out + 12 + len, &dc, 4);
  return 16 + len;
}

// Scans a TFRecord buffer; fills offsets/lengths of up to max_records
// payloads. Returns number of records, or -(byte offset+1) on corruption.
int64_t gigl_tfrecord_scan(const uint8_t* buf, int64_t size,
                           int64_t* offsets, int64_t* lengths,
                           int64_t max_records, int check_crc) {
  int64_t pos = 0, count = 0;
  while (pos + 12 <= size && count < max_records) {
    uint64_t len;
    std::memcpy(&len, buf + pos, 8);
    if (check_crc) {
      uint32_t lc;
      std::memcpy(&lc, buf + pos + 8, 4);
      if (masked_crc(buf + pos, 8) != lc) return -(pos + 1);
    }
    if (pos + 16 + static_cast<int64_t>(len) > size) return -(pos + 1);
    if (check_crc) {
      uint32_t dc;
      std::memcpy(&dc, buf + pos + 12 + len, 4);
      if (masked_crc(buf + pos + 12, len) != dc) return -(pos + 1);
    }
    offsets[count] = pos + 12;
    lengths[count] = static_cast<int64_t>(len);
    count++;
    pos += 16 + len;
  }
  return count;
}

// ---------------------------------------------------------------------------
// Fused tree-level expansion + multi-table gather (batch assembly)
// ---------------------------------------------------------------------------

// One streamed-training tree level in a single threaded pass — the GLT
// async-sampling-worker analog: expand the frontier through the frozen
// per-node sample table (ids_table/mask_table, [N, K]) AND gather feature
// rows, hopcache-aggregate rows, and degrees for every child, writing
// straight into preallocated output buffers (no Python-side temporaries).
//
// K == 0 means "root level": no expansion — gather feats/agg/degs for the
// frontier itself (out_ids/out_mask untouched).
//
// Masked children write id 0 and gather row 0 (matching the numpy path's
// np.where(mask, nbr, 0) semantics). Returns 0, or -1 on out-of-range ids.
int64_t gigl_expand_gather(const int32_t* frontier, const uint8_t* parent_mask,
                           int64_t M, const int32_t* ids_table,
                           const uint8_t* mask_table, int64_t N, int64_t K,
                           const float* feats, int64_t Df, const float* agg,
                           int64_t Da, const float* degrees, int32_t* out_ids,
                           uint8_t* out_mask, float* out_feats, float* out_agg,
                           float* out_degs, int num_threads) {
  std::atomic<int64_t> bad{0};
  auto gather_one = [&](int64_t o, int32_t id) {
    std::memcpy(out_feats + o * Df, feats + static_cast<int64_t>(id) * Df,
                Df * sizeof(float));
    std::memcpy(out_agg + o * Da, agg + static_cast<int64_t>(id) * Da,
                Da * sizeof(float));
    out_degs[o] = degrees[id];
  };
  if (K == 0) {
    parallel_for(M, num_threads, [&](int64_t lo, int64_t hi) {
      for (int64_t i = lo; i < hi; ++i) {
        int32_t id = frontier[i];
        if (id < 0 || id >= N) { bad.store(i + 1); return; }
        gather_one(i, id);
      }
    });
    return bad.load() ? -1 : 0;
  }
  parallel_for(M, num_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int32_t node = frontier[i];
      if (node < 0 || node >= N) { bad.store(i + 1); return; }
      bool pm = parent_mask[i] != 0;
      const int32_t* row_ids = ids_table + static_cast<int64_t>(node) * K;
      const uint8_t* row_mask = mask_table + static_cast<int64_t>(node) * K;
      for (int64_t t = 0; t < K; ++t) {
        int64_t o = i * K + t;
        bool m = pm && row_mask[t] != 0;
        int32_t id = m ? row_ids[t] : 0;
        if (id < 0 || id >= N) { bad.store(i + 1); return; }
        out_ids[o] = id;
        out_mask[o] = m ? 1 : 0;
        gather_one(o, id);
      }
    }
  });
  return bad.load() ? -1 : 0;
}

}  // extern "C"
