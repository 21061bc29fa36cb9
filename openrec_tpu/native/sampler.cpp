// Native host-side sampling kernels.
//
// The reference's data layer is pure Python running in 5 worker processes
// (openrec/tf2/data/utils.py:164-214). Our numpy samplers are already
// whole-batch vectorized; this library removes the remaining per-batch
// numpy overhead (temporary allocations, multiple passes for rejection
// rounds) with single-pass C++ loops, so one prefetch thread can saturate
// the TPU's input needs at large batch sizes.
//
// Exposed via ctypes (no pybind11 dependency); every entry point is plain
// C. RNG is splitmix64 → xorshift128+, seeded per call: results are
// deterministic given (seed) but intentionally a different stream from the
// numpy path (both are uniform; tests assert validity, not stream
// equality).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    // splitmix64 to expand the seed
    auto next = [&seed]() {
      seed += 0x9E3779B97f4A7C15ULL;
      uint64_t z = seed;
      z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
      z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
      return z ^ (z >> 31);
    };
    s0 = next();
    s1 = next();
  }
  inline uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  // unbiased bounded draw (Lemire)
  inline uint64_t bounded(uint64_t range) {
    uint64_t x = next();
    __uint128_t m = ( __uint128_t )x * ( __uint128_t )range;
    uint64_t l = (uint64_t)m;
    if (l < range) {
      uint64_t t = -range % range;
      while (l < t) {
        x = next();
        m = ( __uint128_t )x * ( __uint128_t )range;
        l = (uint64_t)m;
      }
    }
    return (uint64_t)(m >> 64);
  }
};

inline bool contains(const int64_t* keys, int64_t n, int64_t q) {
  int64_t lo = 0, hi = n;
  while (lo < hi) {
    int64_t mid = (lo + hi) >> 1;
    if (keys[mid] < q) lo = mid + 1; else hi = mid;
  }
  return lo < n && keys[lo] == q;
}

// Open-addressing hash set over int64 keys (EMPTY = -1; keys are
// nonnegative u*I+i composites). Linear probing, power-of-2 capacity,
// load factor <= 0.5: ~1.5 probes per lookup vs ~18 for binary search.
constexpr int64_t kEmpty = -1;

inline uint64_t hash_key(int64_t k) {
  uint64_t z = (uint64_t)k + 0x9E3779B97f4A7C15ULL;
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

inline bool hash_contains(const int64_t* table, uint64_t mask, int64_t q) {
  uint64_t pos = hash_key(q) & mask;
  while (true) {
    int64_t v = table[pos];
    if (v == q) return true;
    if (v == kEmpty) return false;
    pos = (pos + 1) & mask;
  }
}

}  // namespace

extern "C" {

// Fill a caller-allocated hash table (capacity = next pow2 >= 2n,
// pre-filled with -1) from sorted keys. Returns the capacity used.
void build_hash_table(const int64_t* keys, int64_t n, int64_t* table,
                      int64_t capacity) {
  uint64_t mask = (uint64_t)capacity - 1;
  for (int64_t i = 0; i < n; ++i) {
    int64_t k = keys[i];
    uint64_t pos = hash_key(k) & mask;
    while (table[pos] != kEmpty) pos = (pos + 1) & mask;
    table[pos] = k;
  }
}

// Hash-table variants of the sampling entry points.
void sample_negatives_hash(const int64_t* table, int64_t capacity,
                           const int64_t* users, int64_t n,
                           int64_t total_items, uint64_t seed,
                           int32_t max_rounds, int32_t* out) {
  Rng rng(seed);
  uint64_t mask = (uint64_t)capacity - 1;
  for (int64_t i = 0; i < n; ++i) {
    int64_t cand = (int64_t)rng.bounded((uint64_t)total_items);
    for (int32_t r = 0; r < max_rounds; ++r) {
      if (!hash_contains(table, mask,
                         users[i] * total_items + cand)) break;
      cand = (int64_t)rng.bounded((uint64_t)total_items);
    }
    out[i] = (int32_t)cand;
  }
}

static void pairwise_range(
    const int64_t* table, uint64_t mask,
    const int32_t* rec_users, const int32_t* rec_items,
    const int64_t* record_idx, int64_t lo, int64_t hi,
    int64_t total_items, uint64_t seed, int32_t max_rounds,
    int32_t* out_users, int32_t* out_pos, int32_t* out_neg) {
  Rng rng(seed);
  for (int64_t i = lo; i < hi; ++i) {
    int64_t r = record_idx[i];
    int32_t u = rec_users[r];
    out_users[i] = u;
    out_pos[i] = rec_items[r];
    int64_t cand = (int64_t)rng.bounded((uint64_t)total_items);
    for (int32_t rd = 0; rd < max_rounds; ++rd) {
      if (!hash_contains(table, mask,
                         (int64_t)u * total_items + cand)) break;
      cand = (int64_t)rng.bounded((uint64_t)total_items);
    }
    out_neg[i] = (int32_t)cand;
  }
}

void pairwise_join_and_negatives_hash(
    const int64_t* table, int64_t capacity,
    const int32_t* rec_users, const int32_t* rec_items,
    const int64_t* record_idx, int64_t batch, int64_t total_items,
    uint64_t seed, int32_t max_rounds,
    int32_t* out_users, int32_t* out_pos, int32_t* out_neg) {
  pairwise_range(table, (uint64_t)capacity - 1, rec_users, rec_items,
                 record_idx, 0, batch, total_items, seed, max_rounds,
                 out_users, out_pos, out_neg);
}

// Multi-threaded variant: the batch splits into `threads` contiguous
// ranges, each with an independent RNG stream (seed + tid). Determinism:
// results depend on (seed, threads) but not on scheduling.
void pairwise_join_and_negatives_hash_mt(
    const int64_t* table, int64_t capacity,
    const int32_t* rec_users, const int32_t* rec_items,
    const int64_t* record_idx, int64_t batch, int64_t total_items,
    uint64_t seed, int32_t max_rounds, int32_t threads,
    int32_t* out_users, int32_t* out_pos, int32_t* out_neg) {
  if (threads <= 1 || batch < 4096) {
    pairwise_join_and_negatives_hash(table, capacity, rec_users, rec_items,
                                     record_idx, batch, total_items, seed,
                                     max_rounds, out_users, out_pos,
                                     out_neg);
    return;
  }
  uint64_t mask = (uint64_t)capacity - 1;
  std::vector<std::thread> pool;
  int64_t chunk = (batch + threads - 1) / threads;
  for (int32_t t = 0; t < threads; ++t) {
    int64_t lo = (int64_t)t * chunk;
    int64_t hi = lo + chunk < batch ? lo + chunk : batch;
    if (lo >= hi) break;
    pool.emplace_back(pairwise_range, table, mask, rec_users, rec_items,
                      record_idx, lo, hi, total_items,
                      seed + (uint64_t)t * 0x9E3779B97f4A7C15ULL,
                      max_rounds, out_users, out_pos, out_neg);
  }
  for (auto& th : pool) th.join();
}

// Stratified pointwise batch (reference tf2 dataset.py:18-34 semantics,
// single pass): the first n_pos slots join positives from the record
// stream (label 1); the remaining n_neg slots draw uniform (user, item)
// pairs rejected against the positive set (label 0).
void stratified_pointwise_hash(
    const int64_t* table, int64_t capacity,
    const int32_t* rec_users, const int32_t* rec_items,
    const int64_t* record_idx, int64_t n_pos, int64_t n_neg,
    int64_t total_users, int64_t total_items,
    uint64_t seed, int32_t max_rounds,
    int32_t* out_users, int32_t* out_items, float* out_labels) {
  Rng rng(seed);
  uint64_t mask = (uint64_t)capacity - 1;
  for (int64_t i = 0; i < n_pos; ++i) {
    int64_t r = record_idx[i];
    out_users[i] = rec_users[r];
    out_items[i] = rec_items[r];
    out_labels[i] = 1.0f;
  }
  for (int64_t i = n_pos; i < n_pos + n_neg; ++i) {
    int64_t u = (int64_t)rng.bounded((uint64_t)total_users);
    int64_t it = (int64_t)rng.bounded((uint64_t)total_items);
    for (int32_t rd = 0; rd < max_rounds; ++rd) {
      if (!hash_contains(table, mask, u * total_items + it)) break;
      u = (int64_t)rng.bounded((uint64_t)total_users);
      it = (int64_t)rng.bounded((uint64_t)total_items);
    }
    out_users[i] = (int32_t)u;
    out_items[i] = (int32_t)it;
    out_labels[i] = 0.0f;
  }
}

// Fisher-Yates co-shuffle of the (user, item) record arrays — the epoch
// permutation computed in place so batch windows read SEQUENTIALLY
// (removes both the numpy permutation pass and the per-sample random
// record gathers of the record_idx path).
void shuffle_pairs(int32_t* users, int32_t* items, int64_t n,
                   uint64_t seed) {
  Rng rng(seed);
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = (int64_t)rng.bounded((uint64_t)(i + 1));
    int32_t tu = users[i]; users[i] = users[j]; users[j] = tu;
    int32_t ti = items[i]; items[i] = items[j]; items[j] = ti;
  }
}

// Negatives for a SEQUENTIAL user window, block-prefetched: the hash
// table (4MB+ at real scales) exceeds L2, so a dependent per-sample
// probe pays DRAM latency serially; issuing a block of prefetches first
// overlaps ~BLK misses (memory-level parallelism). The rare slow cases
// (occupied-but-different slot, or a positive hit needing resampling)
// fall back to the scalar rejection loop.
static void negatives_seq_range(const int64_t* table, uint64_t mask,
                                const int32_t* users, int64_t lo,
                                int64_t hi, int64_t total_items,
                                uint64_t seed, int32_t max_rounds,
                                int32_t* out_neg) {
  Rng rng(seed);
  constexpr int64_t BLK = 32;
  int64_t cand[BLK];
  int64_t key[BLK];
  uint64_t pos[BLK];
  for (int64_t base = lo; base < hi; base += BLK) {
    int64_t m = hi - base < BLK ? hi - base : BLK;
    for (int64_t j = 0; j < m; ++j) {
      cand[j] = (int64_t)rng.bounded((uint64_t)total_items);
      key[j] = (int64_t)users[base + j] * total_items + cand[j];
      pos[j] = hash_key(key[j]) & mask;
      __builtin_prefetch(&table[pos[j]], 0, 1);
    }
    for (int64_t j = 0; j < m; ++j) {
      int64_t v = table[pos[j]];
      if (v == kEmpty) {                      // fast path: miss => valid
        out_neg[base + j] = (int32_t)cand[j];
        continue;
      }
      // slow path: walk the probe chain; resample on a positive hit
      int64_t c = cand[j];
      int64_t k = key[j];
      uint64_t p = pos[j];
      for (int32_t rd = 0; rd <= max_rounds; ++rd) {
        while (true) {
          if (v == k) break;                  // positive -> resample
          if (v == kEmpty) { rd = max_rounds + 1; break; }  // valid
          p = (p + 1) & mask;
          v = table[p];
        }
        if (rd > max_rounds) break;
        c = (int64_t)rng.bounded((uint64_t)total_items);
        k = (int64_t)users[base + j] * total_items + c;
        p = hash_key(k) & mask;
        v = table[p];
      }
      out_neg[base + j] = (int32_t)c;
    }
  }
}

void pairwise_negatives_seq(const int64_t* table, int64_t capacity,
                            const int32_t* users, int64_t batch,
                            int64_t total_items, uint64_t seed,
                            int32_t max_rounds, int32_t threads,
                            int32_t* out_neg) {
  uint64_t mask = (uint64_t)capacity - 1;
  if (threads <= 1 || batch < 4096) {
    negatives_seq_range(table, mask, users, 0, batch, total_items, seed,
                        max_rounds, out_neg);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (batch + threads - 1) / threads;
  for (int32_t t = 0; t < threads; ++t) {
    int64_t lo = (int64_t)t * chunk;
    int64_t hi = lo + chunk < batch ? lo + chunk : batch;
    if (lo >= hi) break;
    pool.emplace_back(negatives_seq_range, table, mask, users, lo, hi,
                      total_items,
                      seed + (uint64_t)t * 0x9E3779B97f4A7C15ULL,
                      max_rounds, out_neg);
  }
  for (auto& th : pool) th.join();
}

// out[i] = 1 iff (users[i], items[i]) is an observed positive.
void is_positive_batch(const int64_t* pos_keys, int64_t n_keys,
                       const int64_t* users, const int64_t* items,
                       int64_t n, int64_t total_items, uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    out[i] = contains(pos_keys, n_keys,
                      users[i] * total_items + items[i]) ? 1 : 0;
  }
}

// One uniform non-positive item per user (rejection sampling).
void sample_negatives(const int64_t* pos_keys, int64_t n_keys,
                      const int64_t* users, int64_t n, int64_t total_items,
                      uint64_t seed, int32_t max_rounds, int32_t* out) {
  Rng rng(seed);
  for (int64_t i = 0; i < n; ++i) {
    int64_t cand = (int64_t)rng.bounded((uint64_t)total_items);
    for (int32_t r = 0; r < max_rounds; ++r) {
      if (!contains(pos_keys, n_keys, users[i] * total_items + cand)) break;
      cand = (int64_t)rng.bounded((uint64_t)total_items);
    }
    out[i] = (int32_t)cand;
  }
}

// Full pairwise batch: pick records uniformly from [0, n_records) using
// the caller-provided permutation window, join user/item, and draw one
// negative each. record_idx is filled by the caller (epoch stream).
void pairwise_join_and_negatives(
    const int64_t* pos_keys, int64_t n_keys,
    const int32_t* rec_users, const int32_t* rec_items,
    const int64_t* record_idx, int64_t batch, int64_t total_items,
    uint64_t seed, int32_t max_rounds,
    int32_t* out_users, int32_t* out_pos, int32_t* out_neg) {
  Rng rng(seed);
  for (int64_t i = 0; i < batch; ++i) {
    int64_t r = record_idx[i];
    int32_t u = rec_users[r];
    out_users[i] = u;
    out_pos[i] = rec_items[r];
    int64_t cand = (int64_t)rng.bounded((uint64_t)total_items);
    for (int32_t rd = 0; rd < max_rounds; ++rd) {
      if (!contains(pos_keys, n_keys,
                    (int64_t)u * total_items + cand)) break;
      cand = (int64_t)rng.bounded((uint64_t)total_items);
    }
    out_neg[i] = (int32_t)cand;
  }
}

}  // extern "C"
