// Native k-mer enumeration + counting kernel.
//
// Replaces the reference's per-anchor itertools.combinations loop fanned over a
// process pool (ref: Code/generate_kmers.py:8-132) with a multithreaded C++
// enumeration over clusters and per-thread open-addressing hash maps, merged at
// the end.  Semantics: count every sorted k-subset of each cluster whose
// adjacent node-id gaps all exceed min_distance.
//
// C ABI (used from Python via ctypes, see kmer_native.py):
//   matcha_count_kmers(...)      -> number of distinct k-mers, fills a handle
//   matcha_kmer_result_fill(...) -> copy kmers/freqs into caller buffers
//   matcha_kmer_result_free(...)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int kMaxK = 8;

struct Key {
  int32_t v[kMaxK];
  bool operator==(const Key& o) const {
    return std::memcmp(v, o.v, sizeof(v)) == 0;
  }
};

inline uint64_t hash_key(const Key& key, int k) {
  uint64_t h = 1469598103934665603ull;  // FNV-1a over k ids
  for (int i = 0; i < k; ++i) {
    h ^= static_cast<uint64_t>(static_cast<uint32_t>(key.v[i]));
    h *= 1099511628211ull;
  }
  h ^= h >> 33;
  h *= 0xff51afd7ed558ccdull;
  h ^= h >> 33;
  return h;
}

// Open-addressing (linear probing) hash map from Key -> count.
class CountMap {
 public:
  explicit CountMap(int k) : k_(k) { rehash(1 << 16); }

  void add(const Key& key, int64_t c) {
    if (size_ * 10 >= cap_ * 7) rehash(cap_ * 2);
    uint64_t mask = cap_ - 1;
    uint64_t i = hash_key(key, k_) & mask;
    while (true) {
      if (counts_[i] == 0) {
        keys_[i] = key;
        counts_[i] = c;
        ++size_;
        return;
      }
      if (keys_[i] == key) {
        counts_[i] += c;
        return;
      }
      i = (i + 1) & mask;
    }
  }

  template <typename Fn>
  void for_each(Fn&& fn) const {
    for (uint64_t i = 0; i < cap_; ++i) {
      if (counts_[i] != 0) fn(keys_[i], counts_[i]);
    }
  }

  uint64_t size() const { return size_; }

 private:
  void rehash(uint64_t new_cap) {
    std::vector<Key> old_keys = std::move(keys_);
    std::vector<int64_t> old_counts = std::move(counts_);
    uint64_t old_cap = cap_;
    cap_ = new_cap;
    keys_.assign(cap_, Key{});
    counts_.assign(cap_, 0);
    size_ = 0;
    uint64_t mask = cap_ - 1;
    for (uint64_t i = 0; i < old_cap; ++i) {
      if (old_counts[i] == 0) continue;
      uint64_t j = hash_key(old_keys[i], k_) & mask;
      while (counts_[j] != 0) j = (j + 1) & mask;
      keys_[j] = old_keys[i];
      counts_[j] = old_counts[i];
      ++size_;
    }
  }

  int k_;
  uint64_t cap_ = 0;
  uint64_t size_ = 0;
  std::vector<Key> keys_;
  std::vector<int64_t> counts_;
};

// Enumerate gap-filtered k-subsets of one cluster into `map`.
// Members are sorted ascending and distinct.  A subset qualifies iff every
// adjacent pair in it differs by more than min_distance; since members are
// sorted, we enumerate with a classic combination odometer but prune branches
// whose last chosen element is too close to the candidate.
void enumerate_cluster(const int32_t* members, int n, int k, int min_distance,
                       CountMap& map) {
  int idx[kMaxK];
  Key key{};
  // depth-first combination enumeration with gap pruning
  int depth = 0;
  idx[0] = 0;
  while (depth >= 0) {
    if (idx[depth] >= n - (k - 1 - depth)) {
      --depth;
      if (depth >= 0) ++idx[depth];
      continue;
    }
    int32_t cand = members[idx[depth]];
    if (depth > 0 && cand - key.v[depth - 1] <= min_distance) {
      ++idx[depth];
      continue;
    }
    key.v[depth] = cand;
    if (depth == k - 1) {
      map.add(key, 1);
      ++idx[depth];
    } else {
      ++depth;
      idx[depth] = idx[depth - 1] + 1;
    }
  }
}

struct Result {
  std::vector<int32_t> kmers;  // n * k
  std::vector<int64_t> freqs;  // n
  int k = 0;
};

}  // namespace

extern "C" {

int64_t matcha_count_kmers(const int32_t* flat, const int64_t* offsets,
                           int64_t num_clusters, int32_t k,
                           int32_t max_cluster_size, int32_t min_distance,
                           void** out_handle) {
  if (k > kMaxK) return -1;

  unsigned n_threads = std::max(1u, std::thread::hardware_concurrency());
  std::vector<CountMap> maps;
  maps.reserve(n_threads);
  for (unsigned t = 0; t < n_threads; ++t) maps.emplace_back(k);

  auto worker = [&](unsigned tid) {
    CountMap& map = maps[tid];
    for (int64_t c = tid; c < num_clusters; c += n_threads) {
      int n = static_cast<int>(offsets[c + 1] - offsets[c]);
      if (n < k || n > max_cluster_size) continue;
      enumerate_cluster(flat + offsets[c], n, k, min_distance, map);
    }
  };
  {
    std::vector<std::thread> threads;
    for (unsigned t = 1; t < n_threads; ++t) threads.emplace_back(worker, t);
    worker(0);
    for (auto& th : threads) th.join();
  }

  // merge thread-local maps into maps[0]
  for (unsigned t = 1; t < n_threads; ++t) {
    maps[t].for_each([&](const Key& key, int64_t c) { maps[0].add(key, c); });
  }

  auto* result = new Result;
  result->k = k;
  result->kmers.reserve(maps[0].size() * k);
  result->freqs.reserve(maps[0].size());
  maps[0].for_each([&](const Key& key, int64_t c) {
    for (int i = 0; i < k; ++i) result->kmers.push_back(key.v[i]);
    result->freqs.push_back(c);
  });
  *out_handle = result;
  return static_cast<int64_t>(result->freqs.size());
}

void matcha_kmer_result_fill(void* handle, int32_t* kmers_out,
                             int64_t* freqs_out) {
  auto* result = static_cast<Result*>(handle);
  std::memcpy(kmers_out, result->kmers.data(),
              result->kmers.size() * sizeof(int32_t));
  std::memcpy(freqs_out, result->freqs.data(),
              result->freqs.size() * sizeof(int64_t));
}

void matcha_kmer_result_free(void* handle) {
  delete static_cast<Result*>(handle);
}

}  // extern "C"
