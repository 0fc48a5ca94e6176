// CTC prefix beam search over per-frame top-k posteriors — native runtime
// component for the decode hot path.
//
// The Python DP (mindaudio_tpu/utils/recognize.py ctc_prefix_beam_dp, the
// reference's recognize.py:297-337 algorithm) costs ~0.4-0.6 s per 10 s
// utterance at beam 10 x topk 10 — it dominated batched attention-rescoring
// RTF (PERF.md). Same algorithm here: hash-keyed prefixes, (blank, non-blank)
// log-prob pairs, top-`beam` pruning per frame; batched over utterances with
// one worker thread per utterance.
//
// C ABI (ctypes): see ctc_prefix_beam_batch below.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr double NEG_INF = -std::numeric_limits<double>::infinity();

inline double log_add2(double a, double b) {
  if (a == NEG_INF) return b;
  if (b == NEG_INF) return a;
  double m = a > b ? a : b;
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

inline double log_add3(double a, double b, double c) {
  return log_add2(log_add2(a, b), c);
}

struct VecHash {
  size_t operator()(const std::vector<int32_t>& v) const {
    size_t h = 1469598103934665603ull;  // FNV-1a over the token bytes
    for (int32_t x : v) {
      h ^= static_cast<uint32_t>(x);
      h *= 1099511628211ull;
    }
    return h;
  }
};

struct PS {
  double pb = NEG_INF;   // ends-in-blank log prob
  double pnb = NEG_INF;  // ends-in-non-blank log prob
};

using HypMap = std::unordered_map<std::vector<int32_t>, PS, VecHash>;

void beam_one(const float* logp, const int32_t* idx, int32_t T, int32_t K,
              int32_t beam, int32_t blank_id, int32_t max_len,
              int32_t* out_tokens, int32_t* out_lens, float* out_scores,
              int32_t* out_count) {
  std::vector<std::pair<std::vector<int32_t>, PS>> cur;
  cur.push_back({{}, PS{0.0, NEG_INF}});

  HypMap next;
  for (int32_t t = 0; t < T; ++t) {
    next.clear();
    for (int32_t k = 0; k < K; ++k) {
      const int32_t s = idx[t * K + k];
      const double ps = logp[t * K + k];
      for (const auto& [prefix, v] : cur) {
        const int32_t last = prefix.empty() ? -1 : prefix.back();
        if (s == blank_id) {
          PS& n = next[prefix];
          n.pb = log_add3(n.pb, v.pb + ps, v.pnb + ps);
        } else if (s == last) {
          {  // *ss -> *s (repeat merged into the non-blank path)
            PS& n = next[prefix];
            n.pnb = log_add2(n.pnb, v.pnb + ps);
          }
          {  // *s-s -> *ss (blank separated the repeat)
            std::vector<int32_t> np = prefix;
            np.push_back(s);
            PS& n = next[np];
            n.pnb = log_add2(n.pnb, v.pb + ps);
          }
        } else {
          std::vector<int32_t> np = prefix;
          np.push_back(s);
          PS& n = next[np];
          n.pnb = log_add3(n.pnb, v.pb + ps, v.pnb + ps);
        }
      }
    }
    cur.assign(next.begin(), next.end());
    const size_t keep = std::min<size_t>(beam, cur.size());
    std::partial_sort(
        cur.begin(), cur.begin() + keep, cur.end(),
        [](const auto& a, const auto& b) {
          return log_add2(a.second.pb, a.second.pnb) >
                 log_add2(b.second.pb, b.second.pnb);
        });
    cur.resize(keep);
  }

  const int32_t n = static_cast<int32_t>(cur.size());
  *out_count = n;
  for (int32_t i = 0; i < n; ++i) {
    const auto& [prefix, v] = cur[i];
    const int32_t len =
        std::min<int32_t>(static_cast<int32_t>(prefix.size()), max_len);
    out_lens[i] = len;
    std::memcpy(out_tokens + i * max_len, prefix.data(),
                sizeof(int32_t) * len);
    out_scores[i] = static_cast<float>(log_add2(v.pb, v.pnb));
  }
}

}  // namespace

extern "C" {

// top_logp: (B, T, K) f32 — top_idx: (B, T, K) i32 — n_valid: (B,) i32.
// Outputs: out_tokens (B, beam, max_len) i32, out_lens (B, beam) i32,
// out_scores (B, beam) f32, out_counts (B,) i32 (hyps emitted, <= beam).
// Returns 0 on success.
int ctc_prefix_beam_batch(const float* top_logp, const int32_t* top_idx,
                          const int32_t* n_valid, int32_t B, int32_t T,
                          int32_t K, int32_t beam, int32_t blank_id,
                          int32_t max_len, int32_t* out_tokens,
                          int32_t* out_lens, float* out_scores,
                          int32_t* out_counts) {
  if (B <= 0 || T < 0 || K <= 0 || beam <= 0 || max_len <= 0) return 1;
  auto work = [&](int32_t b) {
    const int32_t tv = std::max<int32_t>(0, std::min(n_valid[b], T));
    beam_one(top_logp + static_cast<int64_t>(b) * T * K,
             top_idx + static_cast<int64_t>(b) * T * K, tv, K, beam, blank_id,
             max_len, out_tokens + static_cast<int64_t>(b) * beam * max_len,
             out_lens + static_cast<int64_t>(b) * beam,
             out_scores + static_cast<int64_t>(b) * beam, out_counts + b);
  };
  const unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  if (B == 1 || hw == 1) {
    for (int32_t b = 0; b < B; ++b) work(b);
    return 0;
  }
  std::vector<std::thread> threads;
  const unsigned n_threads = std::min<unsigned>(hw, B);
  // strided static partition: utterances are similar cost
  for (unsigned w = 0; w < n_threads; ++w) {
    threads.emplace_back([&, w]() {
      for (int32_t b = w; b < B; b += n_threads) work(b);
    });
  }
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"
