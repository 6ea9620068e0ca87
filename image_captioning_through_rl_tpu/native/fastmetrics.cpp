// fastmetrics: native n-gram scoring kernels for caption evaluation.
//
// The eval path scores tens of thousands of caption pairs (reference
// utilities.py:341-358 over 40k val lines); the Python n-gram counting
// in metrics/{bleu,cider}.py dominates that wall time. This library
// implements the same two corpus statistics over pre-interned token-id
// sequences:
//
//   * corpus BLEU accumulators (clipped n-gram matches, guesses,
//     closest reference lengths) — combined into BLEU_k in Python;
//   * CIDEr (tf-idf weighted n-gram cosine with Gaussian length
//     penalty, sigma=6, x10) — full scores returned per image.
//
// Sentences arrive as flat int32 token-id arrays with offsets (see
// native.py). N-grams are packed into 64-bit keys (16 bits per token,
// vocab < 65536 asserted Python-side) and counted in open-address hash
// maps, so a 40k-pair corpus scores in milliseconds.
//
// Exposed via a C ABI for ctypes; no Python headers needed.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kMaxN = 4;

using Key = uint64_t;
using CountMap = std::unordered_map<Key, int32_t>;
using WeightMap = std::unordered_map<Key, double>;

// Pack up to 4 token ids (16 bits each) into a key. Token ids must be
// < 2^16 (checked by the Python wrapper). All maps are per-n, so keys
// of different orders never share a map and need no disambiguation.
inline Key pack(const int32_t* toks, int n) {
  Key k = 0;
  for (int i = 0; i < n; ++i) {
    k = (k << 16) | static_cast<Key>(toks[i] & 0xffff);
  }
  return k;
}

void count_ngrams(const int32_t* toks, int len, CountMap out[kMaxN]) {
  for (int n = 1; n <= kMaxN; ++n) {
    CountMap& m = out[n - 1];
    for (int i = 0; i + n <= len; ++i) {
      ++m[pack(toks + i, n)];
    }
  }
}

struct Corpus {
  const int32_t* tokens;
  const int64_t* offsets;  // [num + 1]
  int64_t num;
  const int32_t* sent(int64_t i, int* len) const {
    *len = static_cast<int>(offsets[i + 1] - offsets[i]);
    return tokens + offsets[i];
  }
};

}  // namespace

extern "C" {

// Corpus BLEU accumulators. refs are grouped per hypothesis by
// ref_group_offsets: hypothesis i has refs [ref_group_offsets[i],
// ref_group_offsets[i+1]) in the refs corpus.
//
// Outputs: correct[4], guess[4], and {testlen,reflen} totals.
void bleu_stats(const int32_t* hyp_tokens, const int64_t* hyp_offsets, int64_t num,
                const int32_t* ref_tokens, const int64_t* ref_offsets,
                const int64_t* ref_group_offsets,
                int64_t* correct, int64_t* guess,
                int64_t* testlen_out, int64_t* reflen_out) {
  Corpus hyps{hyp_tokens, hyp_offsets, num};
  Corpus refs{ref_tokens, ref_offsets, 0};
  int64_t testlen = 0, reflen = 0;
  std::memset(correct, 0, kMaxN * sizeof(int64_t));
  std::memset(guess, 0, kMaxN * sizeof(int64_t));

  CountMap hyp_counts[kMaxN], max_ref[kMaxN];
  for (int64_t i = 0; i < num; ++i) {
    int hlen;
    const int32_t* h = hyps.sent(i, &hlen);
    testlen += hlen;

    for (int n = 0; n < kMaxN; ++n) { hyp_counts[n].clear(); max_ref[n].clear(); }
    count_ngrams(h, hlen, hyp_counts);

    // closest reference length (ties -> shorter)
    int best_len = -1;
    int64_t best_diff = INT64_MAX;
    for (int64_t r = ref_group_offsets[i]; r < ref_group_offsets[i + 1]; ++r) {
      int rlen;
      const int32_t* rt = refs.sent(r, &rlen);
      int64_t diff = llabs(static_cast<int64_t>(rlen) - hlen);
      if (diff < best_diff || (diff == best_diff && rlen < best_len)) {
        best_diff = diff;
        best_len = rlen;
      }
      CountMap rc[kMaxN];
      count_ngrams(rt, rlen, rc);
      for (int n = 0; n < kMaxN; ++n) {
        for (const auto& kv : rc[n]) {
          auto it = max_ref[n].find(kv.first);
          if (it == max_ref[n].end() || it->second < kv.second) {
            max_ref[n][kv.first] = kv.second;
          }
        }
      }
    }
    reflen += best_len;

    for (int n = 0; n < kMaxN; ++n) {
      int64_t g = hlen - n;  // hlen - (n+1) + 1
      if (g > 0) guess[n] += g;
      for (const auto& kv : hyp_counts[n]) {
        auto it = max_ref[n].find(kv.first);
        if (it != max_ref[n].end()) {
          correct[n] += kv.second < it->second ? kv.second : it->second;
        }
      }
    }
  }
  *testlen_out = testlen;
  *reflen_out = reflen;
}

// CIDEr per-image scores (pycocoevalcap cider_scorer.py semantics):
// df over reference groups, w = tf * (log(num) - log(max(1, df))),
// per-n clipped dot / (|h| |r|), Gaussian length penalty sigma=6,
// averaged over n and refs, x10.
void cider_scores(const int32_t* hyp_tokens, const int64_t* hyp_offsets, int64_t num,
                  const int32_t* ref_tokens, const int64_t* ref_offsets,
                  const int64_t* ref_group_offsets,
                  double* scores_out) {
  Corpus hyps{hyp_tokens, hyp_offsets, num};
  Corpus refs{ref_tokens, ref_offsets, 0};
  const double sigma = 6.0;
  const double log_num = std::log(static_cast<double>(num));

  // document frequency: each unique ngram once per image's ref group
  WeightMap df[kMaxN];
  {
    CountMap seen[kMaxN];
    for (int64_t i = 0; i < num; ++i) {
      for (int n = 0; n < kMaxN; ++n) seen[n].clear();
      for (int64_t r = ref_group_offsets[i]; r < ref_group_offsets[i + 1]; ++r) {
        int rlen;
        const int32_t* rt = refs.sent(r, &rlen);
        count_ngrams(rt, rlen, seen);
      }
      for (int n = 0; n < kMaxN; ++n) {
        for (const auto& kv : seen[n]) df[n][kv.first] += 1.0;
      }
    }
  }

  auto weight = [&](int n, Key k, int32_t tf) {
    auto it = df[n].find(k);
    double d = it == df[n].end() ? 1.0 : (it->second < 1.0 ? 1.0 : it->second);
    return static_cast<double>(tf) * (log_num - std::log(d));
  };

  CountMap hc[kMaxN], rc[kMaxN];
  for (int64_t i = 0; i < num; ++i) {
    int hlen;
    const int32_t* h = hyps.sent(i, &hlen);
    for (int n = 0; n < kMaxN; ++n) hc[n].clear();
    count_ngrams(h, hlen, hc);

    double h_norm[kMaxN] = {0, 0, 0, 0};
    WeightMap hw[kMaxN];
    for (int n = 0; n < kMaxN; ++n) {
      for (const auto& kv : hc[n]) {
        double w = weight(n, kv.first, kv.second);
        hw[n][kv.first] = w;
        h_norm[n] += w * w;
      }
      h_norm[n] = std::sqrt(h_norm[n]);
    }

    double total[kMaxN] = {0, 0, 0, 0};
    int64_t nrefs = ref_group_offsets[i + 1] - ref_group_offsets[i];
    for (int64_t r = ref_group_offsets[i]; r < ref_group_offsets[i + 1]; ++r) {
      int rlen;
      const int32_t* rt = refs.sent(r, &rlen);
      for (int n = 0; n < kMaxN; ++n) rc[n].clear();
      count_ngrams(rt, rlen, rc);
      double delta = static_cast<double>(hlen - rlen);
      double penalty = std::exp(-(delta * delta) / (2.0 * sigma * sigma));
      for (int n = 0; n < kMaxN; ++n) {
        double r_norm = 0.0, dot = 0.0;
        WeightMap rw;
        for (const auto& kv : rc[n]) {
          double w = weight(n, kv.first, kv.second);
          rw[kv.first] = w;
          r_norm += w * w;
        }
        r_norm = std::sqrt(r_norm);
        for (const auto& kv : hw[n]) {
          auto it = rw.find(kv.first);
          if (it != rw.end()) {
            double wh = kv.second, wr = it->second;
            dot += (wh < wr ? wh : wr) * wr;
          }
        }
        double val = 0.0;
        if (h_norm[n] != 0.0 && r_norm != 0.0) val = dot / (h_norm[n] * r_norm);
        total[n] += val * penalty;
      }
    }
    double s = 0.0;
    for (int n = 0; n < kMaxN; ++n) s += total[n];
    scores_out[i] = s / kMaxN / static_cast<double>(nrefs) * 10.0;
  }
}

}  // extern "C"
