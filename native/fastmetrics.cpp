// Fast host-side evaluation metrics: Levenshtein distance and BLEU-n over
// int32 token sequences.
//
// The reference computes these per pair in pure Python
// (img2latex/training/metrics.py:49-181); over a 10k-sequence test split that
// dominates evaluation wall-clock once decoding runs on TPU.  This native
// kernel is semantically identical (verified bit-exact by
// tests/test_native.py): BLEU-n is the geometric mean of 1..n-gram
// precisions, zero if any precision is zero, with brevity penalty
// exp(1 - ref/gen) only when the candidate is shorter.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Plain edit distance between two int32 sequences (two-row DP).
int32_t levenshtein(const int32_t* a, int32_t na, const int32_t* b, int32_t nb) {
  if (na == 0) return nb;
  if (nb == 0) return na;
  if (nb > na) {  // keep the inner row the shorter one
    std::swap(a, b);
    std::swap(na, nb);
  }
  std::vector<int32_t> prev(nb + 1), cur(nb + 1);
  for (int32_t j = 0; j <= nb; ++j) prev[j] = j;
  for (int32_t i = 1; i <= na; ++i) {
    cur[0] = i;
    const int32_t ai = a[i - 1];
    for (int32_t j = 1; j <= nb; ++j) {
      const int32_t sub = prev[j - 1] + (b[j - 1] != ai);
      const int32_t del = prev[j] + 1;
      const int32_t ins = cur[j - 1] + 1;
      cur[j] = std::min(sub, std::min(del, ins));
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

// 64-bit FNV-1a over an n-gram of int32 tokens.
static inline uint64_t ngram_hash(const int32_t* p, int k) {
  uint64_t h = 1469598103934665603ull;
  for (int i = 0; i < k; ++i) {
    uint32_t v = static_cast<uint32_t>(p[i]);
    for (int b = 0; b < 4; ++b) {
      h ^= (v >> (8 * b)) & 0xff;
      h *= 1099511628211ull;
    }
  }
  return h;
}

// BLEU-n for one candidate/reference pair.  Hash collisions are acccepted as
// negligible for 64-bit FNV over short sequences; the Python test-suite
// cross-checks exact equality against the tuple-based implementation.
double bleu_n(const int32_t* gen, int32_t ng, const int32_t* ref, int32_t nr, int32_t n) {
  if (ng == 0 || nr == 0) return 0.0;
  double log_sum = 0.0;
  std::unordered_map<uint64_t, int32_t> gen_counts, ref_counts;
  for (int k = 1; k <= n; ++k) {
    if (ng < k || nr < k) return 0.0;
    gen_counts.clear();
    ref_counts.clear();
    const int32_t tg = ng - k + 1, tr = nr - k + 1;
    gen_counts.reserve(tg * 2);
    ref_counts.reserve(tr * 2);
    for (int32_t i = 0; i < tg; ++i) ++gen_counts[ngram_hash(gen + i, k)];
    for (int32_t i = 0; i < tr; ++i) ++ref_counts[ngram_hash(ref + i, k)];
    int64_t matching = 0;
    for (const auto& kv : gen_counts) {
      auto it = ref_counts.find(kv.first);
      if (it != ref_counts.end()) matching += std::min(kv.second, it->second);
    }
    if (matching == 0) return 0.0;
    log_sum += std::log(static_cast<double>(matching) / tg);
  }
  double geo = std::exp(log_sum / n);
  if (ng < nr) geo *= std::exp(1.0 - static_cast<double>(nr) / ng);
  return geo;
}

// Batched BLEU + normalized Levenshtein similarity over flattened ragged
// arrays: sequences i occupies flat[offsets[i] .. offsets[i+1]).
void batch_metrics(const int32_t* flat_a, const int64_t* off_a,
                   const int32_t* flat_b, const int64_t* off_b,
                   int32_t n_pairs, int32_t n,
                   double* out_bleu, double* out_lev_sim) {
  for (int32_t i = 0; i < n_pairs; ++i) {
    const int32_t* a = flat_a + off_a[i];
    const int32_t na = static_cast<int32_t>(off_a[i + 1] - off_a[i]);
    const int32_t* b = flat_b + off_b[i];
    const int32_t nb = static_cast<int32_t>(off_b[i + 1] - off_b[i]);
    out_bleu[i] = bleu_n(a, na, b, nb, n);
    const int32_t maxlen = std::max(na, nb);
    out_lev_sim[i] = maxlen == 0 ? 1.0 : 1.0 - static_cast<double>(levenshtein(a, na, b, nb)) / maxlen;
  }
}

}  // extern "C"
