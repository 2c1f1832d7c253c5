// Native VQA-eval scorer.
//
// The reference's accuracy computation is a pure-Python loop over ~21K
// validation questions x 10 annotators with string normalization per answer
// (SURVEY.md §3.2 flags it as a hot host loop).  This implements the same
// official normalization (punctuation rule, period strip, number map,
// article drop, contraction restore — tables generated from the Python
// source of truth) and the leave-one-out consensus in C++.
//
// C API (ctypes):
//   licv_normalize_answer(in, out, cap)           -> out length
//   licv_vqa_consensus(preds, gts, gt_offsets, nq) -> per-question accuracy
//
// Build: make -C native  (g++ -O2 -shared -fPIC)

#include <algorithm>
#include <cctype>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include "normalization_tables.h"

namespace {

const std::unordered_map<std::string, std::string>& contractions() {
  static auto* m = [] {
    auto* mm = new std::unordered_map<std::string, std::string>();
    for (size_t i = 0; i < kNumContractions; ++i)
      (*mm)[kContractionKeys[i]] = kContractionVals[i];
    return mm;
  }();
  return *m;
}

const std::unordered_map<std::string, std::string>& number_map() {
  static auto* m = [] {
    auto* mm = new std::unordered_map<std::string, std::string>();
    for (size_t i = 0; i < kNumNumberMap; ++i)
      (*mm)[kNumberKeys[i]] = kNumberVals[i];
    return mm;
  }();
  return *m;
}

bool is_article(const std::string& w) {
  for (size_t i = 0; i < kNumArticles; ++i)
    if (w == kArticles[i]) return true;
  return false;
}

// digit ',' digit anywhere in the string (official commaStrip regex)
bool has_comma_in_number(const std::string& s) {
  for (size_t i = 1; i + 1 < s.size(); ++i)
    if (s[i] == ',' && std::isdigit((unsigned char)s[i - 1]) &&
        std::isdigit((unsigned char)s[i + 1]))
      return true;
  return false;
}

void replace_all(std::string& s, const std::string& from, const std::string& to) {
  if (from.empty()) return;
  size_t pos = 0;
  while ((pos = s.find(from, pos)) != std::string::npos) {
    s.replace(pos, from.size(), to);
    pos += to.size();
  }
}

std::string strip_punctuation(const std::string& text) {
  std::string out = text;
  const bool comma_num = has_comma_in_number(text);
  for (size_t i = 0; i < kNumPunct; ++i) {
    const std::string p = kPunct[i];
    // official rule: conditions evaluated against the ORIGINAL text
    const bool abuts_space = text.find(p + " ") != std::string::npos ||
                             text.find(" " + p) != std::string::npos;
    if (abuts_space || comma_num) {
      replace_all(out, p, "");
    } else {
      replace_all(out, p, " ");
    }
  }
  // periodStrip: drop '.' unless the next char is a digit
  std::string res;
  res.reserve(out.size());
  for (size_t i = 0; i < out.size(); ++i) {
    if (out[i] == '.' &&
        !(i + 1 < out.size() && std::isdigit((unsigned char)out[i + 1])))
      continue;
    res.push_back(out[i]);
  }
  return res;
}

std::string normalize_words(const std::string& text) {
  std::string lower = text;
  std::transform(lower.begin(), lower.end(), lower.begin(),
                 [](unsigned char c) { return std::tolower(c); });
  std::vector<std::string> words;
  size_t i = 0;
  while (i < lower.size()) {
    while (i < lower.size() && std::isspace((unsigned char)lower[i])) ++i;
    size_t j = i;
    while (j < lower.size() && !std::isspace((unsigned char)lower[j])) ++j;
    if (j > i) {
      std::string w = lower.substr(i, j - i);
      auto it = number_map().find(w);
      if (it != number_map().end()) w = it->second;
      if (!is_article(w)) {
        auto ct = contractions().find(w);
        if (ct != contractions().end()) w = ct->second;
        words.push_back(w);
      }
    }
    i = j;
  }
  std::string out;
  for (size_t k = 0; k < words.size(); ++k) {
    if (k) out.push_back(' ');
    out += words[k];
  }
  return out;
}

std::string normalize(const std::string& raw) {
  std::string t = raw;
  replace_all(t, "\n", " ");
  replace_all(t, "\t", " ");
  // strip
  size_t b = t.find_first_not_of(' ');
  size_t e = t.find_last_not_of(' ');
  t = (b == std::string::npos) ? "" : t.substr(b, e - b + 1);
  return normalize_words(strip_punctuation(t));
}

}  // namespace

extern "C" {

int licv_normalize_answer(const char* in, char* out, int out_cap) {
  std::string n = normalize(in ? in : "");
  int len = (int)std::min((size_t)out_cap - 1, n.size());
  std::memcpy(out, n.data(), len);
  out[len] = '\0';
  return (int)n.size();
}

// preds: nq predictions.  gts: flat array of ground-truth answers;
// question q owns gts[gt_offsets[q] .. gt_offsets[q+1]).
void licv_vqa_consensus(const char** preds, const char** gts,
                        const int* gt_offsets, int nq, double* out_acc) {
  for (int q = 0; q < nq; ++q) {
    const std::string pred = normalize(preds[q]);
    const int lo = gt_offsets[q], hi = gt_offsets[q + 1];
    const int n = hi - lo;
    if (n <= 0) {
      out_acc[q] = 0.0;
      continue;
    }
    int total = 0;
    std::vector<char> match(n, 0);
    for (int j = 0; j < n; ++j) {
      match[j] = normalize(gts[lo + j]) == pred;
      total += match[j];
    }
    double acc = 0.0;
    for (int j = 0; j < n; ++j) {
      const int others = total - match[j];
      acc += std::min(1.0, others / 3.0);
    }
    out_acc[q] = acc / n;
  }
}

}  // extern "C"
