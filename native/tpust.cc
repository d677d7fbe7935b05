// Native text runtime for the TPU style-transfer framework.
//
// The reference leaned on third-party native libraries for its text layer
// (HF `tokenizers` in Rust for CharBPE, gensim's C word2vec — reference
// src/vocab.py, src/wmd.py). This library provides first-party C++
// equivalents for the host-side hot paths:
//   - CharBPE: merge training, single/batch encode into fixed-shape int32
//     buffers ready for device transfer, decode;
//   - word2vec: CBOW + negative sampling, hogwild multithreaded (the
//     original word2vec training scheme).
// Exposed as a C ABI for ctypes (no pybind11 in this image). File-format
// handling (vocab.json / merges.txt) stays in Python; blobs cross the
// boundary as '\n'-joined token tables and merge lists.
//
// Build: make -C native   (produces native/libtpust.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <random>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<int32_t, int32_t>& p) const {
    return (static_cast<size_t>(p.first) << 32) ^ static_cast<uint32_t>(p.second);
  }
};

struct Bpe {
  std::vector<std::string> id_to_tok;
  std::unordered_map<std::string, int32_t> tok_to_id;
  // merge rank keyed by (left id, right id) -> (rank, merged id)
  std::unordered_map<std::pair<int32_t, int32_t>, std::pair<int32_t, int32_t>, PairHash> ranks;
  int32_t unk_id = 3;
  std::unordered_map<std::string, std::vector<int32_t>> cache;
};

const std::string kSuffix = "</w>";

bool is_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) || (c >= 91 && c <= 96) ||
         (c >= 123 && c <= 126);
}

// Whitespace split with ASCII punctuation isolated (multibyte UTF-8 bytes are
// treated as word chars), mirroring text/bpe.py::pre_tokenize for the ASCII
// corpora this pipeline targets.
std::vector<std::string> pre_tokenize(const std::string& text) {
  std::vector<std::string> words;
  std::string buf;
  for (unsigned char c : text) {
    if (std::isspace(c)) {
      if (!buf.empty()) { words.push_back(buf); buf.clear(); }
    } else if (is_punct(c)) {
      if (!buf.empty()) { words.push_back(buf); buf.clear(); }
      words.emplace_back(1, static_cast<char>(c));
    } else {
      buf.push_back(static_cast<char>(c));
    }
  }
  if (!buf.empty()) words.push_back(buf);
  return words;
}

// Split a UTF-8 word into code-point strings, with kSuffix on the last.
std::vector<std::string> word_symbols(const std::string& w) {
  std::vector<std::string> syms;
  for (size_t i = 0; i < w.size();) {
    size_t len = 1;
    unsigned char c = w[i];
    if ((c & 0xE0) == 0xC0) len = 2;
    else if ((c & 0xF0) == 0xE0) len = 3;
    else if ((c & 0xF8) == 0xF0) len = 4;
    syms.push_back(w.substr(i, len));
    i += len;
  }
  if (!syms.empty()) syms.back() += kSuffix;
  return syms;
}

std::vector<int32_t> bpe_word(Bpe* bpe, const std::string& word) {
  auto it = bpe->cache.find(word);
  if (it != bpe->cache.end()) return it->second;
  std::vector<std::string> sym_strs = word_symbols(word);
  std::vector<int32_t> syms;
  syms.reserve(sym_strs.size());
  for (auto& s : sym_strs) {
    auto f = bpe->tok_to_id.find(s);
    syms.push_back(f == bpe->tok_to_id.end() ? -1 : f->second);
  }
  // Greedy lowest-rank merging. Unknown symbols (-1) never merge.
  while (syms.size() > 1) {
    int best_rank = INT32_MAX, best_i = -1, best_merged = -1;
    for (size_t i = 0; i + 1 < syms.size(); ++i) {
      if (syms[i] < 0 || syms[i + 1] < 0) continue;
      auto f = bpe->ranks.find({syms[i], syms[i + 1]});
      if (f != bpe->ranks.end() && f->second.first < best_rank) {
        best_rank = f->second.first;
        best_i = static_cast<int>(i);
        best_merged = f->second.second;
      }
    }
    if (best_i < 0) break;
    syms[best_i] = best_merged;
    syms.erase(syms.begin() + best_i + 1);
  }
  std::vector<int32_t> ids;
  ids.reserve(syms.size());
  for (int32_t s : syms) ids.push_back(s < 0 ? bpe->unk_id : s);
  bpe->cache.emplace(word, ids);
  return ids;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- BPE: load
// tokens_blob: '\n'-joined token strings in id order.
// merges_blob: '\n'-joined "left right" merge lines in rank order.
void* tpust_bpe_new(const char* tokens_blob, const char* merges_blob) {
  auto* bpe = new Bpe();
  {
    std::string blob(tokens_blob);
    size_t start = 0;
    while (start <= blob.size()) {
      size_t end = blob.find('\n', start);
      if (end == std::string::npos) end = blob.size();
      std::string tok = blob.substr(start, end - start);
      if (!tok.empty()) {
        bpe->tok_to_id.emplace(tok, static_cast<int32_t>(bpe->id_to_tok.size()));
        bpe->id_to_tok.push_back(tok);
      }
      if (end == blob.size()) break;
      start = end + 1;
    }
  }
  {
    std::string blob(merges_blob);
    size_t start = 0;
    int32_t rank = 0;
    while (start <= blob.size()) {
      size_t end = blob.find('\n', start);
      if (end == std::string::npos) end = blob.size();
      std::string line = blob.substr(start, end - start);
      if (!line.empty() && line[0] != '#') {
        size_t sp = line.find(' ');
        if (sp != std::string::npos) {
          std::string a = line.substr(0, sp), b = line.substr(sp + 1);
          auto fa = bpe->tok_to_id.find(a);
          auto fb = bpe->tok_to_id.find(b);
          auto fm = bpe->tok_to_id.find(a + b);
          if (fa != bpe->tok_to_id.end() && fb != bpe->tok_to_id.end() &&
              fm != bpe->tok_to_id.end()) {
            bpe->ranks[{fa->second, fb->second}] = {rank, fm->second};
          }
          ++rank;
        }
      }
      if (end == blob.size()) break;
      start = end + 1;
    }
  }
  auto unk = bpe->tok_to_id.find("<unk>");
  if (unk != bpe->tok_to_id.end()) bpe->unk_id = unk->second;
  return bpe;
}

void tpust_bpe_free(void* handle) { delete static_cast<Bpe*>(handle); }

int tpust_bpe_vocab_size(void* handle) {
  return static_cast<int>(static_cast<Bpe*>(handle)->id_to_tok.size());
}

// Encode one line; returns the number of ids written (<= max_out).
int tpust_bpe_encode(void* handle, const char* text, int32_t* out, int max_out) {
  auto* bpe = static_cast<Bpe*>(handle);
  int n = 0;
  for (const auto& word : pre_tokenize(text)) {
    for (int32_t id : bpe_word(bpe, word)) {
      if (n >= max_out) return n;
      out[n++] = id;
    }
  }
  return n;
}

// Batch encode: lines_blob is '\n'-joined sentences. Writes ids into a
// (n_lines, max_len) row-major int32 buffer pre-filled by the caller (PAD),
// and per-line true lengths (pre-truncation lengths are clamped to max_len).
// Returns the number of lines processed.
int tpust_bpe_encode_batch(void* handle, const char* lines_blob, int max_len,
                           int32_t* out_ids, int32_t* out_lens, int max_lines) {
  auto* bpe = static_cast<Bpe*>(handle);
  std::string blob(lines_blob);
  size_t start = 0;
  int line = 0;
  while (start <= blob.size() && line < max_lines) {
    size_t end = blob.find('\n', start);
    if (end == std::string::npos) end = blob.size();
    std::string text = blob.substr(start, end - start);
    int n = 0;
    if (!text.empty()) {
      for (const auto& word : pre_tokenize(text)) {
        if (n >= max_len) break;
        for (int32_t id : bpe_word(bpe, word)) {
          if (n >= max_len) break;
          out_ids[static_cast<size_t>(line) * max_len + n] = id;
          ++n;
        }
      }
      out_lens[line] = n;
      ++line;
    }
    if (end == blob.size()) break;
    start = end + 1;
  }
  return line;
}

// Decode ids into a '</w>'->' ' joined string; returns bytes written.
int tpust_bpe_decode(void* handle, const int32_t* ids, int n, char* out,
                     int max_out) {
  auto* bpe = static_cast<Bpe*>(handle);
  std::string s;
  for (int i = 0; i < n; ++i) {
    if (ids[i] < 0 || ids[i] >= static_cast<int32_t>(bpe->id_to_tok.size()))
      continue;
    const std::string& tok = bpe->id_to_tok[ids[i]];
    if (tok == "<pad>" || tok == "<s>" || tok == "</s>" || tok == "<unk>")
      continue;
    s += tok;
  }
  // replace suffix with space
  std::string result;
  size_t pos = 0;
  while (pos < s.size()) {
    size_t f = s.find(kSuffix, pos);
    if (f == std::string::npos) { result += s.substr(pos); break; }
    result += s.substr(pos, f - pos);
    result += ' ';
    pos = f + kSuffix.size();
  }
  while (!result.empty() && result.back() == ' ') result.pop_back();
  int n_out = std::min(static_cast<int>(result.size()), max_out - 1);
  std::memcpy(out, result.data(), n_out);
  out[n_out] = 0;
  return n_out;
}

// --------------------------------------------------------------- BPE: train
// Trains merges over '\n'-joined corpus lines. Writes the learned vocab and
// merge blobs into caller buffers ('\n'-joined, same formats as tpust_bpe_new).
// specials_blob: '\n'-joined special tokens placed first in the vocab.
// Returns final vocab size, or -1 if a buffer was too small.
int tpust_bpe_train(const char* corpus_blob, int vocab_size,
                    const char* specials_blob, char* out_tokens,
                    int max_tokens_bytes, char* out_merges,
                    int max_merges_bytes) {
  // word frequencies
  std::unordered_map<std::string, int64_t> word_freq;
  {
    std::string blob(corpus_blob);
    size_t start = 0;
    while (start <= blob.size()) {
      size_t end = blob.find('\n', start);
      if (end == std::string::npos) end = blob.size();
      std::string line = blob.substr(start, end - start);
      for (auto& w : pre_tokenize(line)) ++word_freq[w];
      if (end == blob.size()) break;
      start = end + 1;
    }
  }
  std::vector<std::pair<std::vector<std::string>, int64_t>> words;
  words.reserve(word_freq.size());
  for (auto& [w, c] : word_freq)
    if (!w.empty()) words.push_back({word_symbols(w), c});

  std::vector<std::string> vocab_list;
  std::unordered_map<std::string, int32_t> vocab;
  auto add_tok = [&](const std::string& t) {
    if (vocab.emplace(t, static_cast<int32_t>(vocab_list.size())).second)
      vocab_list.push_back(t);
  };
  {
    std::string blob(specials_blob);
    size_t start = 0;
    while (start <= blob.size()) {
      size_t end = blob.find('\n', start);
      if (end == std::string::npos) end = blob.size();
      std::string t = blob.substr(start, end - start);
      if (!t.empty()) add_tok(t);
      if (end == blob.size()) break;
      start = end + 1;
    }
  }
  {
    std::vector<std::string> alphabet;
    for (auto& [syms, c] : words)
      for (auto& s : syms) alphabet.push_back(s);
    std::sort(alphabet.begin(), alphabet.end());
    alphabet.erase(std::unique(alphabet.begin(), alphabet.end()), alphabet.end());
    for (auto& s : alphabet) add_tok(s);
  }

  std::map<std::pair<std::string, std::string>, int64_t> pair_freq;
  for (auto& [syms, c] : words)
    for (size_t i = 0; i + 1 < syms.size(); ++i)
      pair_freq[{syms[i], syms[i + 1]}] += c;

  std::vector<std::pair<std::string, std::string>> merges;
  while (static_cast<int>(vocab_list.size()) < vocab_size && !pair_freq.empty()) {
    // argmax by count, ties lexicographic (std::map iterates sorted keys)
    std::pair<std::string, std::string> best;
    int64_t best_c = 0;
    for (auto& [pair, c] : pair_freq) {
      if (c > best_c) { best = pair; best_c = c; }
    }
    if (best_c < 1) break;
    std::string merged = best.first + best.second;
    merges.push_back(best);
    add_tok(merged);
    for (auto& [syms, c] : words) {
      for (size_t i = 0; i + 1 < syms.size();) {
        if (syms[i] == best.first && syms[i + 1] == best.second) {
          if (i > 0) {
            pair_freq[{syms[i - 1], best.first}] -= c;
            pair_freq[{syms[i - 1], merged}] += c;
          }
          if (i + 2 < syms.size()) {
            pair_freq[{best.second, syms[i + 2]}] -= c;
            pair_freq[{merged, syms[i + 2]}] += c;
          }
          syms[i] = merged;
          syms.erase(syms.begin() + i + 1);
        } else {
          ++i;
        }
      }
    }
    pair_freq.erase(best);
    for (auto it = pair_freq.begin(); it != pair_freq.end();)
      it = it->second <= 0 ? pair_freq.erase(it) : std::next(it);
  }

  std::string tok_blob, merge_blob;
  for (auto& t : vocab_list) { tok_blob += t; tok_blob += '\n'; }
  for (auto& [a, b] : merges) { merge_blob += a; merge_blob += ' '; merge_blob += b; merge_blob += '\n'; }
  if (static_cast<int>(tok_blob.size()) >= max_tokens_bytes ||
      static_cast<int>(merge_blob.size()) >= max_merges_bytes)
    return -1;
  std::memcpy(out_tokens, tok_blob.data(), tok_blob.size());
  out_tokens[tok_blob.size()] = 0;
  std::memcpy(out_merges, merge_blob.data(), merge_blob.size());
  out_merges[merge_blob.size()] = 0;
  return static_cast<int>(vocab_list.size());
}

// ----------------------------------------------------------------- word2vec
// CBOW + negative sampling, hogwild threads (the original word2vec scheme).
// sentences: concatenated token ids; lens: per-sentence lengths.
// counts: per-token corpus frequencies (for the noise table + subsampling).
// out_vectors: (vocab, dim) float32, caller-allocated.
void tpust_w2v_train(const int32_t* sentences, const int32_t* lens,
                     int n_sents, int vocab, int dim, int window, int negative,
                     int epochs, float lr0, float min_lr, float sample,
                     uint64_t seed, int n_threads, const int64_t* counts,
                     float* out_vectors) {
  std::vector<float> W(static_cast<size_t>(vocab) * dim);
  std::vector<float> C(static_cast<size_t>(vocab) * dim, 0.f);
  {
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<float> u(-0.5f / dim, 0.5f / dim);
    for (auto& w : W) w = u(rng);
  }
  // unigram^0.75 table
  const int kTable = 1 << 20;
  std::vector<int32_t> noise(kTable);
  {
    double total = 0;
    for (int i = 0; i < vocab; ++i) total += std::pow(double(counts[i]), 0.75);
    double acc = 0;
    int i = -1;
    double next = 0;
    for (int t = 0; t < kTable; ++t) {
      double want = (t + 0.5) / kTable * total;
      while (acc < want && i + 1 < vocab) {
        ++i;
        acc += std::pow(double(counts[i]), 0.75);
      }
      noise[t] = std::max(i, 0);
      (void)next;
    }
  }
  int64_t corpus_total = 0;
  for (int i = 0; i < vocab; ++i) corpus_total += counts[i];

  std::vector<size_t> offsets(n_sents);
  {
    size_t off = 0;
    for (int s = 0; s < n_sents; ++s) { offsets[s] = off; off += lens[s]; }
  }
  int64_t total_words = 0;
  for (int s = 0; s < n_sents; ++s) total_words += lens[s];
  const int64_t total_steps = std::max<int64_t>(1, total_words * epochs);
  std::atomic<int64_t> global_step{0};

  auto worker = [&](int tid) {
    std::mt19937_64 rng(seed + 0x9E3779B97F4A7C15ull * (tid + 1));
    std::uniform_real_distribution<float> u01(0.f, 1.f);
    std::vector<float> h(dim), gh(dim);
    for (int ep = 0; ep < epochs; ++ep) {
      for (int s = tid; s < n_sents; s += n_threads) {
        const int32_t* sent0 = sentences + offsets[s];
        int n0 = lens[s];
        // subsample
        std::vector<int32_t> sent;
        sent.reserve(n0);
        for (int i = 0; i < n0; ++i) {
          int32_t wi = sent0[i];
          if (sample > 0) {
            double f = double(counts[wi]) / corpus_total;
            double keep = std::min(1.0, (std::sqrt(f / sample) + 1) * (sample / f));
            if (u01(rng) >= keep) continue;
          }
          sent.push_back(wi);
        }
        int n = static_cast<int>(sent.size());
        for (int pos = 0; pos < n; ++pos) {
          int64_t step = global_step.fetch_add(1, std::memory_order_relaxed);
          float lr = std::max(min_lr, lr0 * (1.f - float(step) / total_steps));
          int b = static_cast<int>(rng() % window);
          int lo = std::max(0, pos - window + b);
          int hi = std::min(n, pos + window - b + 1);
          int cn = 0;
          std::fill(h.begin(), h.end(), 0.f);
          for (int j = lo; j < hi; ++j) {
            if (j == pos) continue;
            const float* w = &W[static_cast<size_t>(sent[j]) * dim];
            for (int d = 0; d < dim; ++d) h[d] += w[d];
            ++cn;
          }
          if (cn == 0) continue;
          for (int d = 0; d < dim; ++d) h[d] /= cn;
          std::fill(gh.begin(), gh.end(), 0.f);
          for (int k = 0; k <= negative; ++k) {
            int32_t target = k == 0 ? sent[pos]
                                    : noise[rng() % kTable];
            float label = k == 0 ? 1.f : 0.f;
            float* c = &C[static_cast<size_t>(target) * dim];
            float dot = 0;
            for (int d = 0; d < dim; ++d) dot += c[d] * h[d];
            float g = (label - 1.f / (1.f + std::exp(-dot))) * lr;
            for (int d = 0; d < dim; ++d) gh[d] += g * c[d];
            for (int d = 0; d < dim; ++d) c[d] += g * h[d];
          }
          for (int j = lo; j < hi; ++j) {
            if (j == pos) continue;
            float* w = &W[static_cast<size_t>(sent[j]) * dim];
            for (int d = 0; d < dim; ++d) w[d] += gh[d] / cn;
          }
        }
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
  for (auto& t : threads) t.join();
  std::memcpy(out_vectors, W.data(), W.size() * sizeof(float));
}

}  // extern "C"
