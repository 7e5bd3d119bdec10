// Native data-path kernels for creamfl_tpu.
//
// The reference's host-side bottlenecks are per-caption Python
// tokenization (nltk inside DataLoader workers) and per-image float
// conversion+normalization; at full scale the public set alone is 50k
// captions + 50k images per round. These C kernels implement:
//   * vocab construction + lookup (open-addressing string hash map)
//   * caption tokenization (lowercase, treebank-style splitting of
//     punctuation and n't/'s/'re/'ve/'ll/'d/'m contractions) straight
//     into padded int32 id matrices, including <start>/<end> wrapping
//     and the caption-drop augmentation (unk substitution + deletion,
//     reference load_datasets.py:277-295 semantics)
//   * batch image uint8 -> normalized float32 conversion (NHWC)
//   * padded sequence collation
//
// Exposed as a plain C ABI consumed via ctypes
// (creamfl_tpu/data/native.py); no pybind11 dependency.
//
// Build: make -C native   (produces libcreamfl_native.so)

#include <cstdint>
#include <cstring>
#include <cctype>
#include <string>
#include <unordered_map>
#include <vector>
#include <random>

extern "C" {

// ---------------------------------------------------------------------
// Vocab
// ---------------------------------------------------------------------

struct Vocab {
    std::unordered_map<std::string, int32_t> map;
    int32_t unk = 3;
    int32_t start = 1;
    int32_t end = 2;
};

void* vocab_create(const char** words, const int32_t* ids, int n,
                   int32_t start_id, int32_t end_id, int32_t unk_id) {
    auto* v = new Vocab();
    v->map.reserve(n * 2);
    for (int i = 0; i < n; ++i) v->map.emplace(words[i], ids[i]);
    v->start = start_id;
    v->end = end_id;
    v->unk = unk_id;
    return v;
}

void vocab_free(void* handle) { delete static_cast<Vocab*>(handle); }

int32_t vocab_lookup(void* handle, const char* word) {
    auto* v = static_cast<Vocab*>(handle);
    auto it = v->map.find(word);
    return it == v->map.end() ? v->unk : it->second;
}

// ---------------------------------------------------------------------
// Tokenization
// ---------------------------------------------------------------------

static bool is_wordchar(unsigned char c) {
    // UTF-8 continuation/lead bytes (>= 0x80) stay inside words so
    // multibyte letters ("café") survive the byte-wise scan like they
    // do under nltk.
    return std::isalnum(c) != 0 || c >= 0x80;
}

// Treebank-style split of one lowercased sentence into tokens,
// matching nltk TreebankWordTokenizer on the caption-frequent cases:
//  - hyphenated words stay whole ("t-shirt", "state-of-the-art");
//  - internal periods attach ("u.s."); only the string-final period
//    splits off (Treebank's end-of-sentence rule); "..." is one token;
//  - '"' becomes `` (opening) or '' (closing) like Treebank;
//  - digit groups keep , and . ("1,000", "3.5");
//  - contractions n't 's 're 've 'll 'd 'm split off.
// nltk's end-of-sentence rule splits the final period when only
// whitespace OR closing punctuation ( ) ] } > " ' ) follows — "dog.)"
// and "hi.\"" end sentences too.
static bool rest_is_sentence_end(const std::string& text, size_t j) {
    for (; j < text.size(); ++j) {
        unsigned char c = text[j];
        if (std::isspace(c)) continue;
        if (c == ')' || c == ']' || c == '}' || c == '>'
            || c == '"' || c == '\'') continue;
        return false;
    }
    return true;
}

static void tokenize_one(const std::string& text,
                         std::vector<std::string>& out) {
    size_t i = 0, n = text.size();
    bool prev_sep = true;  // for quote direction
    while (i < n) {
        unsigned char c = text[i];
        if (std::isspace(c)) { ++i; prev_sep = true; continue; }
        if (c == '"') {
            out.emplace_back(prev_sep ? "``" : "''");
            ++i; prev_sep = false; continue;
        }
        if (c == '.' && i + 2 < n && text[i + 1] == '.'
            && text[i + 2] == '.') {
            size_t j = i;
            while (j < n && text[j] == '.') ++j;
            out.push_back(text.substr(i, j - i));
            i = j; prev_sep = false; continue;
        }
        if (is_wordchar(c)) {
            size_t j = i;
            std::string word;
            while (j < n) {
                unsigned char cj = text[j];
                if (is_wordchar(cj)) { word.push_back((char)cj); ++j; }
                else if (cj == '\'' && j + 1 < n
                         && is_wordchar((unsigned char)text[j + 1])) {
                    // Apostrophe inside a word: candidate contraction.
                    word.push_back('\''); ++j;
                } else if (cj == '-' && j + 1 < n
                           && is_wordchar((unsigned char)text[j + 1])) {
                    word.push_back('-'); ++j;  // hyphenated compound
                } else if (cj == '.'
                           && !(j + 1 < n && text[j + 1] == '.')
                           && !rest_is_sentence_end(text, j + 1)) {
                    word.push_back('.'); ++j;  // "u.s." mid-sentence
                } else if (cj == ',' && j + 1 < n
                           && std::isdigit((unsigned char)text[j + 1])
                           && !word.empty()
                           && std::isdigit(
                                  (unsigned char)word.back())) {
                    word.push_back(','); ++j;  // "1,000"
                } else break;
            }
            i = j;
            // Split trailing contraction.
            static const char* suff[] = {"n't", "'s", "'re", "'ve",
                                         "'ll", "'d", "'m"};
            bool split = false;
            for (const char* s : suff) {
                size_t sl = std::strlen(s);
                if (word.size() > sl
                    && word.compare(word.size() - sl, sl, s) == 0) {
                    out.push_back(word.substr(0, word.size() - sl));
                    out.push_back(word.substr(word.size() - sl));
                    split = true;
                    break;
                }
            }
            if (!split) {
                // Any remaining internal apostrophes: emit as-is (the
                // vocab decides unk-ness, matching python fallback).
                out.push_back(word);
            }
            prev_sep = false;
        } else {
            out.emplace_back(1, (char)c);
            ++i;
            prev_sep = (c == '(' || c == '[' || c == '{');
        }
    }
}

// Tokenize a batch of captions into a padded [n, max_len] id matrix.
// caption_drop_prob > 0 applies the reference's double augmentation:
// unk substitution with prob p per token, then deletion of
// int(len * p) random tokens. Returns nothing; lengths written out.
void tokenize_batch(void* vocab_handle, const char** texts, int n,
                    int32_t max_len, float caption_drop_prob,
                    uint64_t seed, int32_t* out_ids,
                    int32_t* out_lengths) {
    auto* v = static_cast<Vocab*>(vocab_handle);
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    std::vector<std::string> toks;
    std::vector<int32_t> ids;
    for (int b = 0; b < n; ++b) {
        toks.clear();
        ids.clear();
        std::string text(texts[b]);
        for (auto& ch : text) ch = (char)std::tolower((unsigned char)ch);
        tokenize_one(text, toks);
        for (auto& t : toks) {
            auto it = v->map.find(t);
            int32_t id = it == v->map.end() ? v->unk : it->second;
            if (caption_drop_prob > 0 && uni(rng) <= caption_drop_prob)
                id = v->unk;
            ids.push_back(id);
        }
        if (caption_drop_prob > 0 && !ids.empty()) {
            int n_del = (int)(ids.size() * caption_drop_prob);
            for (int k = 0; k < n_del && !ids.empty(); ++k) {
                size_t pos = (size_t)(uni(rng) * ids.size());
                if (pos >= ids.size()) pos = ids.size() - 1;
                ids.erase(ids.begin() + pos);
            }
        }
        int32_t* row = out_ids + (size_t)b * max_len;
        std::memset(row, 0, sizeof(int32_t) * max_len);
        // Mirror the Python path's caption_to_ids(...)[:max_len] slice:
        // [<start>, body..., <end>] truncated — an overlong body keeps
        // its tokens and the <end> falls off, identical across paths.
        int32_t len = 0;
        row[len++] = v->start;
        for (int32_t id : ids) {
            if (len >= max_len) break;
            row[len++] = id;
        }
        if (len < max_len) row[len++] = v->end;
        out_lengths[b] = len;
    }
}

// ---------------------------------------------------------------------
// Image normalization: uint8 NHWC -> float32 (x/255 - mean) / std
// ---------------------------------------------------------------------

void normalize_images(const uint8_t* in, float* out, int64_t n_pixels,
                      const float* mean, const float* stdv) {
    const float inv255 = 1.0f / 255.0f;
    float scale[3], shift[3];
    for (int c = 0; c < 3; ++c) {
        scale[c] = inv255 / stdv[c];
        shift[c] = -mean[c] / stdv[c];
    }
    for (int64_t i = 0; i < n_pixels; ++i) {
        const uint8_t* p = in + i * 3;
        float* q = out + i * 3;
        q[0] = p[0] * scale[0] + shift[0];
        q[1] = p[1] * scale[1] + shift[1];
        q[2] = p[2] * scale[2] + shift[2];
    }
}

// ---------------------------------------------------------------------
// Padded collation of variable-length id sequences.
// ---------------------------------------------------------------------

void pad_collate(const int32_t* flat, const int32_t* lens, int n,
                 int32_t max_len, int32_t* out, int32_t* out_lens) {
    int64_t offset = 0;
    for (int b = 0; b < n; ++b) {
        int32_t l = lens[b] < max_len ? lens[b] : max_len;
        int32_t* row = out + (size_t)b * max_len;
        std::memset(row, 0, sizeof(int32_t) * max_len);
        std::memcpy(row, flat + offset, sizeof(int32_t) * l);
        out_lens[b] = l;
        offset += lens[b];
    }
}

}  // extern "C"
