// stract_native — native host runtime for the indexing hot path.
//
// Role of the reference's Rust tokenizer/posting-build inner loops
// (crates/core/src/tokenizer/ + tantivy's indexing path): the per-document
// tokenize→lowercase→hash loop dominates index build time, so it runs in C++
// and hands numpy-ready u64 hash streams back through ctypes (no pybind11 in
// this image).
//
// Semantics contract: byte-identical tokens to the Python default tokenizer
// (\p{L}\p{N} runs + str.lower()) — classification/lowercase tables are
// generated from Python's unicodedata (gen_tables.py). Texts containing the
// few codepoints whose lowercase expands (ß → ss) are rejected with -1 and the
// caller uses the Python path.
//
// Hashes: FNV-1a 64 over the lowered UTF-8 token bytes, combined with the
// field seed exactly like utils/hashing.py term_hash (splitmix64 + combine).

#include <cstdint>
#include <cstring>
#include "tables.h"

static inline bool is_alnum_cp(uint32_t cp) {
    if (cp >= MAX_CP) return false;
    return ALNUM_BITS[cp >> 3] & (1u << (cp & 7));
}

static inline uint32_t lower_cp(uint32_t cp) {
    // binary search in the sparse lowercase map
    uint32_t lo = 0, hi = LOWER_N;
    while (lo < hi) {
        uint32_t mid = (lo + hi) / 2;
        if (LOWER_FROM[mid] < cp) lo = mid + 1; else hi = mid;
    }
    if (lo < LOWER_N && LOWER_FROM[lo] == cp) return LOWER_TO[lo];
    return cp;
}

static inline bool needs_fallback(uint32_t cp) {
    uint32_t lo = 0, hi = FALLBACK_N;
    while (lo < hi) {
        uint32_t mid = (lo + hi) / 2;
        if (FALLBACK_CPS[mid] < cp) lo = mid + 1; else hi = mid;
    }
    return lo < FALLBACK_N && FALLBACK_CPS[lo] == cp;
}

// UTF-8 decode one codepoint; returns bytes consumed (0 on invalid).
static inline int decode_utf8(const uint8_t* s, int64_t remaining, uint32_t* cp) {
    uint8_t c = s[0];
    if (c < 0x80) { *cp = c; return 1; }
    if ((c >> 5) == 0x6 && remaining >= 2) {
        *cp = ((c & 0x1F) << 6) | (s[1] & 0x3F);
        return 2;
    }
    if ((c >> 4) == 0xE && remaining >= 3) {
        *cp = ((c & 0x0F) << 12) | ((s[1] & 0x3F) << 6) | (s[2] & 0x3F);
        return 3;
    }
    if ((c >> 3) == 0x1E && remaining >= 4) {
        *cp = ((c & 0x07) << 18) | ((s[1] & 0x3F) << 12) | ((s[2] & 0x3F) << 6) | (s[3] & 0x3F);
        return 4;
    }
    return 0;
}

// Encode one codepoint as UTF-8; returns bytes written.
static inline int encode_utf8(uint32_t cp, uint8_t* out) {
    if (cp < 0x80) { out[0] = (uint8_t)cp; return 1; }
    if (cp < 0x800) {
        out[0] = 0xC0 | (cp >> 6); out[1] = 0x80 | (cp & 0x3F); return 2;
    }
    if (cp < 0x10000) {
        out[0] = 0xE0 | (cp >> 12); out[1] = 0x80 | ((cp >> 6) & 0x3F);
        out[2] = 0x80 | (cp & 0x3F); return 3;
    }
    out[0] = 0xF0 | (cp >> 18); out[1] = 0x80 | ((cp >> 12) & 0x3F);
    out[2] = 0x80 | ((cp >> 6) & 0x3F); out[3] = 0x80 | (cp & 0x3F); return 4;
}

static const uint64_t FNV_OFFSET = 0xCBF29CE484222325ULL;
static const uint64_t FNV_PRIME = 0x100000001B3ULL;

static inline uint64_t fnv1a_update(uint64_t h, const uint8_t* data, int len) {
    for (int i = 0; i < len; i++) { h ^= data[i]; h *= FNV_PRIME; }
    return h;
}

static inline uint64_t splitmix64(uint64_t x) {
    x += 0x9E3779B97F4A7C15ULL;
    uint64_t z = x;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

static inline uint64_t combine(uint64_t a, uint64_t b) {
    return splitmix64(a ^ (b << 1));
}

extern "C" {

// Tokenize UTF-8 `text` and write per-token FNV hashes (of lowered token
// bytes) into `out`. Also emits bigram/trigram hashes (FNV over concatenated
// lowered token bytes) when the out pointers are non-null.
// Returns the number of unigram tokens, or -1 if the text needs the Python
// fallback, or -2 if an output buffer is too small.
int64_t tokenize_hashes(
    const char* text, int64_t len,
    uint64_t* out_uni, int64_t max_uni,
    uint64_t* out_bi, int64_t max_bi,
    uint64_t* out_tri, int64_t max_tri
) {
    const uint8_t* s = (const uint8_t*)text;
    int64_t i = 0;
    int64_t n_uni = 0, n_bi = 0, n_tri = 0;
    uint64_t h = FNV_OFFSET;          // current token hash
    bool in_token = false;
    // rolling lowered-byte buffers of the previous two tokens for n-grams
    uint8_t tokbuf[3][256];
    int toklen[3] = {0, 0, 0};        // circular: index n_uni % 3
    int curlen = 0;
    uint8_t curbuf[256];
    bool cur_overflow = false;

    auto finish_token = [&]() -> bool {
        if (!in_token) return true;
        if (n_uni >= max_uni) return false;
        out_uni[n_uni] = h;
        // store lowered bytes for n-grams (tokens longer than 256B overflow:
        // ngrams then hash only the stored prefix — mark by disabling ngrams)
        int slot = (int)(n_uni % 3);
        if (!cur_overflow) {
            memcpy(tokbuf[slot], curbuf, curlen);
            toklen[slot] = curlen;
        } else {
            toklen[slot] = -1;
        }
        n_uni++;
        // bigram over tokens (n_uni-2, n_uni-1)
        if (out_bi && n_uni >= 2) {
            int a = (int)((n_uni - 2) % 3), b = (int)((n_uni - 1) % 3);
            if (toklen[a] >= 0 && toklen[b] >= 0 && n_bi < max_bi) {
                uint64_t hb = FNV_OFFSET;
                hb = fnv1a_update(hb, tokbuf[a], toklen[a]);
                hb = fnv1a_update(hb, tokbuf[b], toklen[b]);
                out_bi[n_bi++] = hb;
            }
        }
        if (out_tri && n_uni >= 3) {
            int a = (int)((n_uni - 3) % 3), b = (int)((n_uni - 2) % 3), c = (int)((n_uni - 1) % 3);
            if (toklen[a] >= 0 && toklen[b] >= 0 && toklen[c] >= 0 && n_tri < max_tri) {
                uint64_t ht = FNV_OFFSET;
                ht = fnv1a_update(ht, tokbuf[a], toklen[a]);
                ht = fnv1a_update(ht, tokbuf[b], toklen[b]);
                ht = fnv1a_update(ht, tokbuf[c], toklen[c]);
                out_tri[n_tri++] = ht;
            }
        }
        h = FNV_OFFSET;
        curlen = 0;
        cur_overflow = false;
        in_token = false;
        return true;
    };

    while (i < len) {
        uint32_t cp;
        int nb = decode_utf8(s + i, len - i, &cp);
        if (nb == 0) { i++; continue; }  // invalid byte: treat as separator
        if (is_alnum_cp(cp)) {
            if (needs_fallback(cp)) return -1;
            uint32_t low = lower_cp(cp);
            uint8_t enc[4];
            int el = encode_utf8(low, enc);
            h = fnv1a_update(h, enc, el);
            if (curlen + el <= 256) {
                memcpy(curbuf + curlen, enc, el);
                curlen += el;
            } else {
                cur_overflow = true;
            }
            in_token = true;
        } else {
            if (!finish_token()) return -2;
        }
        i += nb;
    }
    if (!finish_token()) return -2;
    if (out_bi) out_bi[n_bi < max_bi ? n_bi : max_bi - 1] = out_bi[0];  // no-op guard
    return n_uni;
}

// Counts of emitted ngrams for the last call are derivable: bi = max(uni-1,0),
// tri = max(uni-2,0) when no token overflowed; expose explicit counting:
int64_t ngram_counts(int64_t n_uni, int64_t* n_bi, int64_t* n_tri) {
    *n_bi = n_uni >= 2 ? n_uni - 1 : 0;
    *n_tri = n_uni >= 3 ? n_uni - 2 : 0;
    return 0;
}

// Combine token hashes with a field seed: out[i] = combine(splitmix64(field), h[i])
void combine_field(const uint64_t* hashes, int64_t n, uint64_t field_id, uint64_t* out) {
    uint64_t seed = splitmix64(field_id);
    for (int64_t i = 0; i < n; i++) out[i] = combine(seed, hashes[i]);
}

// Stage-B factor preparation (host half of ops.scoring.score_driver): for each
// query slot, look up every candidate doc in the slot's doc-ordered posting
// range and write its packed factor word (0 when absent).
//
// postings: int32 row matrix [n, 3] = (doc, factors, aux); only cols 0/1 read.
// cand MUST be sorted ascending (the Python wrapper sorts and un-permutes) —
// each slot then walks its range monotonically: the next candidate's binary
// search starts at the previous hit position, so a slot costs
// O(K * log(l / K)) instead of K independent log(l) probes, and the touched
// posting pages stream forward instead of bouncing.
void slot_factors(
    const int32_t* postings,
    const int64_t* starts, const int64_t* lens, int64_t P,
    const int32_t* cand, int64_t K,
    int32_t* out)
{
    for (int64_t p = 0; p < P; p++) {
        int64_t l = lens[p];
        int32_t* o = out + p * K;
        if (l == 0) { memset(o, 0, (size_t)K * 4); continue; }
        int64_t lo = starts[p];
        const int64_t end = starts[p] + l;
        for (int64_t k = 0; k < K; k++) {
            const int32_t d = cand[k];
            int64_t a = lo, b = end;
            // gallop forward from the last position, then binary search
            int64_t step = 1;
            while (a + step < b && postings[(a + step) * 3] < d) {
                a += step;
                step <<= 1;
            }
            if (a + step < b) b = a + step + 1;
            while (a < b) {
                int64_t mid = (a + b) >> 1;
                if (postings[mid * 3] < d) a = mid + 1; else b = mid;
            }
            o[k] = (a < end && postings[a * 3] == d) ? postings[a * 3 + 1] : 0;
            lo = a;
        }
    }
}

}  // extern "C"
