// FM-index: build / exact backward search / locate / save / load.
//
// TPU-native replacement for the reference mapper's SeqAn3 bi_fm_index
// dependency (GASMA/mapper/indexer.cpp:23-93 build+cereal-serialize,
// GASMA/mapper/main.cpp:50-77 load+search): a dependency-free C++ FM-index
// over the 2-bit DNA alphabet, exposed via a C ABI for ctypes.
//
// The division of labor mirrors the reference: the index only produces
// CANDIDATE positions (exact seed hits); per-candidate scoring/alignment
// runs batched on the TPU (greedy kernel), like the reference rescoring
// each hit with hurdle_matrix (main.cpp:82-86). Approximate search is done
// pigeonhole-style by the Python driver (split a read with <= e errors
// into e+1 seeds; some seed is exact), so the index itself needs only
// exact backward search.
//
// Structures: suffix array by prefix doubling (O(n log^2 n) build), BWT,
// Occ checkpoints every 64 rows + byte scan, C[] counts, full SA kept for
// O(1) locate (4 bytes/char — sized for the reference mapper's
// demo-scale genomes; checkpointed SA sampling is a straightforward
// extension). Alphabet: sentinel=0 < A=1 < C=2 < G=3 < T=4.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int CKPT = 64;
constexpr uint32_t MAGIC = 0x41534d46;  // "ASMF"

struct FMIndex {
    int64_t n = 0;                 // text length incl. sentinel
    std::vector<uint8_t> bwt;      // [n] symbols 0..4
    std::vector<int32_t> sa;       // [n]
    std::vector<int64_t> C;        // [6] C[c] = #symbols < c
    std::vector<int64_t> occ;      // [(n/CKPT+1) * 5] checkpointed counts
};

void build_sa(const std::vector<uint8_t>& t, std::vector<int32_t>& sa) {
    int64_t n = (int64_t)t.size();
    sa.resize(n);
    std::vector<int32_t> rank(n), tmp(n);
    for (int64_t i = 0; i < n; i++) {
        sa[i] = (int32_t)i;
        rank[i] = t[i];
    }
    for (int64_t k = 1;; k <<= 1) {
        auto cmp = [&](int32_t a, int32_t b) {
            if (rank[a] != rank[b]) return rank[a] < rank[b];
            int32_t ra = a + k < n ? rank[a + k] : -1;
            int32_t rb = b + k < n ? rank[b + k] : -1;
            return ra < rb;
        };
        std::sort(sa.begin(), sa.end(), cmp);
        tmp[sa[0]] = 0;
        for (int64_t i = 1; i < n; i++)
            tmp[sa[i]] = tmp[sa[i - 1]] + (cmp(sa[i - 1], sa[i]) ? 1 : 0);
        rank = tmp;
        if (rank[sa[n - 1]] == n - 1) break;
    }
}

int64_t occ_at(const FMIndex& f, int c, int64_t i) {
    // # of symbol c in bwt[0, i)
    int64_t ck = i / CKPT;
    int64_t cnt = f.occ[ck * 5 + c];
    for (int64_t p = ck * CKPT; p < i; p++) cnt += f.bwt[p] == c;
    return cnt;
}

}  // namespace

extern "C" {

// Build from 2-bit codes (0..3). Returns opaque handle or null.
void* asm_fm_build(const int8_t* codes, int64_t n) {
    auto* f = new FMIndex();
    std::vector<uint8_t> t(n + 1);
    for (int64_t i = 0; i < n; i++) t[i] = (uint8_t)(codes[i] & 3) + 1;
    t[n] = 0;  // sentinel, lexicographically smallest
    f->n = n + 1;
    build_sa(t, f->sa);
    f->bwt.resize(f->n);
    for (int64_t i = 0; i < f->n; i++) {
        int32_t s = f->sa[i];
        f->bwt[i] = s == 0 ? t[f->n - 1] : t[s - 1];
    }
    // C[] and checkpointed occ
    int64_t counts[5] = {0, 0, 0, 0, 0};
    int64_t nck = f->n / CKPT + 1;
    f->occ.assign(nck * 5, 0);
    for (int64_t i = 0; i < f->n; i++) {
        if (i % CKPT == 0)
            for (int c = 0; c < 5; c++) f->occ[(i / CKPT) * 5 + c] = counts[c];
        counts[f->bwt[i]]++;
    }
    f->C.assign(6, 0);
    for (int c = 0; c < 5; c++) f->C[c + 1] = f->C[c] + counts[c];
    return f;
}

void asm_fm_free(void* h) { delete (FMIndex*)h; }

int64_t asm_fm_length(void* h) { return ((FMIndex*)h)->n - 1; }

// Exact backward search of `pattern` (codes 0..3, length plen).
// Writes the suffix-array range [lo, hi); returns hi - lo (hit count).
int64_t asm_fm_search(void* h, const int8_t* pattern, int32_t plen,
                      int64_t* lo_out, int64_t* hi_out) {
    const FMIndex& f = *(FMIndex*)h;
    int64_t lo = 0, hi = f.n;
    for (int32_t p = plen - 1; p >= 0 && lo < hi; p--) {
        int c = (pattern[p] & 3) + 1;
        lo = f.C[c] + occ_at(f, c, lo);
        hi = f.C[c] + occ_at(f, c, hi);
    }
    *lo_out = lo;
    *hi_out = hi;
    return hi > lo ? hi - lo : 0;
}

// Text positions for SA range [lo, hi), up to cap. Returns count written.
int64_t asm_fm_locate(void* h, int64_t lo, int64_t hi, int64_t cap,
                      int64_t* positions) {
    const FMIndex& f = *(FMIndex*)h;
    int64_t k = 0;
    for (int64_t i = lo; i < hi && k < cap; i++) positions[k++] = f.sa[i];
    return k;
}

// Batched pigeonhole candidate generation: ONE call per read batch
// (replaces a Python loop of per-seed search+locate ctypes calls). For
// each read, split into max_errors+1 seeds (pigeonhole: a read with <= e
// errors has an error-free seed), exact-search each seed, and emit
// candidate window starts. Over-repetitive seeds (SA range larger than
// max_hits_per_seed) are SAMPLED evenly across the range rather than
// skipped — a true site inside a repeat region stays represented (the
// reference's SeqAn3 search enumerates every hit, mapper/main.cpp:67-77;
// sampling + batched TPU rescoring is the scalable middle ground).
// Outputs: out_starts [n_reads * max_cands], out_counts [n_reads].
int64_t asm_fm_candidates(void* h, const int8_t* reads, const int32_t* lens,
                          int64_t n_reads, int32_t stride,
                          int32_t max_errors, int32_t max_hits_per_seed,
                          int32_t max_cands, int64_t* out_starts,
                          int32_t* out_counts) {
    const FMIndex& f = *(FMIndex*)h;
    int64_t total = 0;
    std::vector<int64_t> cands;
    for (int64_t r = 0; r < n_reads; r++) {
        cands.clear();
        const int8_t* codes = reads + r * stride;
        int32_t length = lens[r];
        int32_t n_seeds = max_errors + 1;
        out_counts[r] = 0;
        if (length < n_seeds || length > stride) continue;
        int32_t seed_len = length / n_seeds;
        for (int32_t s = 0; s < n_seeds; s++) {
            int32_t off = s * seed_len;
            int64_t lo = 0, hi = f.n;
            for (int32_t p = off + seed_len - 1; p >= off && lo < hi; p--) {
                int c = (codes[p] & 3) + 1;
                lo = f.C[c] + occ_at(f, c, lo);
                hi = f.C[c] + occ_at(f, c, hi);
            }
            int64_t range = hi - lo;
            if (range <= 0) continue;
            // evenly sample oversize ranges instead of dropping the seed
            int64_t take = range <= max_hits_per_seed ? range
                                                      : max_hits_per_seed;
            for (int64_t t = 0; t < take; t++) {
                int64_t i = lo + (range <= max_hits_per_seed
                                      ? t
                                      : (t * range) / take);
                int64_t start = (int64_t)f.sa[i] - off;
                if (start >= -(int64_t)max_errors)
                    cands.push_back(start < 0 ? 0 : start);
            }
        }
        std::sort(cands.begin(), cands.end());
        cands.erase(std::unique(cands.begin(), cands.end()), cands.end());
        int32_t k = (int32_t)std::min<int64_t>(cands.size(), max_cands);
        for (int32_t t = 0; t < k; t++)
            out_starts[r * max_cands + t] = cands[t];
        out_counts[r] = k;
        total += k;
    }
    return total;
}

// ---- serialization (the reference uses cereal, indexer.cpp:35-44) ------

int32_t asm_fm_save(void* h, const char* path) {
    const FMIndex& f = *(FMIndex*)h;
    FILE* fp = fopen(path, "wb");
    if (!fp) return -1;
    uint32_t magic = MAGIC;
    fwrite(&magic, 4, 1, fp);
    fwrite(&f.n, 8, 1, fp);
    fwrite(f.bwt.data(), 1, f.n, fp);
    fwrite(f.sa.data(), 4, f.n, fp);
    fwrite(f.C.data(), 8, 6, fp);
    int64_t nocc = (int64_t)f.occ.size();
    fwrite(&nocc, 8, 1, fp);
    fwrite(f.occ.data(), 8, nocc, fp);
    fclose(fp);
    return 0;
}

void* asm_fm_load(const char* path) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return nullptr;
    uint32_t magic = 0;
    if (fread(&magic, 4, 1, fp) != 1 || magic != MAGIC) {
        fclose(fp);
        return nullptr;
    }
    auto* f = new FMIndex();
    bool ok = fread(&f->n, 8, 1, fp) == 1;
    if (ok) {
        f->bwt.resize(f->n);
        f->sa.resize(f->n);
        f->C.resize(6);
        ok = fread(f->bwt.data(), 1, f->n, fp) == (size_t)f->n &&
             fread(f->sa.data(), 4, f->n, fp) == (size_t)f->n &&
             fread(f->C.data(), 8, 6, fp) == 6;
    }
    int64_t nocc = 0;
    if (ok) ok = fread(&nocc, 8, 1, fp) == 1;
    if (ok) {
        f->occ.resize(nocc);
        ok = fread(f->occ.data(), 8, nocc, fp) == (size_t)nocc;
    }
    fclose(fp);
    if (!ok) {
        delete f;
        return nullptr;
    }
    return f;
}

}  // extern "C"
