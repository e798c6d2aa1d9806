// Copyright 2026 The sentencepiece-tpu Authors.
//
// Licensed under the Apache License, Version 2.0 (the "License");
// you may not use this file except in compliance with the License.
//
// Native host runtime: the hot host-side paths of the framework, exposed
// as a plain C ABI consumed via ctypes (sentencepiece_tpu/native/__init__.py).
//
// Components (each mirrors the corresponding reference component's ROLE but
// is written against this package's own data structures):
//   * darts double-array BUILDER over the wire format documented in
//     sentencepiece_tpu/utils/darts.py (reference third_party/darts_clone
//     builds the same unit format via a DAWG; only blob semantics match).
//   * full text NORMALIZER scan (reference src/normalizer.cc:88-300
//     semantics; same contract as normalizer/normalize.py) — charsmap
//     longest match + UTF-8 fallback + space rules + alignment.
//   * SA-IS suffix array over int32 alphabets (replaces vendored
//     third_party/esaxx/sais.hxx for unigram seed extraction at scale).

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// darts double-array builder
// ---------------------------------------------------------------------------
// keys: concatenated key bytes; key_offs[i]..key_offs[i+1] bounds key i
// (sorted unique, no NUL bytes); values: int32 per key.
// Returns number of units written to *out (caller frees with spm_free).

struct TrieNode {
  int32_t first_child = -1;   // index into nodes
  int32_t next_sibling = -1;
  int32_t value = -1;
  uint8_t label = 0;
  bool terminal = false;
};

static void trie_insert(std::vector<TrieNode> &nodes, const uint8_t *key,
                        int64_t len, int32_t value) {
  int32_t cur = 0;
  for (int64_t i = 0; i < len; ++i) {
    uint8_t c = key[i];
    int32_t child = nodes[cur].first_child;
    int32_t prev = -1;
    while (child != -1 && nodes[child].label != c) {
      prev = child;
      child = nodes[child].next_sibling;
    }
    if (child == -1) {
      nodes.push_back(TrieNode());
      child = (int32_t)nodes.size() - 1;
      nodes[child].label = c;
      // keep sibling lists label-sorted by appending after scan
      if (prev == -1) {
        nodes[child].next_sibling = nodes[cur].first_child;
        nodes[cur].first_child = child;
      } else {
        nodes[child].next_sibling = nodes[prev].next_sibling;
        nodes[prev].next_sibling = child;
      }
    }
    cur = child;
  }
  nodes[cur].terminal = true;
  nodes[cur].value = value;
}

int64_t spm_darts_build(const uint8_t *keys, const int64_t *key_offs,
                        const int32_t *values, int64_t n_keys,
                        uint32_t **out_units) {
  // explicit trie (keys must be sorted; sortedness not required for
  // correctness here since children are label-ordered lists)
  std::vector<TrieNode> nodes(1);
  for (int64_t i = 0; i < n_keys; ++i) {
    int64_t off = key_offs[i], len = key_offs[i + 1] - key_offs[i];
    if (len <= 0) return -1;
    trie_insert(nodes, keys + off, len, values[i]);
  }

  size_t cap = 1024;
  while (cap < nodes.size() * 2) cap <<= 1;
  std::vector<uint32_t> units(cap, 0);
  std::vector<bool> used(cap, false);
  std::vector<bool> base_taken(cap, false);
  used[0] = true;

  auto ensure = [&](size_t need) {
    while (need >= cap) {
      size_t old = cap;
      cap <<= 1;
      units.resize(cap, 0);
      used.resize(cap, false);
      base_taken.resize(cap, false);
      (void)old;
    }
  };

  const uint32_t kOffsetMaxSmall = 1u << 21;
  size_t search_hint = 1;

  // BFS placement
  struct QItem { int32_t node; uint32_t pos; uint8_t entry_label; };
  std::vector<QItem> queue;
  queue.push_back({0, 0, 0});
  for (size_t qi = 0; qi < queue.size(); ++qi) {
    QItem it = queue[qi];
    TrieNode &nd = nodes[it.node];
    // collect labels: 0 first if terminal, then children label-ascending
    uint8_t labels[257];
    int nl = 0;
    if (nd.terminal) labels[nl++] = 0;
    {
      uint8_t tmp[256];
      int nt = 0;
      for (int32_t ch = nd.first_child; ch != -1;
           ch = nodes[ch].next_sibling)
        tmp[nt++] = nodes[ch].label;
      // sort ascending (labels are unique)
      for (int a = 1; a < nt; ++a) {
        uint8_t v = tmp[a];
        int b = a - 1;
        while (b >= 0 && tmp[b] > v) { tmp[b + 1] = tmp[b]; --b; }
        tmp[b + 1] = v;
      }
      for (int a = 0; a < nt; ++a) labels[nl++] = tmp[a];
    }
    // find base
    uint32_t base = 0;
    for (size_t cand = search_hint;; ++cand) {
      ensure(cand + 256);
      if (base_taken[cand]) continue;
      uint32_t off = (uint32_t)cand ^ it.pos;
      bool enc = (off < kOffsetMaxSmall) ||
                 (((off & 0xFF) == 0) && ((off >> 8) < kOffsetMaxSmall));
      if (!enc) continue;
      bool ok = true;
      for (int a = 0; a < nl; ++a) {
        size_t slot = cand ^ labels[a];
        ensure(slot);
        if (used[slot]) { ok = false; break; }
      }
      if (ok) { base = (uint32_t)cand; break; }
    }
    // advance hint past fully-used prefix
    while (search_hint < cap && (used[search_hint] ||
                                 base_taken[search_hint]))
      ++search_hint;
    base_taken[base] = true;
    for (int a = 0; a < nl; ++a) {
      size_t slot = base ^ labels[a];
      ensure(slot);
      used[slot] = true;
    }
    // write this node's unit
    uint32_t off = it.pos ^ base;
    uint32_t unit;
    if (off < kOffsetMaxSmall) {
      unit = off << 10;
    } else {
      unit = ((off >> 8) << 10) | (1u << 9);
    }
    if (nd.terminal) unit |= 1u << 8;
    unit |= it.entry_label;
    ensure(it.pos);
    units[it.pos] = unit;
    if (nd.terminal) {
      units[base] = 0x80000000u | (uint32_t)nd.value;
    }
    for (int32_t ch = nd.first_child; ch != -1;
         ch = nodes[ch].next_sibling) {
      queue.push_back({ch, base ^ nodes[ch].label, nodes[ch].label});
    }
  }

  // top + pad to 256 boundary, filler 0xFFFFFFFF
  size_t top = 0;
  for (size_t i = 0; i < cap; ++i)
    if (used[i]) top = i + 1;
  size_t padded = ((top - 1) | 255) + 1;
  uint32_t *out = new uint32_t[padded];
  for (size_t i = 0; i < padded; ++i)
    out[i] = (i < top && used[i]) ? units[i] : 0xFFFFFFFFu;
  *out_units = out;
  return (int64_t)padded;
}

void spm_free(void *p) { delete[] (uint32_t *)p; }
void spm_free_u8(void *p) { delete[] (uint8_t *)p; }
void spm_free_i64(void *p) { delete[] (int64_t *)p; }

// ---------------------------------------------------------------------------
// darts traversal helpers
// ---------------------------------------------------------------------------

static inline uint32_t unit_offset(uint32_t u) {
  return (u >> 10) << ((u & (1u << 9)) >> 6);
}
static inline uint32_t unit_label(uint32_t u) {
  return u & ((1u << 31) | 0xFF);
}

// Longest prefix match starting at data[pos]; returns length (0 = none),
// *value = leaf value of the longest match.
static int darts_longest(const uint32_t *units, int64_t n_units,
                         const uint8_t *data, int64_t pos, int64_t n,
                         int32_t *value) {
  uint32_t node_pos = 0;
  uint32_t unit = units[0];
  node_pos ^= unit_offset(unit);
  int best = 0;
  for (int64_t i = pos; i < n; ++i) {
    uint32_t c = data[i];
    node_pos ^= c;
    if ((int64_t)node_pos >= n_units) break;
    unit = units[node_pos];
    if (unit_label(unit) != c) break;
    node_pos ^= unit_offset(unit);
    if (unit & (1u << 8)) {
      best = (int)(i - pos + 1);
      *value = (int32_t)(units[node_pos] & 0x7FFFFFFF);
    }
  }
  return best;
}

// ---------------------------------------------------------------------------
// normalizer (reference src/normalizer.cc:88-300 semantics)
// ---------------------------------------------------------------------------

static int utf8_char_len(const uint8_t *d, int64_t pos, int64_t n,
                         bool *valid) {
  int32_t b0 = d[pos];
  int64_t rem = n - pos;
  *valid = true;
  if (b0 < 0x80) return 1;
  if ((b0 & 0xE0) == 0xC0 && rem >= 2 && (d[pos + 1] & 0xC0) == 0x80) {
    int cp = ((b0 & 0x1F) << 6) | (d[pos + 1] & 0x3F);
    if (cp >= 0x80) return 2;
  } else if ((b0 & 0xF0) == 0xE0 && rem >= 3 &&
             (d[pos + 1] & 0xC0) == 0x80 && (d[pos + 2] & 0xC0) == 0x80) {
    int cp = ((b0 & 0x0F) << 12) | ((d[pos + 1] & 0x3F) << 6) |
             (d[pos + 2] & 0x3F);
    if (cp >= 0x800 && !(cp >= 0xD800 && cp <= 0xDFFF)) return 3;
  } else if ((b0 & 0xF8) == 0xF0 && rem >= 4 &&
             (d[pos + 1] & 0xC0) == 0x80 && (d[pos + 2] & 0xC0) == 0x80 &&
             (d[pos + 3] & 0xC0) == 0x80) {
    int cp = ((b0 & 0x07) << 18) | ((d[pos + 1] & 0x3F) << 12) |
             ((d[pos + 2] & 0x3F) << 6) | (d[pos + 3] & 0x3F);
    if (cp >= 0x10000 && cp <= 0x10FFFF) return 4;
  }
  *valid = false;
  return 1;
}

// Normalize one string. Returns output length; out must have room for
// n * 13 + 8 bytes, n2o for (that + 1) int64s.
// matcher_units may be null (no user-defined symbols).
int64_t spm_normalize(const uint32_t *units, int64_t n_units,
                      const uint8_t *pool, int64_t pool_len,
                      const uint32_t *matcher_units, int64_t n_matcher,
                      const uint8_t *data, int64_t n,
                      int add_dummy_prefix, int remove_extra_whitespaces,
                      int escape_whitespaces, int suffix_mode,
                      uint8_t *out, int64_t *n2o) {
  static const uint8_t kSpaceSym[3] = {0xE2, 0x96, 0x81};
  static const uint8_t kFFFD[3] = {0xEF, 0xBF, 0xBD};
  if (n == 0) {
    n2o[0] = 0;
    return 0;
  }
  const uint8_t *ws = escape_whitespaces ? kSpaceSym : (const uint8_t *)" ";
  int ws_len = escape_whitespaces ? 3 : 1;

  // chunk fetch at pos: returns (rep pointer, rep len, consumed)
  auto fetch = [&](int64_t pos, const uint8_t **rep, int *rep_len,
                   int *consumed, uint8_t *tmp) {
    if (matcher_units != nullptr) {
      int32_t v;
      int ml = darts_longest(matcher_units, n_matcher, data, pos, n, &v);
      if (ml > 0) {
        *rep = data + pos;
        *rep_len = ml;
        *consumed = ml;
        return;
      }
    }
    int32_t v;
    int ml = units ? darts_longest(units, n_units, data, pos, n, &v) : 0;
    if (ml > 0) {
      int64_t end = v;
      while (end < pool_len && pool[end] != 0) ++end;
      *rep = pool + v;
      *rep_len = (int)(end - v);
      *consumed = ml;
      return;
    }
    bool valid;
    int cl = utf8_char_len(data, pos, n, &valid);
    if (!valid) {
      memcpy(tmp, kFFFD, 3);
      *rep = tmp;
      *rep_len = 3;
      *consumed = 1;
      return;
    }
    *rep = data + pos;
    *rep_len = cl;
    *consumed = cl;
  };

  int64_t consumed = 0, pos = 0, olen = 0;
  uint8_t tmp[8];
  const uint8_t *rep;
  int rep_len, cons;

  if (remove_extra_whitespaces) {
    while (pos < n) {
      fetch(pos, &rep, &rep_len, &cons, tmp);
      if (!(rep_len == 1 && rep[0] == ' ')) break;
      pos += cons;
      consumed += cons;
    }
    if (pos >= n) {
      n2o[0] = consumed;
      return 0;
    }
  }

  auto add_ws = [&]() {
    for (int i = 0; i < ws_len; ++i) {
      out[olen] = ws[i];
      n2o[olen] = consumed;
      ++olen;
    }
  };
  if (!suffix_mode && add_dummy_prefix) add_ws();

  bool is_prev_space = remove_extra_whitespaces;
  while (pos < n) {
    fetch(pos, &rep, &rep_len, &cons, tmp);
    int start = 0;
    if (is_prev_space) {
      while (start < rep_len && rep[start] == ' ') ++start;
    }
    if (start < rep_len) {
      for (int i = start; i < rep_len; ++i) {
        if (escape_whitespaces && rep[i] == ' ') {
          for (int j = 0; j < 3; ++j) {
            out[olen] = kSpaceSym[j];
            n2o[olen] = consumed;
            ++olen;
          }
        } else {
          out[olen] = rep[i];
          n2o[olen] = consumed;
          ++olen;
        }
      }
      is_prev_space = rep[rep_len - 1] == ' ';
    }
    consumed += cons;
    pos += cons;
    if (!remove_extra_whitespaces) is_prev_space = false;
  }

  if (remove_extra_whitespaces) {
    while (olen >= ws_len && memcmp(out + olen - ws_len, ws, ws_len) == 0) {
      olen -= ws_len;
      consumed = n2o[olen];
    }
  }
  if (suffix_mode && add_dummy_prefix) add_ws();
  n2o[olen] = consumed;
  return olen;
}

// ---------------------------------------------------------------------------
// SA-IS suffix array (int32 alphabet)
// ---------------------------------------------------------------------------

static void sais_core(const int32_t *T, int32_t *SA, int64_t n, int64_t K);

static void get_buckets(const int32_t *T, int64_t *bkt, int64_t n, int64_t K,
                        bool end) {
  std::vector<int64_t> cnt(K, 0);
  for (int64_t i = 0; i < n; ++i) cnt[T[i]]++;
  int64_t sum = 0;
  for (int64_t i = 0; i < K; ++i) {
    sum += cnt[i];
    bkt[i] = end ? sum : sum - cnt[i];
  }
}

static void induce_sa(const int32_t *T, int32_t *SA, const uint8_t *ls,
                      int64_t n, int64_t K) {
  std::vector<int64_t> bkt(K);
  get_buckets(T, bkt.data(), n, K, false);
  for (int64_t i = 0; i < n; ++i) {
    int64_t j = SA[i] - 1;
    if (SA[i] > 0 && !ls[j]) SA[bkt[T[j]]++] = (int32_t)j;
  }
  get_buckets(T, bkt.data(), n, K, true);
  for (int64_t i = n - 1; i >= 0; --i) {
    int64_t j = SA[i] - 1;
    if (SA[i] > 0 && ls[j]) SA[--bkt[T[j]]] = (int32_t)j;
  }
}

static void sais_core(const int32_t *T, int32_t *SA, int64_t n, int64_t K) {
  if (n == 0) return;
  if (n == 1) { SA[0] = 0; return; }
  std::vector<uint8_t> ls(n);  // 1 = S-type
  ls[n - 1] = 1;
  for (int64_t i = n - 2; i >= 0; --i)
    ls[i] = (T[i] < T[i + 1] || (T[i] == T[i + 1] && ls[i + 1])) ? 1 : 0;
  auto is_lms = [&](int64_t i) { return i > 0 && ls[i] && !ls[i - 1]; };

  std::vector<int64_t> bkt(K);
  for (int64_t i = 0; i < n; ++i) SA[i] = -1;
  get_buckets(T, bkt.data(), n, K, true);
  for (int64_t i = 1; i < n; ++i)
    if (is_lms(i)) SA[--bkt[T[i]]] = (int32_t)i;
  induce_sa(T, SA, ls.data(), n, K);

  // compact LMS substrings, name them
  int64_t n1 = 0;
  for (int64_t i = 0; i < n; ++i)
    if (is_lms(SA[i])) SA[n1++] = SA[i];
  for (int64_t i = n1; i < n; ++i) SA[i] = -1;
  int64_t name = 0, prev = -1;
  for (int64_t i = 0; i < n1; ++i) {
    int64_t p = SA[i];
    bool diff = false;
    if (prev == -1) {
      diff = true;
    } else {
      for (int64_t d = 0; d < n; ++d) {
        if (T[p + d] != T[prev + d] || ls[p + d] != ls[prev + d]) {
          diff = true;
          break;
        }
        if (d > 0 && (is_lms(p + d) || is_lms(prev + d))) break;
      }
    }
    if (diff) { ++name; prev = p; }
    SA[n1 + p / 2] = (int32_t)(name - 1);
  }
  int64_t k = n - 1;
  for (int64_t i = n - 1; i >= n1; --i)
    if (SA[i] >= 0) SA[k--] = SA[i];

  int32_t *SA1 = SA, *T1 = SA + n - n1;
  if (name < n1) {
    sais_core(T1, SA1, n1, name);
  } else {
    for (int64_t i = 0; i < n1; ++i) SA1[T1[i]] = (int32_t)i;
  }
  // map back
  std::vector<int32_t> lms(n1);
  int64_t m = 0;
  for (int64_t i = 1; i < n; ++i)
    if (is_lms(i)) lms[m++] = (int32_t)i;
  for (int64_t i = 0; i < n1; ++i) SA1[i] = lms[SA1[i]];
  for (int64_t i = n1; i < n; ++i) SA[i] = -1;
  get_buckets(T, bkt.data(), n, K, true);
  for (int64_t i = n1 - 1; i >= 0; --i) {
    int64_t j = SA[i];
    SA[i] = -1;
    SA[--bkt[T[j]]] = (int32_t)j;
  }
  induce_sa(T, SA, ls.data(), n, K);
}

// Suffix array of int32 sequence with alphabet size K.
void spm_sais(const int32_t *T, int32_t *SA, int64_t n, int64_t K) {
  sais_core(T, SA, n, K);
}

}  // extern "C"
