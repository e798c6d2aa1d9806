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

#include <algorithm>
#include <cstdint>
#include <deque>
#include <set>
#include <unordered_set>
#include <string_view>
#include <unordered_map>
#include <functional>
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

// DAWG hash-consing: canonicalize equal subtrees bottom-up so shared
// suffixes occupy one set of child slots (darts-clone does the same via an
// explicit DAWG; this is why its blobs are ~8x smaller than a plain trie
// layout). Traversal semantics are unchanged: every incoming edge gets its
// own unit whose offset points at the shared state's base.
int64_t spm_darts_build(const uint8_t *keys, const int64_t *key_offs,
                        const int32_t *values, int64_t n_keys,
                        uint32_t **out_units) {
  std::vector<TrieNode> nodes(1);
  for (int64_t i = 0; i < n_keys; ++i) {
    int64_t off = key_offs[i], len = key_offs[i + 1] - key_offs[i];
    if (len <= 0) return -1;
    trie_insert(nodes, keys + off, len, values[i]);
  }
  const int64_t N = (int64_t)nodes.size();

  // post-order over the trie
  std::vector<int32_t> post;
  post.reserve(N);
  {
    std::vector<std::pair<int32_t, int32_t>> stack;  // (node, child cursor)
    stack.push_back({0, nodes[0].first_child});
    while (!stack.empty()) {
      auto &top = stack.back();
      if (top.second == -1) {
        post.push_back(top.first);
        stack.pop_back();
        if (!stack.empty())
          stack.back().second = nodes[stack.back().second].next_sibling;
      } else {
        stack.push_back({top.second, nodes[top.second].first_child});
      }
    }
  }

  // hash-cons: canonical id per signature
  struct SigHash {
    size_t operator()(const std::string &s) const {
      return std::hash<std::string>()(s);
    }
  };
  std::vector<int32_t> canon(N, -1);
  std::unordered_map<std::string, int32_t> interned;
  std::vector<std::vector<std::pair<uint8_t, int32_t>>> state_children;
  std::vector<int32_t> state_value;   // -1 = not terminal
  for (int32_t nid : post) {
    std::string sig;
    sig.reserve(16);
    int32_t val = nodes[nid].terminal ? nodes[nid].value : -1;
    sig.append((const char *)&val, 4);
    std::vector<std::pair<uint8_t, int32_t>> kids;
    for (int32_t ch = nodes[nid].first_child; ch != -1;
         ch = nodes[ch].next_sibling)
      kids.push_back({nodes[ch].label, canon[ch]});
    // label-ascending for a canonical signature
    for (size_t a = 1; a < kids.size(); ++a) {
      auto v = kids[a];
      size_t b = a;
      while (b > 0 && kids[b - 1].first > v.first) {
        kids[b] = kids[b - 1];
        --b;
      }
      kids[b] = v;
    }
    for (auto &kv : kids) {
      sig.push_back((char)kv.first);
      sig.append((const char *)&kv.second, 4);
    }
    auto it = interned.find(sig);
    if (it != interned.end()) {
      canon[nid] = it->second;
    } else {
      int32_t sid = (int32_t)state_children.size();
      interned.emplace(std::move(sig), sid);
      state_children.push_back(std::move(kids));
      state_value.push_back(val);
      canon[nid] = sid;
    }
  }
  const int32_t root = canon[0];
  const int64_t S = (int64_t)state_children.size();

  // base assignment per state + slot reservation
  size_t cap = 1024;
  std::vector<uint32_t> units(cap, 0);
  std::vector<bool> used(cap, false);
  std::vector<bool> base_taken(cap, false);
  used[0] = true;
  auto ensure = [&](size_t need) {
    while (need >= cap) {
      cap <<= 1;
      units.resize(cap, 0);
      used.resize(cap, false);
      base_taken.resize(cap, false);
    }
  };
  const uint32_t kOffsetMaxSmall = 1u << 21;
  size_t search_hint = 1;
  std::vector<uint32_t> state_base(S, 0);
  std::vector<uint8_t> placed(S, 0);

  // place states in post-order of the CANONICAL dag (children first is not
  // required for base assignment, but keeps locality); root placed last
  auto find_base = [&](const std::vector<std::pair<uint8_t, int32_t>> &kids,
                       bool terminal) -> uint32_t {
    uint8_t labels[257];
    int nl = 0;
    if (terminal) labels[nl++] = 0;
    for (auto &kv : kids) labels[nl++] = kv.first;
    for (size_t cand = search_hint;; ++cand) {
      ensure(cand + 256);
      if (base_taken[cand]) continue;
      bool ok = true;
      for (int a = 0; a < nl; ++a) {
        size_t slot = cand ^ labels[a];
        ensure(slot);
        if (used[slot]) { ok = false; break; }
      }
      if (ok) return (uint32_t)cand;
    }
  };
  for (int64_t sid = 0; sid < S; ++sid) {
    bool terminal = state_value[sid] >= 0;
    uint32_t base = find_base(state_children[sid], terminal);
    base_taken[base] = true;
    if (terminal) {
      ensure(base);
      used[base] = true;   // value leaf at base ^ 0
      units[base] = 0x80000000u | (uint32_t)state_value[sid];
    }
    for (auto &kv : state_children[sid]) {
      size_t slot = base ^ kv.first;
      ensure(slot);
      used[slot] = true;
    }
    state_base[sid] = base;
    placed[sid] = 1;
    while (search_hint < cap &&
           (used[search_hint] || base_taken[search_hint]))
      ++search_hint;
  }
  // write edge units: for each state, each child edge's unit lives at
  // parent_base ^ label and points at the child's base
  auto encode_offset = [&](uint32_t pos, uint32_t base) -> uint32_t {
    uint32_t off = pos ^ base;
    if (off < kOffsetMaxSmall) return off << 10;
    return ((off >> 8) << 10) | (1u << 9);
  };
  for (int64_t sid = 0; sid < S; ++sid) {
    uint32_t pbase = state_base[sid];
    for (auto &kv : state_children[sid]) {
      int32_t child = kv.second;
      uint32_t slot = pbase ^ kv.first;
      uint32_t off = slot ^ state_base[child];
      // offset must be encodable; our slots/bases stay well inside 2^21
      // for vocab-scale tries, but guard anyway
      if (!((off < kOffsetMaxSmall) ||
            (((off & 0xFF) == 0) && ((off >> 8) < kOffsetMaxSmall))))
        return -2;
      uint32_t unit = encode_offset(slot, state_base[child]);
      if (state_value[child] >= 0) unit |= 1u << 8;
      unit |= kv.first;
      units[slot] = unit;
    }
  }
  // root entry unit at slot 0
  {
    uint32_t off0 = 0u ^ state_base[root];
    if (!((off0 < kOffsetMaxSmall) ||
          (((off0 & 0xFF) == 0) && ((off0 >> 8) < kOffsetMaxSmall))))
      return -2;
    uint32_t unit = encode_offset(0, state_base[root]);
    if (state_value[root] >= 0) unit |= 1u << 8;
    units[0] = unit;
  }

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

// Depth-banded double-array build — the DEVICE lattice-trie variant.
// Plain trie, no hash-consing (a suffix-shared DAWG state can be
// reached at several depths, but a banded node must live in exactly
// one depth's band). Nodes are placed level by level and every node
// base is drawn from a fresh 256-aligned region, so all positions of
// depth-k nodes fall inside one contiguous band [lo_k, hi_k). The
// device populate walk's step d then gathers from band d+1's SLICE of
// the unit table instead of the whole table (tpu/encode.py
// _populate_lattice): per-step one-hot/MXU lookup cost drops from
// O(total units) to O(band units), ~Sum(K_d)/D smaller.
//
// out_bands: int64 pairs (lo, hi), one per depth 0..n_bands-1; band 0
// is the root block [0, 256). Returns unit count, or -1/-2 like
// spm_darts_build (callers fall back to the unbanded build).
int64_t spm_darts_build_banded(const uint8_t *keys, const int64_t *key_offs,
                               const int32_t *values, int64_t n_keys,
                               uint32_t **out_units, int64_t **out_bands,
                               int64_t *n_bands) {
  std::vector<TrieNode> nodes(1);
  for (int64_t i = 0; i < n_keys; ++i) {
    int64_t off = key_offs[i], len = key_offs[i + 1] - key_offs[i];
    if (len <= 0) return -1;
    trie_insert(nodes, keys + off, len, values[i]);
  }
  const int64_t N = (int64_t)nodes.size();
  std::vector<std::vector<int32_t>> levels;
  {
    std::vector<int32_t> frontier{0};
    while (!frontier.empty()) {
      std::vector<int32_t> nxt;
      for (int32_t nid : frontier)
        for (int32_t ch = nodes[nid].first_child; ch != -1;
             ch = nodes[ch].next_sibling)
          nxt.push_back(ch);
      levels.push_back(std::move(frontier));
      frontier = std::move(nxt);
    }
  }

  size_t cap = 1024;
  std::vector<uint32_t> units(cap, 0);
  std::vector<bool> used(cap, false);
  std::vector<bool> base_taken(cap, false);
  used[0] = true;
  auto ensure = [&](size_t need) {
    while (need >= cap) {
      cap <<= 1;
      units.resize(cap, 0);
      used.resize(cap, false);
      base_taken.resize(cap, false);
    }
  };
  const uint32_t kOffsetMaxSmall = 1u << 21;
  std::vector<uint32_t> node_base(N, 0);
  std::vector<int64_t> bands;  // (lo, hi) pairs, depth-indexed
  bands.push_back(0);
  bands.push_back(256);

  size_t band_lo = 256;  // root block [0,256) is depth-0's band
  for (size_t lev = 0; lev < levels.size(); ++lev) {
    size_t hint = band_lo;
    size_t max_slot = band_lo;
    for (int32_t nid : levels[lev]) {
      uint8_t labels[257];
      int nl = 0;
      if (nodes[nid].terminal) labels[nl++] = 0;
      for (int32_t ch = nodes[nid].first_child; ch != -1;
           ch = nodes[ch].next_sibling)
        labels[nl++] = nodes[ch].label;
      ensure(hint + 512);
      while (base_taken[hint]) {
        ++hint;
        ensure(hint + 512);
      }
      size_t base;
      for (size_t cand = hint;; ++cand) {
        ensure(cand + 256);
        if (base_taken[cand]) continue;
        bool ok = true;
        for (int a = 0; a < nl; ++a) {
          size_t slot = cand ^ labels[a];
          if (used[slot]) { ok = false; break; }
        }
        if (ok) { base = cand; break; }
      }
      base_taken[base] = true;
      if (nodes[nid].terminal) {
        used[base] = true;
        units[base] = 0x80000000u | (uint32_t)nodes[nid].value;
        if (base > max_slot) max_slot = base;
      }
      for (int32_t ch = nodes[nid].first_child; ch != -1;
           ch = nodes[ch].next_sibling) {
        size_t slot = base ^ nodes[ch].label;
        used[slot] = true;
        if (slot > max_slot) max_slot = slot;
      }
      node_base[nid] = (uint32_t)base;
      if (nl == 0 && base > max_slot) max_slot = base;
    }
    size_t band_hi = ((max_slot) | 255) + 1;
    bands.push_back((int64_t)band_lo);
    bands.push_back((int64_t)band_hi);
    band_lo = band_hi;
  }

  auto enc_ok = [&](uint32_t off) {
    return (off < kOffsetMaxSmall) ||
           (((off & 0xFF) == 0) && ((off >> 8) < kOffsetMaxSmall));
  };
  auto encode_offset = [&](uint32_t pos, uint32_t base) -> uint32_t {
    uint32_t off = pos ^ base;
    if (off < kOffsetMaxSmall) return off << 10;
    return ((off >> 8) << 10) | (1u << 9);
  };
  for (int64_t nid = 0; nid < N; ++nid) {
    uint32_t pbase = node_base[nid];
    for (int32_t ch = nodes[nid].first_child; ch != -1;
         ch = nodes[ch].next_sibling) {
      uint32_t slot = pbase ^ nodes[ch].label;
      uint32_t off = slot ^ node_base[ch];
      if (!enc_ok(off)) return -2;
      uint32_t unit = encode_offset(slot, node_base[ch]);
      if (nodes[ch].terminal) unit |= 1u << 8;
      unit |= nodes[ch].label;
      units[slot] = unit;
    }
  }
  {
    uint32_t off0 = 0u ^ node_base[0];
    if (!enc_ok(off0)) return -2;
    uint32_t unit = encode_offset(0, node_base[0]);
    if (nodes[0].terminal) unit |= 1u << 8;
    units[0] = unit;
  }

  size_t padded = band_lo;  // already 256-aligned, covers every band
  uint32_t *out = new uint32_t[padded];
  for (size_t i = 0; i < padded; ++i)
    out[i] = used[i] ? units[i] : 0xFFFFFFFFu;
  *out_units = out;
  int64_t *ob = new int64_t[bands.size()];
  for (size_t i = 0; i < bands.size(); ++i) ob[i] = bands[i];
  *out_bands = ob;
  *n_bands = (int64_t)(bands.size() / 2);
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

// Normalize one string. Returns output length, or -2 if out_cap is too
// small (a charsmap replacement may expand arbitrarily — e.g. a custom
// rule mapping one byte to 40 spaces, tripled again by whitespace
// escaping — so callers must handle -2 by growing or falling back).
// out must have out_cap bytes, n2o room for out_cap + 1 int64s.
// matcher_units may be null (no user-defined symbols).
int64_t spm_normalize(const uint32_t *units, int64_t n_units,
                      const uint8_t *pool, int64_t pool_len,
                      const uint32_t *matcher_units, int64_t n_matcher,
                      const uint8_t *data, int64_t n,
                      int add_dummy_prefix, int remove_extra_whitespaces,
                      int escape_whitespaces, int suffix_mode,
                      uint8_t *out, int64_t out_cap, int64_t *n2o) {
  static const uint8_t kSpaceSym[3] = {0xE2, 0x96, 0x81};
  static const uint8_t kFFFD[3] = {0xEF, 0xBF, 0xBD};
  // empty input and the all-whitespace heading skip are EARLY RETURNS
  // in the reference (normalizer.cc:94,115): the alignment stays EMPTY
  // (no final consumed entry). n2o[0] = -1 signals that to the caller.
  if (n == 0) {
    n2o[0] = -1;
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
      n2o[0] = -1;
      return 0;
    }
  }

  auto add_ws = [&]() {
    if (olen + ws_len > out_cap) return false;
    for (int i = 0; i < ws_len; ++i) {
      out[olen] = ws[i];
      n2o[olen] = consumed;
      ++olen;
    }
    return true;
  };
  if (!suffix_mode && add_dummy_prefix && !add_ws()) return -2;

  bool is_prev_space = remove_extra_whitespaces;
  while (pos < n) {
    fetch(pos, &rep, &rep_len, &cons, tmp);
    // worst case every replacement byte is a space expanding to 3 bytes
    if (olen + (int64_t)rep_len * 3 > out_cap) return -2;
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
  if (suffix_mode && add_dummy_prefix && !add_ws()) return -2;
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

// Inclusive int64 prefix sum of a 0/1 byte mask. Single memory-bound
// pass; serves the trainer's corpus char-offset arithmetic
// (trainer_interface.cc:349-383 analog) without pulling a heavyweight
// tensor library into the process for one cumsum.
void spm_cumsum_mask(const uint8_t *mask, int64_t n, int64_t *out) {
  int64_t acc = 0;
  for (int64_t i = 0; i < n; ++i) {
    acc += mask[i];
    out[i] = acc;
  }
}

// Char offsets at byte positions: out[i] = count of UTF-8 char-start
// bytes (non-continuation) in blob[0:offs[i]). offs must be ascending.
// Fuses the loader's mask + prefix-sum + gather into one blob pass so
// the 8-byte-per-input-byte cumsum array is never materialized.
void spm_charoffs_utf8(const uint8_t *blob, const int64_t *offs,
                       int64_t n_offs, int64_t *out) {
  int64_t acc = 0, prev = 0;
  for (int64_t i = 0; i < n_offs; ++i) {
    const int64_t end = offs[i];
    for (int64_t b = prev; b < end; ++b) acc += ((blob[b] & 0xC0) != 0x80);
    prev = end;
    out[i] = acc;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// unigram EM E-step + Viterbi batch (float32-exact trainer hot loops)
// ---------------------------------------------------------------------------
// Mirrors the reference RunEStep thread pool + Lattice::PopulateMarginal /
// Viterbi (unigram_model_trainer.cc:237-287, unigram_model.cc:222-328) with
// identical float semantics: C++ `float` expression evaluation IS the
// reference semantics. Word candidate tables come pre-extracted against the
// seed vocabulary (pos-major, length-ascending — trie match order).

#include <cmath>
#include <thread>

namespace {

static inline float lse_f(float x, float y, bool init) {
  if (init) return y;
  const float vmin = x < y ? x : y;
  const float vmax = x < y ? y : x;
  if (vmax > vmin + 50.0f) return vmax;
  return vmax + log(exp(vmin - vmax) + 1.0);
}

struct WordTables {
  const int32_t *word_len;
  const int64_t *cand_off;
  const int32_t *cand_pos;
  const int32_t *cand_len;
  const int32_t *cand_sid;
  const int32_t *seed_to_cur;
  const float *scores;
  float unk_score;
  const int64_t *freqs;
};

// Builds the per-word node list in reference insertion order and runs
// forward/backward/expected + viterbi. Returns freq * Z; appends viterbi
// token count to *ntok; expected[] accumulated (float += double).
static float marginal_one(const WordTables &T, int64_t wi, float *expected,
                          int64_t *ntok, std::vector<int> &n_pos,
                          std::vector<int> &n_len, std::vector<int> &n_cur,
                          std::vector<uint8_t> &n_unk,
                          std::vector<float> &n_score,
                          std::vector<float> &alpha, std::vector<float> &beta,
                          std::vector<int> &ends_off,
                          std::vector<int> &ends_nodes,
                          std::vector<int> &begins_off,
                          std::vector<int> &begins_nodes,
                          std::vector<float> &best_score,
                          std::vector<uint8_t> &best_has,
                          std::vector<int> &best_node) {
  const int L = T.word_len[wi];
  if (L == 0) return 0.0f;
  n_pos.clear(); n_len.clear(); n_cur.clear(); n_unk.clear();
  n_score.clear();
  const int64_t c0 = T.cand_off[wi], c1 = T.cand_off[wi + 1];
  int64_t ci = c0;
  for (int pos = 0; pos < L; ++pos) {
    bool has_single = false;
    while (ci < c1 && T.cand_pos[ci] == pos) {
      int cur = T.seed_to_cur[T.cand_sid[ci]];
      if (cur >= 0) {
        n_pos.push_back(pos);
        n_len.push_back(T.cand_len[ci]);
        n_cur.push_back(cur);
        n_unk.push_back(0);
        n_score.push_back(T.scores[cur]);
        if (T.cand_len[ci] == 1) has_single = true;
      }
      ++ci;
    }
    if (!has_single) {
      n_pos.push_back(pos);
      n_len.push_back(1);
      n_cur.push_back(0);   // trainer-model UNK carries id 0
      n_unk.push_back(1);
      n_score.push_back(T.unk_score);
    }
  }
  const int n = (int)n_pos.size();
  const int BOS = n, EOS = n + 1;
  alpha.assign(n + 2, 0.0f);
  beta.assign(n + 2, 0.0f);
  // ends_at / begins_at as CSR over positions 0..L
  ends_off.assign(L + 2, 0);
  begins_off.assign(L + 2, 0);
  for (int k = 0; k < n; ++k) {
    ends_off[n_pos[k] + n_len[k] + 1]++;
    begins_off[n_pos[k] + 1]++;
  }
  ends_off[0 + 1] += 1;   // BOS ends at 0 (first)
  begins_off[L + 1] += 1; // EOS begins at L (first)
  for (int p = 0; p < L + 1; ++p) {
    ends_off[p + 1] += ends_off[p];
    begins_off[p + 1] += begins_off[p];
  }
  ends_nodes.assign(ends_off[L + 1], -1);
  begins_nodes.assign(begins_off[L + 1], -1);
  std::vector<int> ecur(L + 1, 0), bcur(L + 1, 0);
  // insertion order: BOS/EOS first at their positions, then nodes in
  // creation order (matches Lattice::SetSentence then PopulateNodes)
  ends_nodes[ends_off[0] + ecur[0]++] = BOS;
  begins_nodes[begins_off[L] + bcur[L]++] = EOS;
  for (int k = 0; k < n; ++k) {
    int ep = n_pos[k] + n_len[k];
    ends_nodes[ends_off[ep] + ecur[ep]++] = k;
    begins_nodes[begins_off[n_pos[k]] + bcur[n_pos[k]]++] = k;
  }
  auto node_score = [&](int k) -> float {
    return k >= n ? 0.0f : n_score[k];
  };
  // forward
  for (int pos = 0; pos <= L; ++pos) {
    for (int bi = begins_off[pos]; bi < begins_off[pos + 1]; ++bi) {
      int r = begins_nodes[bi];
      float acc = 0.0f;
      for (int ei = ends_off[pos]; ei < ends_off[pos + 1]; ++ei) {
        int l = ends_nodes[ei];
        acc = lse_f(acc, node_score(l) + alpha[l], ei == ends_off[pos]);
      }
      alpha[r] = acc;
    }
  }
  const float Z = alpha[EOS];
  // backward
  for (int pos = L; pos >= 0; --pos) {
    for (int ei = ends_off[pos]; ei < ends_off[pos + 1]; ++ei) {
      int l = ends_nodes[ei];
      float acc = 0.0f;
      for (int bi = begins_off[pos]; bi < begins_off[pos + 1]; ++bi) {
        int r = begins_nodes[bi];
        acc = lse_f(acc, node_score(r) + beta[r], bi == begins_off[pos]);
      }
      beta[l] = acc;
    }
  }
  const float freq = (float)T.freqs[wi];
  for (int k = 0; k < n; ++k) {
    expected[n_cur[k]] += freq * exp(alpha[k] + n_score[k] + beta[k] - Z);
  }
  // viterbi token count (float32 strict '>', insertion order)
  best_score.assign(L + 1, 0.0f);
  best_has.assign(L + 1, 0);
  best_node.assign(L + 1, -1);
  best_has[0] = 1;
  for (int k = 0; k < n; ++k) {
    if (!best_has[n_pos[k]]) continue;
    float s = best_score[n_pos[k]] + n_score[k];
    int e = n_pos[k] + n_len[k];
    if (!best_has[e] || s > best_score[e]) {
      best_has[e] = 1;
      best_score[e] = s;
      best_node[e] = k;
    }
  }
  int64_t cnt = 0;
  for (int p = L; p > 0;) {
    int k = best_node[p];
    if (k < 0) break;
    ++cnt;
    p = n_pos[k];
  }
  *ntok += cnt;
  return freq * Z;
}

}  // namespace

extern "C" {

// Returns 0 on success. expected: float[num_cur] (caller-zeroed);
// obj/ntok: outputs.
int spm_unigram_estep(
    int64_t n_words, const int32_t *word_len, const int64_t *cand_off,
    const int32_t *cand_pos, const int32_t *cand_len,
    const int32_t *cand_sid, const int32_t *seed_to_cur,
    const float *scores, float unk_score, const int64_t *freqs,
    int64_t all_freq, int32_t num_threads, int32_t num_cur,
    float *expected, float *obj_out, int64_t *ntok_out) {
  WordTables T{word_len, cand_off, cand_pos, cand_len, cand_sid,
               seed_to_cur, scores, unk_score, freqs};
  std::vector<std::vector<float>> exp_t(num_threads);
  std::vector<float> objs(num_threads, 0.0f);
  std::vector<int64_t> ntoks(num_threads, 0);
  std::vector<std::thread> pool;
  for (int t = 0; t < num_threads; ++t) {
    exp_t[t].assign(num_cur, 0.0f);
    pool.emplace_back([&, t]() {
      std::vector<int> np, nl, nc, eo, en, bo, bn, bnod;
      std::vector<uint8_t> nu, bh;
      std::vector<float> ns, al, be, bs;
      for (int64_t i = t; i < n_words; i += num_threads) {
        float fZ = marginal_one(T, i, exp_t[t].data(), &ntoks[t], np, nl,
                                nc, nu, ns, al, be, eo, en, bo, bn, bs,
                                bh, bnod);
        objs[t] -= fZ / all_freq;
      }
    });
  }
  for (auto &th : pool) th.join();
  // merge in thread order (unigram_model_trainer.cc:274-280)
  float obj = objs[0];
  int64_t ntok = ntoks[0];
  for (int k = 0; k < num_cur; ++k) expected[k] = exp_t[0][k];
  for (int t = 1; t < num_threads; ++t) {
    obj += objs[t];
    ntok += ntoks[t];
    for (int k = 0; k < num_cur; ++k) expected[k] += exp_t[t][k];
  }
  *obj_out = obj;
  *ntok_out = ntok;
  return 0;
}

// Viterbi paths over the corpus for PruneSentencePieces: emits each word's
// path piece ids into out_ids with CSR offsets out_off (caller-allocated:
// out_ids cap = sum(word_len), out_off size n_words+1).
int spm_unigram_viterbi_paths(
    int64_t n_words, const int32_t *word_len, const int64_t *cand_off,
    const int32_t *cand_pos, const int32_t *cand_len,
    const int32_t *cand_sid, const int32_t *seed_to_cur,
    const float *scores, float unk_score,
    int32_t *out_ids, int64_t *out_off) {
  std::vector<int> np, nl, nc, bnod;
  std::vector<uint8_t> nu, bh;
  std::vector<float> ns, bs;
  int64_t w = 0;
  out_off[0] = 0;
  for (int64_t wi = 0; wi < n_words; ++wi) {
    const int L = word_len[wi];
    np.clear(); nl.clear(); nc.clear(); nu.clear(); ns.clear();
    const int64_t c0 = cand_off[wi], c1 = cand_off[wi + 1];
    int64_t ci = c0;
    for (int pos = 0; pos < L; ++pos) {
      bool has_single = false;
      while (ci < c1 && cand_pos[ci] == pos) {
        int cur = seed_to_cur[cand_sid[ci]];
        if (cur >= 0) {
          np.push_back(pos); nl.push_back(cand_len[ci]);
          nc.push_back(cur); nu.push_back(0);
          ns.push_back(scores[cur]);
          if (cand_len[ci] == 1) has_single = true;
        }
        ++ci;
      }
      if (!has_single) {
        np.push_back(pos); nl.push_back(1); nc.push_back(0);
        nu.push_back(1); ns.push_back(unk_score);
      }
    }
    const int n = (int)np.size();
    bs.assign(L + 1, 0.0f);
    bh.assign(L + 1, 0);
    bnod.assign(L + 1, -1);
    bh[0] = 1;
    for (int k = 0; k < n; ++k) {
      if (!bh[np[k]]) continue;
      float s = bs[np[k]] + ns[k];
      int e = np[k] + nl[k];
      if (!bh[e] || s > bs[e]) { bh[e] = 1; bs[e] = s; bnod[e] = k; }
    }
    // backtrace (reversed into place)
    int64_t start = w;
    for (int p = L; p > 0;) {
      int k = bnod[p];
      if (k < 0) break;
      out_ids[w++] = nc[k];
      p = np[k];
    }
    // reverse the emitted span
    for (int64_t a = start, b = w - 1; a < b; ++a, --b) {
      int32_t tmp = out_ids[a]; out_ids[a] = out_ids[b]; out_ids[b] = tmp;
    }
    out_off[wi + 1] = w;
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// host unigram encode (Viterbi over the byte-indexed lattice)
// ---------------------------------------------------------------------------
// Mirror of unigram_model.cc PopulateNodes+Viterbi (same construction as
// the device path in tpu/encode.py): nodes added begin-ascending so the
// strict '>' end-update reproduces the reference longest-piece tie-break.
// Scores arrive pre-folded (user-defined rule applied; UNUSED = -1e30).

extern "C" {

int64_t spm_unigram_encode(const uint32_t *units, int64_t n_units,
                           const float *lat_scores, int32_t unk_id,
                           float unk_score, const uint8_t *data, int64_t n,
                           int32_t *out_ids, int32_t *out_starts,
                           int32_t *out_lens) {
  if (n == 0) return 0;
  const float NEG = -1e30f;
  std::vector<float> best(n + 1, 0.0f);
  std::vector<uint8_t> has(n + 1, 0);
  std::vector<int32_t> bp_len(n + 1, 0), bp_id(n + 1, -1);
  has[0] = 1;
  for (int64_t pos = 0; pos < n; ++pos) {
    if ((data[pos] & 0xC0) == 0x80) continue;  // not a char start
    if (!has[pos]) continue;
    // char byte length for the UNK fallback
    int cl = data[pos] < 0x80 ? 1 : data[pos] < 0xE0 ? 2
             : data[pos] < 0xF0 ? 3 : 4;
    if (pos + cl > n) cl = 1;
    bool has_single = false;
    // walk all trie matches from pos
    uint32_t node_pos = 0;
    uint32_t unit = units[0];
    node_pos ^= unit_offset(unit);
    for (int64_t i = pos; i < n; ++i) {
      uint32_t c = data[i];
      node_pos ^= c;
      if ((int64_t)node_pos >= n_units) break;
      unit = units[node_pos];
      if (unit_label(unit) != c) break;
      node_pos ^= unit_offset(unit);
      if (unit & (1u << 8)) {
        int32_t vid = (int32_t)(units[node_pos] & 0x7FFFFFFF);
        int32_t blen = (int32_t)(i - pos + 1);
        float sc = lat_scores[vid];
        if (sc > NEG / 2) {
          if (blen == cl) has_single = true;
          float s = best[pos] + sc;
          if (!has[pos + blen] || s > best[pos + blen]) {
            has[pos + blen] = 1;
            best[pos + blen] = s;
            bp_len[pos + blen] = blen;
            bp_id[pos + blen] = vid;
          }
        }
      }
    }
    if (!has_single) {
      float s = best[pos] + unk_score;
      if (!has[pos + cl] || s > best[pos + cl]) {
        has[pos + cl] = 1;
        best[pos + cl] = s;
        bp_len[pos + cl] = cl;
        bp_id[pos + cl] = unk_id;
      }
    }
  }
  if (!has[n]) return -1;
  int64_t cnt = 0;
  for (int64_t p = n; p > 0;) {
    int32_t l = bp_len[p];
    if (l <= 0) return -1;
    out_ids[cnt] = bp_id[p];
    out_starts[cnt] = (int32_t)(p - l);
    out_lens[cnt] = l;
    ++cnt;
    p -= l;
  }
  // reverse
  for (int64_t a = 0, b = cnt - 1; a < b; ++a, --b) {
    int32_t t;
    t = out_ids[a]; out_ids[a] = out_ids[b]; out_ids[b] = t;
    t = out_starts[a]; out_starts[a] = out_starts[b]; out_starts[b] = t;
    t = out_lens[a]; out_lens[a] = out_lens[b]; out_lens[b] = t;
  }
  return cnt;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// host BPE encode (agenda merge; reference bpe_model.cc:37-199 semantics)
// ---------------------------------------------------------------------------
// vocab lookups use the model's darts trie (exact-match over the symbol
// span); the agenda is a real std::priority_queue with the reference
// comparator (score desc, then leftmost). Models with UNUSED pieces
// (rev_merge resegmentation) or user-defined matcher take the Python path.

#include <queue>

namespace {

static int32_t darts_exact(const uint32_t *units, int64_t n_units,
                           const uint8_t *key, int64_t len) {
  uint32_t node_pos = 0;
  uint32_t unit = units[0];
  for (int64_t i = 0; i < len; ++i) {
    node_pos ^= unit_offset(unit) ^ (uint32_t)key[i];
    if ((int64_t)node_pos >= n_units) return -1;
    unit = units[node_pos];
    if (unit_label(unit) != (uint32_t)key[i]) return -1;
  }
  if (!(unit & (1u << 8))) return -1;
  return (int32_t)(units[node_pos ^ unit_offset(unit)] & 0x7FFFFFFF);
}

struct BpePair {
  int left;
  int right;
  float score;
  int64_t size;
  int64_t seq;   // insertion order (stale detection is by size)
};
struct BpePairCmp {
  // reference SymbolPairComparator (bpe_model.cc:57-60): top = max score,
  // ties -> smaller left index
  bool operator()(const BpePair &a, const BpePair &b) const {
    return a.score < b.score || (a.score == b.score && a.left > b.left);
  }
};

}  // namespace

extern "C" {

// matcher_units: user-defined symbol trie (may be null). Returns token
// count; -1 when the caller must fall back (should not happen for
// supported models).
int64_t spm_bpe_encode(const uint32_t *units, int64_t n_units,
                       const float *scores, const uint32_t *matcher_units,
                       int64_t n_matcher, int32_t unk_id,
                       const uint8_t *data, int64_t n,
                       int32_t *out_ids, int32_t *out_starts,
                       int32_t *out_lens) {
  if (n == 0) return 0;
  // initial split: user-defined matches frozen, else one char
  std::vector<int64_t> start, len;
  std::vector<uint8_t> freeze;
  for (int64_t pos = 0; pos < n;) {
    int mb = 0;
    bool found = false;
    if (matcher_units != nullptr) {
      int32_t v;
      mb = darts_longest(matcher_units, n_matcher, data, pos, n, &v);
      found = mb > 0;
    }
    if (!found) {
      mb = data[pos] < 0x80 ? 1 : data[pos] < 0xE0 ? 2
           : data[pos] < 0xF0 ? 3 : 4;
      if (pos + mb > n) mb = 1;
    }
    start.push_back(pos);
    len.push_back(mb);
    freeze.push_back(found ? 1 : 0);
    pos += mb;
  }
  const int num = (int)start.size();
  std::vector<int> prev(num), next(num);
  for (int i = 0; i < num; ++i) {
    prev[i] = i - 1;
    next[i] = i + 1 < num ? i + 1 : -1;
  }
  std::priority_queue<BpePair, std::vector<BpePair>, BpePairCmp> agenda;
  int64_t seq = 0;
  auto maybe_add = [&](int l, int r) {
    if (l == -1 || r == -1 || freeze[l] || freeze[r]) return;
    int64_t sz = len[l] + len[r];
    int32_t vid = darts_exact(units, n_units, data + start[l], sz);
    if (vid < 0) return;
    agenda.push({l, r, scores[vid], sz, seq++});
  };
  for (int i = 1; i < num; ++i) maybe_add(i - 1, i);
  while (!agenda.empty()) {
    BpePair top = agenda.top();
    agenda.pop();
    int l = top.left, r = next[top.left];
    if (len[l] == 0 || r == -1 || len[r] == 0 ||
        len[l] + len[r] != top.size)
      continue;
    len[l] += len[r];
    next[l] = next[r];
    if (next[r] >= 0) prev[next[r]] = l;
    len[r] = 0;
    maybe_add(prev[l], l);
    maybe_add(l, next[l]);
  }
  int64_t cnt = 0;
  for (int i = 0; i != -1; i = next[i]) {
    int32_t vid = darts_exact(units, n_units, data + start[i], len[i]);
    out_ids[cnt] = vid >= 0 ? vid : unk_id;
    out_starts[cnt] = (int32_t)start[i];
    out_lens[cnt] = (int32_t)len[i];
    ++cnt;
  }
  return cnt;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// unigram prune: per-piece 2-best analysis (always_keep / alternatives)
// ---------------------------------------------------------------------------
// Mirror of PruneSentencePieces' first phase (unigram_model_trainer.cc:
// 344-365): for each current piece, lattice over its own string, NBest(2)
// via a real std::priority_queue (the reference's agenda). Piece candidate
// tables are passed flattened like the E-step's (built against the current
// piece set by the caller).

extern "C" {

// For piece i: cand rows cand_off[i]..cand_off[i+1] with (pos, len, cur_id)
// over CHAR positions of the piece string; word_len = piece char length.
// Outputs per piece: always_keep[i] (0/1), alternatives CSR (alt_ids,
// alt_off). alt_ids capacity: sum(word_len) is enough.
int spm_unigram_prune_nbest(
    int64_t n_pieces, const int32_t *word_len, const int64_t *cand_off,
    const int32_t *cand_pos, const int32_t *cand_len,
    const int32_t *cand_cur, const float *scores, float unk_score,
    uint8_t *always_keep, int32_t *alt_ids, int64_t *alt_off,
    int32_t num_threads) {
  struct Hyp {
    int node;       // index into nodes, or BOS/EOS
    int parent;     // hyp index
    float fx, gx;
  };
  struct HypCmp {
    const std::vector<Hyp> *h;
    bool operator()(int a, int b) const {
      return (*h)[a].fx < (*h)[b].fx;
    }
  };
  // pieces are independent (the reference's prune thread pool,
  // unigram_model_trainer.cc:389-411): threads process disjoint ranges
  // into local alternative buffers merged in piece order — identical
  // output at any thread count
  int T = num_threads > 0 ? num_threads : 1;
  if (T > n_pieces) T = n_pieces > 0 ? (int)n_pieces : 1;
  std::vector<std::vector<int32_t>> alt_t(T);
  std::vector<std::vector<int32_t>> altcnt_t(T);
  auto work = [&](int t) {
  std::vector<int> np, nl, nc;
  std::vector<uint8_t> nu;
  std::vector<float> ns;
  std::vector<int32_t>& alt_loc = alt_t[t];
  std::vector<int32_t>& alt_cnt = altcnt_t[t];
  const int64_t p_lo = n_pieces * t / T, p_hi = n_pieces * (t + 1) / T;
  alt_cnt.reserve(p_hi - p_lo);
  for (int64_t pi = p_lo; pi < p_hi; ++pi) {
    const int L = word_len[pi];
    const size_t alt_before = alt_loc.size();
    np.clear(); nl.clear(); nc.clear(); nu.clear(); ns.clear();
    int64_t ci = cand_off[pi];
    const int64_t c1 = cand_off[pi + 1];
    for (int pos = 0; pos < L; ++pos) {
      bool has_single = false;
      while (ci < c1 && cand_pos[ci] == pos) {
        np.push_back(pos);
        nl.push_back(cand_len[ci]);
        nc.push_back(cand_cur[ci]);
        nu.push_back(0);
        ns.push_back(scores[cand_cur[ci]]);
        if (cand_len[ci] == 1) has_single = true;
        ++ci;
      }
      if (!has_single) {
        np.push_back(pos); nl.push_back(1); nc.push_back(0);
        nu.push_back(1); ns.push_back(unk_score);
      }
    }
    const int n = (int)np.size();
    const int BOS = n, EOS = n + 1;
    // viterbi backtrace scores
    std::vector<float> bs(L + 1, 0.0f), bt(n + 2, 0.0f);
    std::vector<uint8_t> bh(L + 1, 0);
    bh[0] = 1;
    for (int k = 0; k < n; ++k) {
      if (!bh[np[k]]) continue;
      float s = bs[np[k]] + ns[k];
      bt[k] = s;
      int e = np[k] + nl[k];
      if (!bh[e] || s > bs[e]) { bh[e] = 1; bs[e] = s; }
    }
    bt[BOS] = 0.0f;
    bt[EOS] = bh[L] ? bs[L] : 0.0f;
    // ends_at CSR
    std::vector<int> eoff(L + 2, 0), enodes;
    for (int k = 0; k < n; ++k) eoff[np[k] + nl[k] + 1]++;
    eoff[1] += 1;  // BOS at 0, first
    for (int p = 0; p < L + 1; ++p) eoff[p + 1] += eoff[p];
    enodes.assign(eoff[L + 1], -1);
    std::vector<int> ecur(L + 1, 0);
    enodes[eoff[0] + ecur[0]++] = BOS;
    for (int k = 0; k < n; ++k) {
      int e = np[k] + nl[k];
      enodes[eoff[e] + ecur[e]++] = k;
    }
    auto nscore = [&](int k) { return k >= n ? 0.0f : ns[k]; };
    auto nbegin = [&](int k) { return k == BOS ? 0 : k == EOS ? L : np[k]; };

    std::vector<Hyp> hyps;
    HypCmp cmp{&hyps};
    std::priority_queue<int, std::vector<int>, HypCmp> agenda(cmp);
    hyps.push_back({EOS, -1, nscore(EOS), nscore(EOS)});
    agenda.push(0);
    int found = 0;
    std::vector<int> first_path, second_path;
    while (!agenda.empty()) {
      int hi = agenda.top();
      agenda.pop();
      const Hyp h = hyps[hi];
      if (h.node == BOS) {
        std::vector<int> path;
        for (int cur = h.parent; cur != -1; cur = hyps[cur].parent)
          if (hyps[cur].node != EOS) path.push_back(hyps[cur].node);
        if (found == 0) first_path = path;
        else second_path = path;
        ++found;
        if (found == 2) break;
        continue;
      }
      int pos = nbegin(h.node);
      for (int ei = eoff[pos]; ei < eoff[pos + 1]; ++ei) {
        int l = enodes[ei];
        hyps.push_back({l, hi, bt[l] + h.gx, nscore(l) + h.gx});
        agenda.push((int)hyps.size() - 1);
      }
    }
    // classification (unigram_model_trainer.cc:352-364)
    if (found <= 1) {
      always_keep[pi] = 1;
    } else if ((int)first_path.size() >= 2) {
      always_keep[pi] = 0;
    } else {  // first is the piece itself
      always_keep[pi] = 1;
      for (int k : second_path)
        alt_loc.push_back(nu[k] ? 0 : nc[k]);
    }
    alt_cnt.push_back(static_cast<int32_t>(alt_loc.size() - alt_before));
  }
  };
  if (T == 1) {
    work(0);
  } else {
    std::vector<std::thread> pool_t;
    for (int t = 0; t < T; ++t) pool_t.emplace_back(work, t);
    for (auto &th : pool_t) th.join();
  }
  int64_t aw = 0, w = 0;
  alt_off[0] = 0;
  for (int t = 0; t < T; ++t) {
    memcpy(alt_ids + aw, alt_t[t].data(),
           alt_t[t].size() * sizeof(int32_t));
    for (int32_t c : altcnt_t[t]) {
      aw += c;
      alt_off[++w] = aw;
    }
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Substring -> piece-id matcher for lattice-table construction
// (unigram_model_trainer.cc builds a darts trie per iteration; we build the
// candidate tables once per vocab against a hash index instead).
// Words and keys arrive as concatenated UTF-32 codepoints; fixed-width
// codepoints make every substring a 4-byte-aligned byte span, so matching
// byte spans equals matching codepoint spans. Candidates are emitted in
// (pos asc, len asc) order per word. Returns total candidates, or -1 if cap
// was exceeded.
extern "C" int64_t spm_substring_match(
    int64_t n_words, const int64_t* word_off, const uint32_t* word_cps,
    int64_t n_keys, const int64_t* key_off, const uint32_t* key_cps,
    int32_t max_len,
    int32_t* out_pos, int32_t* out_len, int32_t* out_sid,
    int64_t* out_off, int64_t cap, int32_t num_threads) {
  std::unordered_map<std::string_view, int32_t> index;
  index.reserve(static_cast<size_t>(n_keys) * 2);
  const char* kbase = reinterpret_cast<const char*>(key_cps);
  int64_t max_key = 0;
  for (int64_t k = 0; k < n_keys; ++k) {
    const int64_t kl = key_off[k + 1] - key_off[k];
    if (kl > max_key) max_key = kl;
    index.emplace(std::string_view(kbase + 4 * key_off[k], 4 * kl),
                  static_cast<int32_t>(k));
  }
  if (max_key < max_len) max_len = static_cast<int32_t>(max_key);
  const char* wbase = reinterpret_cast<const char*>(word_cps);
  // threads scan disjoint word ranges against the shared (read-only)
  // index into local buffers, merged in word order — output identical
  // at any thread count
  int T = num_threads > 0 ? num_threads : 1;
  if (T > n_words) T = n_words > 0 ? (int)n_words : 1;
  struct Part {
    std::vector<int32_t> pos, len, sid;
    std::vector<int64_t> noff;  // per-word candidate counts
  };
  std::vector<Part> parts(T);
  auto work = [&](int t) {
    Part& p = parts[t];
    const int64_t lo = n_words * t / T, hi = n_words * (t + 1) / T;
    p.noff.reserve(hi - lo);
    for (int64_t w = lo; w < hi; ++w) {
      const int64_t L = word_off[w + 1] - word_off[w];
      const char* base = wbase + 4 * word_off[w];
      const size_t before = p.pos.size();
      for (int64_t pos = 0; pos < L; ++pos) {
        const int64_t maxl = std::min<int64_t>(max_len, L - pos);
        for (int64_t ln = 1; ln <= maxl; ++ln) {
          auto it = index.find(std::string_view(base + 4 * pos, 4 * ln));
          if (it != index.end()) {
            p.pos.push_back(static_cast<int32_t>(pos));
            p.len.push_back(static_cast<int32_t>(ln));
            p.sid.push_back(it->second);
          }
        }
      }
      p.noff.push_back(static_cast<int64_t>(p.pos.size() - before));
    }
  };
  if (T == 1) {
    work(0);
  } else {
    std::vector<std::thread> pool_t;
    for (int t = 0; t < T; ++t) pool_t.emplace_back(work, t);
    for (auto& th : pool_t) th.join();
  }
  int64_t m = 0, w = 0;
  out_off[0] = 0;
  for (int t = 0; t < T; ++t) {
    const Part& p = parts[t];
    if (m + (int64_t)p.pos.size() > cap) return -1;
    memcpy(out_pos + m, p.pos.data(), p.pos.size() * sizeof(int32_t));
    memcpy(out_len + m, p.len.data(), p.len.size() * sizeof(int32_t));
    memcpy(out_sid + m, p.sid.data(), p.sid.size() * sizeof(int32_t));
    for (int64_t c : p.noff) {
      m += c;
      out_off[++w] = m;
    }
  }
  return m;
}

// ---------------------------------------------------------------------------
// Fused normalize + unigram Viterbi + adjacent-UNK id merge over a batch of
// lines (one library call per corpus chunk instead of two per line). Output
// is CSR: out_ids[out_off[i]:out_off[i+1]] are line i's ids after the
// adjacent-unknown merge of PopulateSentencePieceText
// (sentencepiece_processor.cc:506-521). Returns total ids, -1 on error,
// -2 if an out cap was too small. When out_norm is non-null, also emits
// the per-line normalized bytes (CSR via out_norm_off) and each MERGED
// token's (start, len) span into them — adjacent-unknown merges extend
// the previous span — so the caller can materialize piece strings.
extern "C" int64_t spm_unigram_encode_ids_batch(
    const uint32_t* n_units, int64_t n_nunits,
    const uint8_t* pool, int64_t pool_len,
    const uint32_t* m_units, int64_t n_munits,
    int add_dummy, int remove_ws, int escape_ws, int suffix_mode,
    const uint32_t* e_units, int64_t n_eunits,
    const float* lat_scores, int32_t unk_id, float unk_score,
    const uint8_t* data, const int64_t* off, int64_t n_lines,
    int32_t* out_ids, int64_t out_cap, int64_t* out_off,
    uint8_t* out_norm, int64_t norm_cap, int64_t* out_norm_off,
    int32_t* out_starts, int32_t* out_lens) {
  std::vector<uint8_t> norm_buf;
  std::vector<int64_t> n2o;
  std::vector<int32_t> ids, starts, lens;
  const bool want_pieces = out_norm != nullptr;
  int64_t m = 0, nb = 0;
  out_off[0] = 0;
  if (want_pieces) out_norm_off[0] = 0;
  for (int64_t li = 0; li < n_lines; ++li) {
    const uint8_t* d = data + off[li];
    const int64_t n = off[li + 1] - off[li];
    int64_t cap = n * 13 + 16;
    uint8_t* nout;
    int64_t olen;
    if (want_pieces) {
      if (nb + cap > norm_cap) return -2;
      nout = out_norm + nb;
      if ((int64_t)n2o.size() < norm_cap - nb + 1) n2o.resize(norm_cap - nb + 1);
      olen = spm_normalize(n_units, n_nunits, pool, pool_len, m_units,
                           n_munits, d, n, add_dummy, remove_ws, escape_ws,
                           suffix_mode, nout, norm_cap - nb, n2o.data());
      if (olen == -2) return -2;  // caller's norm buffer too small
    } else {
      for (;;) {
        if ((int64_t)norm_buf.size() < cap) norm_buf.resize(cap);
        if ((int64_t)n2o.size() < cap + 1) n2o.resize(cap + 1);
        nout = norm_buf.data();
        olen = spm_normalize(n_units, n_nunits, pool, pool_len, m_units,
                             n_munits, d, n, add_dummy, remove_ws, escape_ws,
                             suffix_mode, nout, cap, n2o.data());
        if (olen != -2) break;
        cap *= 2;  // custom rule expanded past 13x: grow and retry
      }
    }
    if (olen < 0) return -1;
    if ((int64_t)ids.size() < olen) {
      ids.resize(olen);
      starts.resize(olen);
      lens.resize(olen);
    }
    const int64_t cnt =
        olen == 0 ? 0
                  : spm_unigram_encode(e_units, n_eunits, lat_scores, unk_id,
                                       unk_score, nout, olen,
                                       ids.data(), starts.data(), lens.data());
    if (cnt < 0) return -1;
    bool prev_unk = false;
    for (int64_t k = 0; k < cnt; ++k) {
      const bool unk = ids[k] == unk_id;
      if (!(unk && prev_unk)) {
        if (m >= out_cap) return -2;
        if (want_pieces) {
          out_starts[m] = starts[k];
          out_lens[m] = lens[k];
        }
        out_ids[m++] = ids[k];
      } else if (want_pieces) {
        out_lens[m - 1] += lens[k];  // adjacent unknowns concatenate
      }
      prev_unk = unk;
    }
    out_off[li + 1] = m;
    if (want_pieces) {
      nb += olen;
      out_norm_off[li + 1] = nb;
    }
  }
  return m;
}

// Fused normalize + BPE merge over a batch of lines. Emits per-line CSR
// spans (ids, starts, lens — starts index the per-line normalized bytes,
// which are also returned so the caller can resolve unk spans through the
// full piece map) . Returns total spans; -1 error; -2 out caps too small.
extern "C" int64_t spm_bpe_encode_ids_batch(
    const uint32_t* n_units, int64_t n_nunits,
    const uint8_t* pool, int64_t pool_len,
    const uint32_t* m_units, int64_t n_munits,
    int add_dummy, int remove_ws, int escape_ws, int suffix_mode,
    const uint32_t* e_units, int64_t n_eunits,
    const float* scores, const uint32_t* bm_units, int64_t n_bmunits,
    int32_t unk_id,
    const uint8_t* data, const int64_t* off, int64_t n_lines,
    int32_t* out_ids, int32_t* out_starts, int32_t* out_lens,
    int64_t out_cap, int64_t* out_off,
    uint8_t* out_norm, int64_t norm_cap, int64_t* out_norm_off) {
  std::vector<int64_t> n2o;
  std::vector<int32_t> ids, starts, lens;
  int64_t m = 0, nb = 0;
  out_off[0] = 0;
  out_norm_off[0] = 0;
  for (int64_t li = 0; li < n_lines; ++li) {
    const uint8_t* d = data + off[li];
    const int64_t n = off[li + 1] - off[li];
    const int64_t cap = n * 13 + 16;
    if (nb + cap > norm_cap) return -2;
    if ((int64_t)n2o.size() < norm_cap - nb + 1) n2o.resize(norm_cap - nb + 1);
    const int64_t olen =
        spm_normalize(n_units, n_nunits, pool, pool_len, m_units, n_munits,
                      d, n, add_dummy, remove_ws, escape_ws, suffix_mode,
                      out_norm + nb, norm_cap - nb, n2o.data());
    if (olen == -2) return -2;
    if (olen < 0) return -1;
    if ((int64_t)ids.size() < olen) {
      ids.resize(olen);
      starts.resize(olen);
      lens.resize(olen);
    }
    const int64_t cnt =
        olen == 0 ? 0
                  : spm_bpe_encode(e_units, n_eunits, scores, bm_units,
                                   n_bmunits, unk_id, out_norm + nb, olen,
                                   ids.data(), starts.data(), lens.data());
    if (cnt < 0) return -1;
    if (m + cnt > out_cap) return -2;
    for (int64_t k = 0; k < cnt; ++k) {
      out_ids[m] = ids[k];
      out_starts[m] = starts[k];
      out_lens[m] = lens[k];
      ++m;
    }
    nb += olen;
    out_off[li + 1] = m;
    out_norm_off[li + 1] = nb;
  }
  return m;
}

// PLCP (Karkkainen CPM'09) + esa.hxx:37-90 stack traversal: emit suffix-
// tree internal nodes (L, R, depth) in the exact emission order the seed
// tie-breaker depends on (unigram_model_trainer.cc:163 node index asc).
extern "C" int64_t spm_esa_nodes(const int32_t* arr, const int32_t* sa,
                                 int64_t n, int32_t* out_lrd, int64_t cap) {
  if (n == 0) return 0;
  // int32 working set: n < 2^31 (callers pass codepoint counts), and
  // psi/plcp/H are the memory-bound part of this function — half-width
  // elements halve the random-access traffic over ~25M-entry arrays.
  std::vector<int32_t> psi(n);
  psi[sa[0]] = sa[n - 1];
  for (int64_t k = 1; k < n; ++k) psi[sa[k]] = sa[k - 1];
  std::vector<int32_t> plcp(n);
  int64_t h = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t j = psi[i];
    while (i + h < n && j + h < n && arr[i + h] == arr[j + h]) ++h;
    plcp[i] = static_cast<int32_t>(h);
    if (h > 0) --h;
  }
  std::vector<int32_t> H(n);
  for (int64_t i = 0; i < n; ++i) H[i] = plcp[sa[i]];
  H[0] = -1;
  int64_t m = 0;
  std::vector<std::pair<int64_t, int64_t>> stack;
  stack.reserve(64);
  stack.emplace_back(-1, -1);
  for (int64_t i = 0; i <= n; ++i) {
    std::pair<int64_t, int64_t> cur(i, i == n ? -1 : H[i]);
    std::pair<int64_t, int64_t> cand = stack.back();
    while (cand.second > cur.second) {
      if (i - cand.first > 1) {
        if (m >= cap) return -1;
        out_lrd[3 * m] = static_cast<int32_t>(cand.first);
        out_lrd[3 * m + 1] = static_cast<int32_t>(i);
        out_lrd[3 * m + 2] = static_cast<int32_t>(cand.second);
        ++m;
      }
      cur.first = cand.first;
      stack.pop_back();
      cand = stack.back();
    }
    if (cand.second < cur.second) stack.push_back(cur);
    if (i == n) break;
    stack.emplace_back(i, n - sa[i] + 1);
  }
  return m;
}

// ---------------------------------------------------------------------------
// BPE trainer merge core. C++ port of the exact host engine in
// train/bpe.py (which replays reference bpe_model_trainer.cc:85-326): the
// libstdc++ containers the Python module emulates (unordered_map iteration
// order, partial_sort tie mechanics) are simply the REAL ones here, so the
// trained merge order is byte-identical by construction. The active-set
// pointer order is modeled by creation index (cidx), matching the Python
// engine's validated stand-in for the reference allocator's address order.
namespace bpetrain {

struct Sym {
  Sym* left = nullptr;
  Sym* right = nullptr;
  std::u32string chars;
  std::string ub;  // utf8 (surrogateescape bytes for U+DC80..DCFF)
  bool is_unk = false;
  int64_t freq = 0;
  std::vector<uint64_t> positions;  // sorted unique
  uint64_t fp = 0;
  int64_t cidx = 0;
};

static inline void mix64(uint64_t& a, uint64_t& b, uint64_t& c) {
  a -= b; a -= c; a ^= c >> 43;
  b -= c; b -= a; b ^= a << 9;
  c -= a; c -= b; c ^= b >> 8;
  a -= b; a -= c; a ^= c >> 38;
  b -= c; b -= a; b ^= a << 23;
  c -= a; c -= b; c ^= b >> 5;
  a -= b; a -= c; a ^= c >> 35;
  b -= c; b -= a; b ^= a << 49;
  c -= a; c -= b; c ^= b >> 11;
  a -= b; a -= c; a ^= c >> 12;
  b -= c; b -= a; b ^= a << 18;
  c -= a; c -= b; c ^= b >> 22;
}

static inline uint64_t fingerprint_cat(uint64_t x, uint64_t y) {
  uint64_t b = 0xE08C1D668B756F82ULL;
  mix64(x, b, y);
  return y;
}

static inline void append_utf8(std::string& out, uint32_t cp) {
  if (cp >= 0xDC80 && cp <= 0xDCFF) {  // surrogateescape byte
    out.push_back(static_cast<char>(cp - 0xDC00));
  } else if (cp < 0x80) {
    out.push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out.push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out.push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out.push_back(static_cast<char>(0xF0 | (cp >> 18)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

struct Ctx {
  // validity config
  int32_t max_len;
  bool ws_suffix, split_ws, split_num, split_script;
  const int32_t* scr_lo;
  const int32_t* scr_hi;
  const int32_t* scr_id;
  int64_t n_scr;
  int32_t common_id, han_id, hira_id, kata_id;

  // direct-mapped BMP script table (the script DB is ~2k ranges; a
  // binary search per character dominated the seed node filter at
  // corpus scale) — built lazily by ensure_bmp(), 256 KB, L2-resident
  mutable std::vector<int32_t> bmp;

  void ensure_bmp() const {
    if (!bmp.empty()) return;
    bmp.assign(0x10000, common_id);
    for (int64_t i = 0; i < n_scr; ++i) {
      const uint32_t lo = static_cast<uint32_t>(scr_lo[i]);
      if (lo >= 0x10000) continue;
      const uint32_t hi = std::min<uint32_t>(
          static_cast<uint32_t>(scr_hi[i]), 0xFFFF);
      for (uint32_t c = lo; c <= hi; ++c) bmp[c] = scr_id[i];
    }
  }

  int32_t script_of(uint32_t cp) const {
    if (cp < 0x10000 && !bmp.empty()) return bmp[cp];
    int64_t lo = 0, hi = n_scr;
    while (lo < hi) {  // upper_bound on scr_lo
      int64_t mid = (lo + hi) / 2;
      if (static_cast<uint32_t>(scr_lo[mid]) <= cp) lo = mid + 1;
      else hi = mid;
    }
    int64_t i = lo - 1;
    if (i >= 0 && cp <= static_cast<uint32_t>(scr_hi[i])) return scr_id[i];
    return common_id;
  }

  // trainer_interface.cc:178-267 (= train/interface.py
  // is_valid_sentencepiece)
  bool valid(const std::u32string& cps) const {
    return valid_span(
        reinterpret_cast<const int32_t*>(cps.data()),
        static_cast<int64_t>(cps.size()));
  }

  bool valid_span(const int32_t* p, int64_t n) const {
    if (n == 0 || n > max_len) return false;
    const int32_t ANY = -1;
    int32_t prev = ANY;
    for (int64_t pos = 0; pos < n; ++pos) {
      const uint32_t c = static_cast<uint32_t>(p[pos]);
      if (c == 0x2585 || c == 0x0000 || c == 0x0009 || c == 0x0020)
        return false;
      if (!(c < 0xD800 || (c >= 0xE000 && c <= 0x10FFFF))) return false;
      if (c == 0x2581) {
        if (ws_suffix) {
          if ((split_ws && pos < n - 1) ||
              (!split_ws && pos < n - 1 && pos == 0))
            return false;
        } else {
          if ((split_ws && pos > 0) ||
              (!split_ws && pos > 0 && pos == n - 1))
            return false;
        }
      } else {
        int32_t s = script_of(c);
        if (s == hira_id || s == kata_id || c == 0x30FC) s = han_id;
        if (!split_num && c >= 0x30 && c <= 0x39) s = ANY;
        if (split_script && s != ANY && prev != ANY && prev != s)
          return false;
        prev = s;
      }
    }
    return true;
  }
};

struct CidxLess {
  bool operator()(const Sym* a, const Sym* b) const {
    return a->cidx < b->cidx;
  }
};

}  // namespace bpetrain

extern "C" int64_t spm_bpe_train(
    const int64_t* sent_off, const uint32_t* sent_cps, int64_t n_sents,
    const int64_t* sent_freqs,
    const uint32_t* req_cps, const int64_t* req_freqs, int64_t n_req,
    int32_t max_piece_len, int32_t ws_suffix, int32_t split_ws,
    int32_t split_num, int32_t split_script,
    const int32_t* scr_lo, const int32_t* scr_hi, const int32_t* scr_id,
    int64_t n_scr, int32_t common_id, int32_t han_id, int32_t hira_id,
    int32_t kata_id, int64_t vocab_target,
    uint32_t* out_cps, int64_t out_cap, int64_t* out_off, int64_t* out_n) {
  using namespace bpetrain;
  Ctx ctx{max_piece_len, ws_suffix != 0, split_ws != 0, split_num != 0,
          split_script != 0, scr_lo, scr_hi, scr_id, n_scr,
          common_id, han_id, hira_id, kata_id};
  ctx.ensure_bmp();

  std::unordered_map<uint32_t, int64_t> required;
  required.reserve(n_req * 2);
  for (int64_t i = 0; i < n_req; ++i) required[req_cps[i]] = req_freqs[i];

  std::deque<Sym> arena;
  int64_t n_created = 0;
  // symbols_cache_: REAL libstdc++ unordered_map (identity hash on u64)
  std::unordered_map<uint64_t, Sym*> cache;
  std::set<Sym*, CidxLess> active;
  std::vector<std::vector<Sym*>> symbols(n_sents);

  auto get_char_symbol = [&](uint32_t c) -> Sym* {
    auto it = cache.find(c);
    if (it != cache.end()) return it->second;
    arena.emplace_back();
    Sym* s = &arena.back();
    s->is_unk = (c == 0x2585);
    s->chars.push_back(c);
    append_utf8(s->ub, c);
    auto rit = required.find(c);
    s->freq = rit != required.end() ? rit->second : 1;
    s->fp = c;
    s->cidx = n_created++;
    cache.emplace(c, s);
    return s;
  };

  auto get_pair_symbol = [&](Sym* l, Sym* r) -> Sym* {
    if (l == nullptr || r == nullptr || l->is_unk || r->is_unk)
      return nullptr;
    const uint64_t key = fingerprint_cat(l->fp, r->fp);
    auto it = cache.find(key);
    if (it != cache.end()) return it->second;
    std::u32string chars = l->chars + r->chars;
    if (!ctx.valid(chars)) return nullptr;
    arena.emplace_back();
    Sym* s = &arena.back();
    s->left = l;
    s->right = r;
    s->chars.swap(chars);
    s->ub = l->ub + r->ub;
    s->fp = key;
    s->cidx = n_created++;
    cache.emplace(key, s);
    return s;
  };

  auto encode_pos = [](int64_t sid, int64_t l, int64_t r) -> uint64_t {
    return (static_cast<uint64_t>(sid) << 32) |
           (static_cast<uint64_t>(l) << 16) | static_cast<uint64_t>(r);
  };

  auto compute_freq = [&](Sym* s) {
    if (s->freq > 0) return;
    int64_t prev_sid = -1, prev_right = 0;
    std::vector<uint64_t> kept;
    int64_t freq = 0;
    for (uint64_t enc : s->positions) {
      const int64_t sid = static_cast<int64_t>(enc >> 32);
      const int64_t l = static_cast<int64_t>((enc >> 16) & 0xFFFF);
      const int64_t r = static_cast<int64_t>(enc & 0xFFFF);
      if ((sid == prev_sid && l == prev_right) ||
          symbols[sid][l] != s->left || symbols[sid][r] != s->right) {
        prev_sid = -1;
        prev_right = 0;
      } else {
        freq += sent_freqs[sid];
        prev_sid = sid;
        prev_right = r;
        kept.push_back(enc);
      }
    }
    s->freq = freq;
    s->positions.swap(kept);
  };

  auto get_next_index = [&](int64_t sid, int64_t index) -> int64_t {
    const auto& row = symbols[sid];
    for (int64_t i = index + 1; i < (int64_t)row.size(); ++i)
      if (row[i] != nullptr) return i;
    return -1;
  };
  auto get_prev_index = [&](int64_t sid, int64_t index) -> int64_t {
    const auto& row = symbols[sid];
    for (int64_t i = index - 1; i >= 0; --i)
      if (row[i] != nullptr) return i;
    return -1;
  };
  auto add_new_pair = [&](int64_t sid, int64_t left, int64_t right) {
    if (left == -1 || right == -1) return;
    Sym* s = get_pair_symbol(symbols[sid][left], symbols[sid][right]);
    if (s != nullptr) {
      active.insert(s);
      const uint64_t enc = encode_pos(sid, left, right);
      auto it = std::lower_bound(s->positions.begin(), s->positions.end(),
                                 enc);
      if (it == s->positions.end() || *it != enc)
        s->positions.insert(it, enc);
    }
  };
  auto reset_freq = [&](int64_t sid, int64_t left, int64_t right,
                        Sym* best) {
    if (left == -1 || right == -1) return;
    Sym* s = get_pair_symbol(symbols[sid][left], symbols[sid][right]);
    if (s != nullptr && s != best) s->freq = 0;
  };

  for (int64_t sid = 0; sid < n_sents; ++sid) {
    const int64_t L = sent_off[sid + 1] - sent_off[sid];
    if (L > 0xFFFF) return -3;  // _encode_pos 16-bit packing limit
    auto& row = symbols[sid];
    row.resize(L);
    for (int64_t i = 0; i < L; ++i)
      row[i] = get_char_symbol(sent_cps[sent_off[sid] + i]);
  }
  for (int64_t sid = 0; sid < n_sents; ++sid)
    for (int64_t i = 1; i < (int64_t)symbols[sid].size(); ++i)
      add_new_pair(sid, i - 1, i);

  auto update_active = [&]() {
    std::vector<Sym*> cand;
    for (auto& kv : cache) {
      Sym* s = kv.second;
      if (s->left != nullptr && s->right != nullptr) {
        compute_freq(s);
        cand.push_back(s);
      }
    }
    active.clear();
    if (cand.empty()) return;
    const size_t k_min = 1000;
    size_t size = std::min(
        std::max(k_min, static_cast<size_t>(cache.size() * 0.05)),
        cand.size());
    std::partial_sort(cand.begin(), cand.begin() + size, cand.end(),
                      [](const Sym* a, const Sym* b) {
                        return a->freq > b->freq;
                      });
    active.insert(cand.begin(), cand.begin() + size);
  };

  std::unordered_set<std::string> dup;
  std::vector<const Sym*> finals;
  int64_t n_final = 0;
  while (n_final < vocab_target) {
    if (n_final % 100 == 0) update_active();
    Sym* best = nullptr;
    int64_t best_freq = 0;
    for (Sym* s : active) {
      compute_freq(s);
      if (best == nullptr) {
        best = s;
        continue;
      }
      // key = (-freq, len(chars), utf8) <
      if (s->freq > best->freq ||
          (s->freq == best->freq &&
           (s->chars.size() < best->chars.size() ||
            (s->chars.size() == best->chars.size() && s->ub < best->ub))))
        best = s;
    }
    (void)best_freq;
    if (best == nullptr) break;
    if (!dup.insert(best->ub).second) {
      cache.erase(best->fp);
      active.erase(best);
      continue;
    }
    finals.push_back(best);
    ++n_final;

    const std::vector<uint64_t> plist = best->positions;
    for (uint64_t enc : plist) {
      const int64_t sid = static_cast<int64_t>(enc >> 32);
      const int64_t left = static_cast<int64_t>((enc >> 16) & 0xFFFF);
      const int64_t right = static_cast<int64_t>(enc & 0xFFFF);
      auto& row = symbols[sid];
      if (row[left] == nullptr) continue;
      const int64_t nxt = get_next_index(sid, right);
      const int64_t prv = get_prev_index(sid, left);
      reset_freq(sid, prv, left, best);
      reset_freq(sid, right, nxt, best);
      row[left] = best;
      row[right] = nullptr;
      add_new_pair(sid, prv, left);
      add_new_pair(sid, left, nxt);
    }
    cache.erase(best->fp);
    active.erase(best);
  }

  int64_t nb = 0;
  out_off[0] = 0;
  for (size_t i = 0; i < finals.size(); ++i) {
    const std::u32string& cs = finals[i]->chars;
    if (nb + (int64_t)cs.size() > out_cap) return -2;
    for (char32_t c : cs) out_cps[nb++] = static_cast<uint32_t>(c);
    out_off[i + 1] = nb;
  }
  *out_n = static_cast<int64_t>(finals.size());
  return nb;
}

// Exact digamma batch (unigram_model_trainer.cc:22-40 double arithmetic;
// glibc log — the same libm behind Python's math.log).
extern "C" void spm_digamma(const double* x_in, double* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    double x = x_in[i];
    double result = 0.0;
    while (x < 7) {
      result -= 1.0 / x;
      x += 1;
    }
    x -= 1.0 / 2.0;
    const double xx = 1.0 / x;
    const double xx2 = xx * xx;
    const double xx4 = xx2 * xx2;
    result += std::log(x) + (1.0 / 24.0) * xx2 - (7.0 / 960.0) * xx4 +
              (31.0 / 8064.0) * xx4 * xx2 - (127.0 / 30720.0) * xx4 * xx4;
    out[i] = result;
  }
}

// Prune candidate losses (unigram_model_trainer.cc:423-473): the exact
// float arithmetic natively — sum/logsum, per-piece F/vsum, logprob_sp,
// float-typed logsum_alt chain, and the `float += double` logprob_alt
// accumulation. out_flag: 0 = skip, 1 = keep directly (no alternatives),
// 2 = candidate with out_loss set. Returns 0.
extern "C" int spm_prune_losses(
    const float* freq, const float* F_occ, float vsum,
    const uint8_t* always_keep, const int32_t* alt_ids,
    const int64_t* alt_off, int64_t m,
    uint8_t* out_flag, float* out_loss) {
  double acc = 0.0;
  for (int64_t i = 0; i < m; ++i) acc += freq[i];
  const float sum = static_cast<float>(acc);
  // NOTE: the reference calls unqualified log(...) = ::log(double) — the
  // float argument promotes; std::log(float) would be logf and differ.
  const float logsum = std::log(static_cast<double>(sum));
  for (int64_t i = 0; i < m; ++i) {
    const int64_t a = alt_off[i], b = alt_off[i + 1];
    if (freq[i] == 0.0f || !always_keep[i]) {
      out_flag[i] = 0;
    } else if (a == b) {
      out_flag[i] = 1;
    } else {
      float F = F_occ[i];
      F /= vsum;
      const float logprob_sp =
          std::log(static_cast<double>(freq[i])) - logsum;
      const float inner = sum + freq[i] * static_cast<float>(m - 1);
      const float logsum_alt = std::log(static_cast<double>(inner));
      float logprob_alt = 0.0f;
      for (int64_t k = a; k < b; ++k) {
        logprob_alt += (std::log(static_cast<double>(
                            freq[alt_ids[k]] + freq[i])) -
                        logsum_alt);
      }
      out_flag[i] = 2;
      out_loss[i] = F * (logprob_sp - logprob_alt);
    }
  }
  return 0;
}

// Prune-phase Viterbi path statistics (unigram_model_trainer.cc:389-424):
// replays the reference's per-thread strided float32 accumulation — per
// thread, sentences si = tid, tid+nt, ... in order, each path occurrence
// adding the sentence freq into the thread-local vector; thread vectors
// then merge in tid order. out_F accumulates the occurrence stream
// (freq(vocab[i]) via the inverted index) in the same tid-major order.
// Sequential by definition (every add order is a conformance contract).
extern "C" int spm_prune_freqs(
    const int32_t* path_ids, const int64_t* path_off,
    const float* ws, int64_t n_s, int64_t m, int32_t nthreads,
    float* out_freq, float* out_F, float* out_vsum) {
  std::vector<float> ft(m);
  std::fill(out_freq, out_freq + m, 0.0f);
  std::fill(out_F, out_F + m, 0.0f);
  float vsum = 0.0f;
  for (int32_t tid = 0; tid < nthreads; ++tid) {
    float vb = 0.0f;
    std::fill(ft.begin(), ft.end(), 0.0f);
    for (int64_t si = tid; si < n_s; si += nthreads) {
      const float w = ws[si];
      vb += w;
      for (int64_t k = path_off[si]; k < path_off[si + 1]; ++k) {
        const int32_t id = path_ids[k];
        if (id >= 0) {
          ft[id] += w;
          out_F[id] += w;
        }
      }
    }
    vsum += vb;
    for (int64_t i = 0; i < m; ++i) out_freq[i] += ft[i];
  }
  *out_vsum = vsum;
  return 0;
}

// Batched normalizer: CSR lines in -> CSR normalized bytes out (the
// trainer normalizes whole corpora line by line; one call amortizes the
// FFI). Returns total out bytes, -1 error, -2 cap exceeded.
extern "C" int64_t spm_normalize_batch(
    const uint32_t* units, int64_t n_units,
    const uint8_t* pool, int64_t pool_len,
    const uint32_t* m_units, int64_t n_munits,
    int add_dummy, int remove_ws, int escape_ws, int suffix_mode,
    const uint8_t* data, const int64_t* off, int64_t n_lines,
    uint8_t* out, int64_t out_cap, int64_t* out_off,
    int num_threads, int slab_factor) {
  // Parallel over line ranges (the reference normalizes the corpus on a
  // num_threads pool, trainer_interface.cc:361-372); output is packed in
  // line order afterwards, so the result is byte-identical at any thread
  // count. Each line li gets the slab out[off[li]*F+16*li ...] where F is
  // the caller's expansion bound (4 covers real text; 13 is the NFKC
  // worst case — the caller retries with 13 on -2), so threads never
  // overlap; a final left-to-right memmove packs the CSR.
  if (n_lines == 0) return 0;
  const int64_t F = slab_factor > 0 ? slab_factor : 13;
  const int64_t need = off[n_lines] * F + 16 * n_lines;
  if (need > out_cap) return -2;
  int T = num_threads > 0 ? num_threads : 1;
  if (T > n_lines) T = (int)n_lines;
  std::vector<int64_t> olens(n_lines);
  std::vector<int> errs(T, 0);
  auto slab = [&](int64_t li) { return off[li] * F + 16 * li; };
  auto work = [&](int t) {
    std::vector<int64_t> n2o;
    const int64_t lo = n_lines * t / T, hi = n_lines * (t + 1) / T;
    for (int64_t li = lo; li < hi; ++li) {
      const int64_t n = off[li + 1] - off[li];
      const int64_t cap = slab(li + 1) - slab(li);
      if ((int64_t)n2o.size() < cap + 1) n2o.resize(cap + 1);
      const int64_t olen = spm_normalize(
          units, n_units, pool, pool_len, m_units, n_munits,
          data + off[li], n, add_dummy, remove_ws, escape_ws,
          suffix_mode, out + slab(li), cap, n2o.data());
      if (olen < 0) {
        errs[t] = (int)olen;
        return;
      }
      olens[li] = olen;
    }
  };
  if (T == 1) {
    work(0);
  } else {
    std::vector<std::thread> pool_t;
    for (int t = 0; t < T; ++t) pool_t.emplace_back(work, t);
    for (auto& th : pool_t) th.join();
  }
  for (int t = 0; t < T; ++t)
    if (errs[t] < 0) return errs[t];
  int64_t nb = 0;
  out_off[0] = 0;
  for (int64_t li = 0; li < n_lines; ++li) {
    if (nb != slab(li))
      memmove(out + nb, out + slab(li), olens[li]);
    nb += olens[li];
    out_off[li + 1] = nb;
  }
  return nb;
}

// Seed-phase node filter (unigram_model_trainer.cc:166-190): for each
// suffix-tree internal node, the D<=1 / sentence-boundary /
// IsValidSentencePiece checks and score = freq * len. Same validity
// logic as the BPE trainer core (bpetrain::Ctx).
extern "C" int64_t spm_seed_filter(
    const int32_t* arr, const int32_t* sa,
    const int32_t* nodes_lrd, int64_t n_nodes,
    int32_t max_piece_len, int32_t ws_suffix, int32_t split_ws,
    int32_t split_num, int32_t split_script,
    const int32_t* scr_lo, const int32_t* scr_hi, const int32_t* scr_id,
    int64_t n_scr, int32_t common_id, int32_t han_id, int32_t hira_id,
    int32_t kata_id,
    int32_t* out_idx, int64_t* out_score, int32_t num_threads) {
  using namespace bpetrain;
  Ctx ctx{max_piece_len, ws_suffix != 0, split_ws != 0, split_num != 0,
          split_script != 0, scr_lo, scr_hi, scr_id, n_scr,
          common_id, han_id, hira_id, kata_id};
  ctx.ensure_bmp();  // before the threads: read-only afterwards
  // Nodes are independent; threads filter disjoint ranges into local
  // buffers merged in node order, so output is identical at any thread
  // count (the seed phase is order-sensitive downstream: node index is
  // the tie-break in the top-k candidate sort).
  int T = num_threads > 0 ? num_threads : 1;
  if (T > n_nodes) T = n_nodes > 0 ? (int)n_nodes : 1;
  std::vector<std::vector<int32_t>> idx_t(T);
  std::vector<std::vector<int64_t>> score_t(T);
  auto work = [&](int t) {
    auto& oi = idx_t[t];
    auto& os = score_t[t];
    const int64_t lo = n_nodes * t / T, hi = n_nodes * (t + 1) / T;
    for (int64_t i = lo; i < hi; ++i) {
      const int32_t L = nodes_lrd[3 * i];
      const int32_t R = nodes_lrd[3 * i + 1];
      const int32_t D = nodes_lrd[3 * i + 2];
      // D > max_len can be deep (repetitive corpora): reject before
      // touching the corpus array at all
      if (D <= 1 || D > ctx.max_len) continue;
      const int64_t offset = sa[L];
      bool boundary = false;
      for (int32_t k = 0; k < D; ++k) {
        if (arr[offset + k] == 0) {
          boundary = true;
          break;
        }
      }
      if (boundary || !ctx.valid_span(arr + offset, D)) continue;
      oi.push_back(static_cast<int32_t>(i));
      os.push_back(static_cast<int64_t>(R - L) * D);
    }
  };
  if (T == 1) {
    work(0);
  } else {
    std::vector<std::thread> pool_t;
    for (int t = 0; t < T; ++t) pool_t.emplace_back(work, t);
    for (auto& th : pool_t) th.join();
  }
  int64_t m = 0;
  for (int t = 0; t < T; ++t) {
    memcpy(out_idx + m, idx_t[t].data(), idx_t[t].size() * sizeof(int32_t));
    memcpy(out_score + m, score_t[t].data(),
           score_t[t].size() * sizeof(int64_t));
    m += (int64_t)idx_t[t].size();
  }
  return m;
}

// ---------------------------------------------------------------------------
// em2 shard packing (tpu/em2.py::build_shard_arrays, the device unigram
// trainer's host prep). One call builds one mesh shard: per-lane flag and
// frequency planes for every width class plus the candidate stream —
// destination lanes SORTED BY PIECE ID (stable counting sort, so within a
// piece the (row, col, len) order matches the numpy composite-key argsort)
// and the per-piece segment starts. Replaces a ~2.3 s numpy phase at
// BASELINE config-5 scale with a linear C pass (the sort is O(n) counting).
// ---------------------------------------------------------------------------
extern "C" int64_t spm_em2_pack(
    int64_t n_words,
    const int32_t* wlen,        // [n_words] chars
    const float* wfreq,         // [n_words]
    const int32_t* wcls,        // [n_words] class id (-1 = skip)
    const int32_t* wrow,        // [n_words] global row in its class
    const int32_t* wcol,        // [n_words] start col
    const int64_t* cand_off,    // [n_words+1]
    const int32_t* cand_pos, const int32_t* cand_len,
    const int32_t* cand_sid,
    int32_t n_cls, const int32_t* cls_c,       // [n_cls] width C
    const int32_t* row_lo, const int32_t* row_hi,  // [n_cls] shard rows
    const int64_t* lane_base,   // [n_cls] lane offset of the class
    int32_t K, int64_t num_seed,
    uint8_t* const* flags_out,  // per class [R*C], zeroed by caller
    float* const* freq_out,     // per class [R*C], zeroed by caller
    int32_t* dest_out,          // [cap]
    int32_t* seg_pos_out,       // [num_seed+1], filled with -1 by caller
    int64_t cap) {
  constexpr uint8_t F_START = 1, F_ZEND = 2, F_INWORD = 4;
  // pass 1: flag/freq planes + per-sid candidate counts
  std::vector<int64_t> sid_cnt(static_cast<size_t>(num_seed) + 1, 0);
  int64_t n_cand = 0;
  for (int64_t w = 0; w < n_words; ++w) {
    const int32_t c = wcls[w];
    if (c < 0) continue;
    const int32_t lo = row_lo[c], hi = row_hi[c];
    const int32_t row = wrow[w];
    if (row < lo || row >= hi) continue;
    const int32_t C = cls_c[c];
    const int64_t base = static_cast<int64_t>(row - lo) * C + wcol[w];
    uint8_t* fl = flags_out[c];
    float* fq = freq_out[c];
    const int32_t L = wlen[w];
    const float f = wfreq[w];
    for (int32_t j = 0; j < L; ++j) {
      fl[base + j] |= F_INWORD;
      fq[base + j] = f;
    }
    fl[base] |= F_START;
    fl[base + L] |= F_ZEND;
    fq[base + L] = f;
    for (int64_t ci = cand_off[w]; ci < cand_off[w + 1]; ++ci) {
      const int32_t sid = cand_sid[ci];
      if (sid < 0 || sid >= num_seed) continue;
      ++sid_cnt[sid];
      ++n_cand;
    }
  }
  if (n_cand > cap) return -1;
  // prefix offsets -> seg starts
  int64_t acc = 0;
  std::vector<int64_t> cursor(static_cast<size_t>(num_seed), 0);
  for (int64_t s = 0; s < num_seed; ++s) {
    cursor[s] = acc;
    if (sid_cnt[s] > 0)
      seg_pos_out[s] = static_cast<int32_t>(acc);
    acc += sid_cnt[s];
  }
  // pass 2: scatter dests in word order (stable within sid: candidates
  // of lower (row, col, len) come first — same order as the CSR)
  for (int64_t w = 0; w < n_words; ++w) {
    const int32_t c = wcls[w];
    if (c < 0) continue;
    const int32_t lo = row_lo[c], hi = row_hi[c];
    const int32_t row = wrow[w];
    if (row < lo || row >= hi) continue;
    const int32_t C = cls_c[c];
    const int64_t rbase = lane_base[c]
        + (static_cast<int64_t>(row - lo) * K) * C;
    for (int64_t ci = cand_off[w]; ci < cand_off[w + 1]; ++ci) {
      const int32_t sid = cand_sid[ci];
      if (sid < 0 || sid >= num_seed) continue;
      const int64_t d = rbase
          + static_cast<int64_t>(cand_len[ci] - 1) * C
          + wcol[w] + cand_pos[ci];
      dest_out[cursor[sid]++] = static_cast<int32_t>(d);
    }
  }
  // pass 3: within each sid segment, dest ascending — the SAME order
  // as the numpy composite-key argsort (tpu/em2.py), so the device
  // program's segmented f32 sums are bit-identical whichever side
  // built the stream
  acc = 0;
  for (int64_t s = 0; s < num_seed; ++s) {
    if (sid_cnt[s] > 1)
      std::sort(dest_out + acc, dest_out + acc + sid_cnt[s]);
    acc += sid_cnt[s];
  }
  return n_cand;
}
