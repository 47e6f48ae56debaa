// zebra_tpu native ingest: fast host-side event-stream parsing.
//
// The TPU compute path is JAX/XLA; this library covers the host-side
// data-loader role (the reference uses pandas + per-line Python loops,
// utils/preprocess_data.py / preprocess_custom_data.py). It parses
// JODIE-style CSV ("u,i,ts,label,feat...") and SNAP-style whitespace
// ("u i ts") event files into packed column arrays, optionally compacting
// non-contiguous node ids (order-preserving rank remap) and sorting by
// timestamp — all single-pass, allocation-light C++.
//
// C ABI (ctypes-friendly):
//   zt_parse_events(path, format, out*)  -> handle with column pointers
//   zt_free(handle)
//
// Columns are int64 u/i, double ts, double label, plus optional features
// (JODIE only; row-major n x d).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

struct Events {
  std::vector<int64_t> u, i;
  std::vector<double> ts, label;
  std::vector<double> feat;  // row-major [n, feat_dim]
  int64_t feat_dim = 0;
};

// Parse one decimal field; advances *p past the field and one delimiter.
inline double parse_double(const char** p) {
  char* end;
  double v = strtod(*p, &end);
  *p = (*end == ',' || *end == ' ' || *end == '\t') ? end + 1 : end;
  return v;
}

inline int64_t parse_int(const char** p) {
  char* end;
  long long v = strtoll(*p, &end, 10);
  *p = (*end == ',' || *end == ' ' || *end == '\t') ? end + 1 : end;
  return v;
}

bool read_file(const char* path, std::vector<char>& buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf.resize(static_cast<size_t>(size) + 1);
  size_t got = fread(buf.data(), 1, static_cast<size_t>(size), f);
  fclose(f);
  buf.resize(got);
  buf.push_back('\0');
  return true;
}

// format: 0 = JODIE csv with header (u,i,ts,label,feat...), 1 = SNAP "u i ts"
Events* parse(const char* path, int format) {
  std::vector<char> buf;
  if (!read_file(path, buf)) return nullptr;

  auto* ev = new Events();
  const char* p = buf.data();
  const char* end = buf.data() + buf.size() - 1;

  if (format == 0) {  // skip header line
    while (p < end && *p != '\n') p++;
    if (p < end) p++;
  }

  bool first_row = true;
  while (p < end) {
    if (*p == '\n' || *p == '\r') { p++; continue; }
    ev->u.push_back(parse_int(&p));
    ev->i.push_back(parse_int(&p));
    ev->ts.push_back(parse_double(&p));
    if (format == 0) {
      ev->label.push_back(parse_double(&p));
      // remaining fields on the line are features
      std::vector<double> row;
      while (p < end && *p != '\n' && *p != '\r') {
        const char* before = p;
        row.push_back(parse_double(&p));
        if (p == before) {  // unparseable text: refuse rather than spin
          delete ev;
          return nullptr;
        }
      }
      if (first_row) {
        ev->feat_dim = static_cast<int64_t>(row.size());
        first_row = false;
      }
      if (static_cast<int64_t>(row.size()) != ev->feat_dim) {
        delete ev;  // ragged feature rows: refuse
        return nullptr;
      }
      ev->feat.insert(ev->feat.end(), row.begin(), row.end());
    } else {
      ev->label.push_back(0.0);
      while (p < end && *p != '\n' && *p != '\r') p++;  // ignore extra fields
    }
    while (p < end && (*p == '\n' || *p == '\r')) p++;
  }
  return ev;
}

// stable sort by timestamp (SNAP preprocessing, reference
// preprocess_custom_data.py:34-40)
void sort_by_time(Events* ev) {
  const size_t n = ev->ts.size();
  std::vector<size_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](size_t a, size_t b) { return ev->ts[a] < ev->ts[b]; });
  auto permute_i = [&](std::vector<int64_t>& v) {
    std::vector<int64_t> out(n);
    for (size_t j = 0; j < n; ++j) out[j] = v[order[j]];
    v.swap(out);
  };
  auto permute_d = [&](std::vector<double>& v) {
    std::vector<double> out(n);
    for (size_t j = 0; j < n; ++j) out[j] = v[order[j]];
    v.swap(out);
  };
  permute_i(ev->u);
  permute_i(ev->i);
  permute_d(ev->ts);
  permute_d(ev->label);
}

// order-preserving compaction of node ids to 0..n_unique-1 (reference
// preprocess_custom_data.py:45-66)
void compact_ids(Events* ev) {
  std::vector<int64_t> all;
  all.reserve(ev->u.size() * 2);
  all.insert(all.end(), ev->u.begin(), ev->u.end());
  all.insert(all.end(), ev->i.begin(), ev->i.end());
  std::sort(all.begin(), all.end());
  all.erase(std::unique(all.begin(), all.end()), all.end());
  auto rank = [&](int64_t id) {
    return static_cast<int64_t>(
        std::lower_bound(all.begin(), all.end(), id) - all.begin());
  };
  for (auto& v : ev->u) v = rank(v);
  for (auto& v : ev->i) v = rank(v);
}

}  // namespace

extern "C" {

struct ZtEvents {
  int64_t n;
  int64_t feat_dim;
  const int64_t* u;
  const int64_t* i;
  const double* ts;
  const double* label;
  const double* feat;
  void* impl;
};

// format: 0 = JODIE csv, 1 = SNAP. flags bit0: sort by time, bit1: compact ids.
ZtEvents* zt_parse_events(const char* path, int format, int flags) {
  Events* ev = parse(path, format);
  if (!ev) return nullptr;
  if (flags & 1) sort_by_time(ev);
  if (flags & 2) compact_ids(ev);
  auto* out = new ZtEvents();
  out->n = static_cast<int64_t>(ev->u.size());
  out->feat_dim = ev->feat_dim;
  out->u = ev->u.data();
  out->i = ev->i.data();
  out->ts = ev->ts.data();
  out->label = ev->label.data();
  out->feat = ev->feat.empty() ? nullptr : ev->feat.data();
  out->impl = ev;
  return out;
}

void zt_free(ZtEvents* h) {
  if (!h) return;
  delete static_cast<Events*>(h->impl);
  delete h;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Wave scheduling for the parallel streaming T-PPR scan.
//
// The SANTA update is sequential per node: edge i must observe the writes of
// every earlier edge that touched src/dst/neg of i. Edges with pairwise
// disjoint nodes can process in one parallel "wave" (all reads precede all
// writes inside a wave, so WAR pairs are safe; RAW/WAW pairs must cross
// waves). Greedy assignment with two per-node clocks:
//
//   wave(i) ≥ 1 + last_write[v]  for v in {src, dst, neg}   (RAW/WAW)
//   wave(i) ≥ last_read[v]       for v in {src, dst}        (WAR: a write
//       may share the reader's wave — reads precede writes — but must not
//       precede it)
//
// bumped past full waves (capacity keeps the device-side wave shape
// static); then last_write[src|dst] = wave(i) and last_read[src|dst|neg]
// advances to wave(i). The result is bit-exact with the sequential scan by
// construction.

namespace {

// Unified greedy scheduler. ``negs`` holds n_neg extraction-read columns,
// laid out [n_neg, n] row-major — one column set per negative stream (the
// seed-parallel trainer extracts a different negative per seed from ONE
// shared scan, so every seed's read must be ordered against writes).
// n_shards > 1 selects owner-aligned lane blocks; n_shards == 1 degenerates
// to block = cap / owner = 0 and is bit-identical to the historical
// unaligned scheduler.
int64_t schedule_impl(const int32_t* src, const int32_t* dst,
                      const int32_t* negs, int32_t n_neg, int64_t n,
                      int64_t n_nodes, int32_t cap, int32_t n_shards,
                      int32_t* wave_out, int32_t* slot_out) {
  if (n_shards < 1) n_shards = 1;
  if (cap % n_shards != 0) return -2;  // blocks must tile the lanes
  const int32_t block = cap / n_shards;
  const int64_t rows_per_shard = (n_nodes + n_shards - 1) / n_shards;
  std::vector<int32_t> last_write(static_cast<size_t>(n_nodes), -1);
  std::vector<int32_t> last_read(static_cast<size_t>(n_nodes), 0);
  std::vector<int32_t> count;  // per (wave, shard) occupancy, stride n_shards
  count.reserve(1024);
  int32_t n_waves = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (src[i] < 0 || src[i] >= n_nodes || dst[i] < 0 || dst[i] >= n_nodes) {
      return -1;  // id out of range: refuse rather than corrupt memory
    }
    int32_t w = std::max(last_write[src[i]], last_write[dst[i]]);
    for (int32_t s = 0; s < n_neg; ++s) {
      const int32_t v = negs[static_cast<int64_t>(s) * n + i];
      if (v < 0 || v >= n_nodes) return -1;
      w = std::max(w, last_write[v]);
    }
    w += 1;
    w = std::max({w, last_read[src[i]], last_read[dst[i]]});
    const int32_t owner =
        n_shards > 1 ? static_cast<int32_t>(src[i] / rows_per_shard) : 0;
    while (static_cast<size_t>(w) * n_shards < count.size() &&
           count[static_cast<size_t>(w) * n_shards + owner] >= block)
      w++;
    if (static_cast<size_t>(w + 1) * n_shards > count.size())
      count.resize(static_cast<size_t>(w + 1) * n_shards, 0);
    wave_out[i] = w;
    slot_out[i] =
        owner * block + count[static_cast<size_t>(w) * n_shards + owner]++;
    last_write[src[i]] = w;
    last_write[dst[i]] = w;
    if (w > last_read[src[i]]) last_read[src[i]] = w;
    if (w > last_read[dst[i]]) last_read[dst[i]] = w;
    for (int32_t s = 0; s < n_neg; ++s) {
      const int32_t v = negs[static_cast<int64_t>(s) * n + i];
      if (w > last_read[v]) last_read[v] = w;
    }
    if (w + 1 > n_waves) n_waves = w + 1;
  }
  return n_waves;
}

}  // namespace

extern "C" int64_t zt_wave_schedule(
    const int32_t* src, const int32_t* dst, const int32_t* neg, int64_t n,
    int64_t n_nodes, int32_t cap, int32_t* wave_out, int32_t* slot_out) {
  return schedule_impl(src, dst, neg, 1, n, n_nodes, cap, 1, wave_out,
                       slot_out);
}

// Multi-negative variant: negs is [n_neg, n] row-major (seed-parallel
// training schedules ONE shared scan whose extraction reads cover every
// seed's negative stream).
extern "C" int64_t zt_wave_schedule_multi(
    const int32_t* src, const int32_t* dst, const int32_t* negs,
    int32_t n_neg, int64_t n, int64_t n_nodes, int32_t cap,
    int32_t n_shards, int32_t* wave_out, int32_t* slot_out) {
  return schedule_impl(src, dst, negs, n_neg, n, n_nodes, cap, n_shards,
                       wave_out, slot_out);
}

// Owner-aligned variant for sharded meshes: the cap lanes partition into
// n_shards equal blocks and every edge lands in the lane block of its src
// row's owner shard (contiguous row sharding over node id, owner(v) =
// v / ceil(n_nodes / n_shards) — matching jax.sharding PartitionSpec('data')
// on the [N, F] state). A per-shard wave executor (shard_map) then finds
// each of its lane block's src rows locally; only dst/neg rows can cross
// shards. Dependency rules are identical to zt_wave_schedule, so the result
// stays bit-exact with the sequential scan; skew toward one shard inflates
// the wave count instead of breaking alignment (block capacity is the
// constraint). n_shards == 1 degenerates to the unaligned scheduler.
extern "C" int64_t zt_wave_schedule_aligned(
    const int32_t* src, const int32_t* dst, const int32_t* neg, int64_t n,
    int64_t n_nodes, int32_t cap, int32_t n_shards, int32_t* wave_out,
    int32_t* slot_out) {
  return schedule_impl(src, dst, neg, 1, n, n_nodes, cap, n_shards, wave_out,
                       slot_out);
}
