// SPTC1 native codec — serial C++ implementation of the format defined in
// FORMAT.md. Byte-identical to the Python spec (screenpressor_tpu/spec) and
// the JAX path; used as the host runtime / low-latency fallback and as a
// second independent implementation for conformance testing.
//
// Reference analogs (capability, not code): rANS primitives `rans_byte.h`,
// adaptive tables `ans_contexts.h:1053-1132`, codec core `screencap.cpp`.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 sptc.cpp -o libsptc.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <array>
#include <map>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace sptc {

// ----- constants (config.py) ------------------------------------------------
constexpr int PROB_BITS = 14;
constexpr int PROB_SCALE = 1 << PROB_BITS;
constexpr uint32_t RANS_L = 1u << 23;
constexpr int STEP = 512;
constexpr int RESCALE_SHIFT = 13;
constexpr int COLOR_CTX_BITS_A = 8;  // first conditioning channel (full)
constexpr int COLOR_CTX_BITS_B = 4;  // second channel (SPTC4, round-4 sweep)
constexpr int COLOR_CTX_SHIFT_A = 8 - COLOR_CTX_BITS_A;
constexpr int COLOR_CTX_SHIFT = 8 - COLOR_CTX_BITS_B;
constexpr int COLOR_CTX_ROWS = 1 << (COLOR_CTX_BITS_A + COLOR_CTX_BITS_B);
constexpr int MIX_ESC_C = 256;  // SPTC3 escalating-weight constant (config.py)
constexpr int K_MAX = 256;
constexpr int TARGET_PER_LANE = 256;
constexpr int BLOCK = 16;
constexpr int MAX_RUN = 255;
constexpr int MV_OFFSET = 256;
constexpr int X_MAX_SHIFT = 23 - PROB_BITS + 8;
constexpr uint8_t VER_NIBBLE = 0xA;
enum { ALG_FLAT = 1, ALG_I = 2, ALG_P = 3, ALG_RAW = 4 };
enum { PT_LIT = 0, PT_LEFT = 1, PT_ABOVE = 2, PT_PREV = 3, PT_GRAD = 4, PT_AL = 5 };

struct StreamError : std::runtime_error {
  using std::runtime_error::runtime_error;
};

static int next_pow2(int n) {
  if (n <= 1) return 1;
  int p = 1;
  while (p < n) p <<= 1;
  return p;
}

static inline int color_ctx(int a, int b) {
  return ((a >> COLOR_CTX_SHIFT_A) << COLOR_CTX_BITS_B) | (b >> COLOR_CTX_SHIFT);
}

static int lane_count(int n) {
  // FORMAT.md "Lane policy": target 256 records/lane up to 32 lanes, then
  // 4096 records/lane (per-lane stream overhead ~6 B; see config.lane_count)
  if (n <= 0) return 1;
  int k = next_pow2((n + TARGET_PER_LANE - 1) / TARGET_PER_LANE);
  if (k > 32) {
    int t16 = 16 * TARGET_PER_LANE;
    k = std::max(32, next_pow2((n + t16 - 1) / t16));
  }
  return std::min(K_MAX, k);
}

// ----- adaptive tables (spec/tables.py, SPTC3 semantics) --------------------
// Mixed kinds (color, nrun) back off to one per-kind GLOBAL row scaled at
// coding time to fill exactly the code space a context row leaves unused
// (config.py MIX_KINDS; the fixed-shape replacement for the reference's
// escalating Cx1-7 cold start).
struct Table {
  int rows, A, step;
  bool mixed;
  int gstep;
  std::vector<int32_t> cnt;
  std::vector<int32_t> cntsum;
  std::vector<int32_t> gcnt;
  int32_t gsum = 0;

  Table(int rows_, int a, bool mixed_ = false, int step_ = STEP)
      : rows(rows_), A(a), step(step_), mixed(mixed_), gstep(step_) { renew(); }

  void renew() {
    // init strictly below the rescale threshold (spec/tables.py); mixed
    // (escalating-weight) rows start EMPTY
    if (mixed) {
      cnt.assign((size_t)rows * A, 0);
      cntsum.assign(rows, 0);
      int g = std::max((PROB_SCALE - gstep - A) / A, 1);
      gcnt.assign(A, g);
      gsum = g * A;
    } else {
      int f = std::max((PROB_SCALE - step - A) / A, 1);
      cnt.assign((size_t)rows * A, f);
      cntsum.assign(rows, f * A);
    }
  }

  // effective coding distribution for row r into eff[0..A)
  // (escalating backoff, spec/tables.py Table._eff: the row's counts scale
  // to a fill target growing with its observation mass; the global row
  // scales into the remaining space)
  void eff_row(int r, int32_t* eff) const {
    const int32_t* cr = &cnt[(size_t)r * A];
    if (!mixed) {
      std::memcpy(eff, cr, sizeof(int32_t) * A);
      return;
    }
    int32_t s_obs = cntsum[r];
    int32_t target =
        (int32_t)(((int64_t)(PROB_SCALE - 2 * A) * s_obs) / (s_obs + MIX_ESC_C));
    int32_t sc_r = (int32_t)(((int64_t)target << RESCALE_SHIFT) /
                             std::max(s_obs, 1));
    int64_t row_sum = 0;
    for (int i = 0; i < A; i++) {
      eff[i] = (int32_t)(((int64_t)cr[i] * sc_r) >> RESCALE_SHIFT);
      row_sum += eff[i];
    }
    int32_t spare = (int32_t)((PROB_SCALE - A) - row_sum);
    int32_t sc = (int32_t)(((int64_t)spare << RESCALE_SHIFT) / std::max(gsum, 1));
    for (int i = 0; i < A; i++)
      eff[i] += std::max<int32_t>(
          (int32_t)(((int64_t)gcnt[i] * sc) >> RESCALE_SHIFT), 1);
  }

  void interval(int r, int s, int& cu, int& fr) const {
    if (!mixed) {
      const int32_t* cr = &cnt[(size_t)r * A];
      int32_t cf = 0;
      for (int i = 0; i < s; i++) cf += cr[i];
      cu = cf;
      fr = cr[s];
      return;
    }
    int32_t eff[512];
    eff_row(r, eff);
    int32_t cf = 0;
    for (int i = 0; i < s; i++) cf += eff[i];
    cu = cf;
    fr = eff[s];
  }

  int lookup(int r, int sf, int& cu, int& fr) const {
    // last symbol whose interval start is <= sf (live prefix walk)
    int32_t eff[512];
    const int32_t* cr;
    if (mixed) {
      eff_row(r, eff);
      cr = eff;
    } else {
      cr = &cnt[(size_t)r * A];
    }
    int32_t cf = 0;
    int c = 0;
    while (c + 1 < A && cf + cr[c] <= sf) cf += cr[c++];
    cu = cf;
    fr = cr[c];
    return c;
  }

  void rescale_row(int r) {
    int32_t* c = &cnt[(size_t)r * A];
    int target = PROB_SCALE - step - A;
    int64_t sc = ((int64_t)target << RESCALE_SHIFT) / cntsum[r];
    int32_t cs = 0;
    for (int i = 0; i < A; i++) {
      c[i] = std::max<int32_t>((int32_t)(((int64_t)c[i] * sc) >> RESCALE_SHIFT), 1);
      cs += c[i];
    }
    cntsum[r] = cs;
  }

  void update_batch(const std::vector<std::pair<int, int>>& rs) {
    for (auto& p : rs) {
      cnt[(size_t)p.first * A + p.second] += step;
      cntsum[p.first] += step;
    }
    std::vector<int> touched;
    for (auto& p : rs) touched.push_back(p.first);
    std::sort(touched.begin(), touched.end());
    touched.erase(std::unique(touched.begin(), touched.end()), touched.end());
    for (int r : touched)
      if (cntsum[r] > PROB_SCALE - step) rescale_row(r);
    if (mixed && !rs.empty()) {
      for (auto& p : rs) gcnt[p.second] += gstep;
      gsum += gstep * (int32_t)rs.size();
      if (gsum > PROB_SCALE - gstep) {
        int target = PROB_SCALE - gstep - A;
        int64_t sc = ((int64_t)target << RESCALE_SHIFT) / gsum;
        int32_t cs = 0;
        for (int i = 0; i < A; i++) {
          gcnt[i] = std::max<int32_t>(
              (int32_t)(((int64_t)gcnt[i] * sc) >> RESCALE_SHIFT), 1);
          cs += gcnt[i];
        }
        gsum = cs;
      }
    }
  }
};

struct TableSet {
  Table ptype{6, 6}, nrun{6, 256, true}, color{3 * COLOR_CTX_ROWS, 256, true},
      bt{1, 5}, btn{1, 256}, sxy{4, 16}, mvflag{1, 2}, mv{2, 512};
  void renew() {
    ptype.renew(); nrun.renew(); color.renew(); bt.renew();
    btn.renew(); sxy.renew(); mvflag.renew(); mv.renew();
  }
};

// ----- rANS (spec/rans.py) ---------------------------------------------------
struct RansEnc {
  uint32_t x = RANS_L;
  std::vector<uint8_t> rev;  // emission order (reverse of decode order)
  void put(uint32_t cu, uint32_t fr) {
    uint32_t xm = fr << X_MAX_SHIFT;
    while (x >= xm) {
      rev.push_back(x & 0xFF);
      x >>= 8;
    }
    x = ((x / fr) << PROB_BITS) + (x % fr) + cu;
  }
  std::vector<uint8_t> out() const {
    std::vector<uint8_t> o;
    o.reserve(rev.size() + 4);
    o.push_back(x & 0xFF); o.push_back((x >> 8) & 0xFF);
    o.push_back((x >> 16) & 0xFF); o.push_back((x >> 24) & 0xFF);
    for (auto it = rev.rbegin(); it != rev.rend(); ++it) o.push_back(*it);
    return o;
  }
};

struct RansDec {
  uint32_t x = 0;
  const uint8_t* p;
  const uint8_t* end;
  RansDec(const uint8_t* d, size_t n) : p(d), end(d + n) {
    if (n < 4) throw StreamError("lane blob too short");
    x = (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
        ((uint32_t)p[3] << 24);
    p += 4;
  }
  int get() const { return x & (PROB_SCALE - 1); }
  void advance(uint32_t cu, uint32_t fr) {
    x = fr * (x >> PROB_BITS) + (x & (PROB_SCALE - 1)) - cu;
    while (x < RANS_L) {
      if (p >= end) throw StreamError("rANS input exhausted");
      x = (x << 8) | *p++;
    }
  }
};

// ----- section coder (spec/coder.py) ----------------------------------------
// Record = fixed-width int tuple. Codec kinds mirror the Python spec.

struct Rec { int32_t v[4]; };

enum CodecKind { C_REC, C_COL, C_BT, C_SXY, C_MV };

struct LaneState { int32_t a = 0, b = 0; };

struct SubSym { bool active; Table* tab; int row, sym; };

struct SectionCodec {
  CodecKind kind;
  TableSet& T;
  SectionCodec(CodecKind k, TableSet& t) : kind(k), T(t) {}

  int substeps() const {
    switch (kind) {
      case C_REC: case C_BT: return 2;
      case C_COL: case C_MV: return 3;
      case C_SXY: return 4;
    }
    return 0;
  }
  int width() const {
    switch (kind) {
      case C_REC: case C_BT: case C_MV: return 2;
      case C_COL: return 3;
      case C_SXY: return 4;
    }
    return 0;
  }

  // encode view: (table,row,sym) for sub-step j of record r given state
  bool enc_sym(int j, const Rec& r, const LaneState& st, Table*& tab, int& row,
               int& sym) const {
    switch (kind) {
      case C_REC:
        if (j == 0) { tab = &T.ptype; row = st.a; sym = r.v[0]; }
        else { tab = &T.nrun; row = r.v[0]; sym = r.v[1] - 1; }
        return true;
      case C_BT:
        if (j == 0) { tab = &T.bt; row = 0; sym = r.v[0]; }
        else { tab = &T.btn; row = 0; sym = r.v[1] - 1; }
        return true;
      case C_SXY:
        tab = &T.sxy; row = j; sym = r.v[j];
        return true;
      case C_COL: {
        tab = &T.color;
        int pg = st.a, pb = st.b;
        if (j == 0) { row = color_ctx(pg, pb); sym = r.v[0]; }
        else if (j == 1) { row = COLOR_CTX_ROWS + color_ctx(pb, r.v[0]); sym = r.v[1]; }
        else { row = 2 * COLOR_CTX_ROWS + color_ctx(r.v[0], r.v[1]); sym = r.v[2]; }
        return true;
      }
      case C_MV: {
        bool same = (r.v[0] == st.a && r.v[1] == st.b);
        if (j == 0) { tab = &T.mvflag; row = 0; sym = same ? 1 : 0; return true; }
        if (same) return false;
        tab = &T.mv; row = j - 1; sym = r.v[j - 1] + MV_OFFSET;
        return true;
      }
    }
    return false;
  }

  // decode view: context for sub-step j given partial symbols
  bool dec_ctx(int j, const int32_t* partial, const LaneState& st, Table*& tab,
               int& row) const {
    switch (kind) {
      case C_REC:
        if (j == 0) { tab = &T.ptype; row = st.a; }
        else { tab = &T.nrun; row = partial[0]; }
        return true;
      case C_BT:
        tab = (j == 0) ? &T.bt : &T.btn; row = 0;
        return true;
      case C_SXY:
        tab = &T.sxy; row = j;
        return true;
      case C_COL: {
        tab = &T.color;
        int pg = st.a, pb = st.b;
        if (j == 0) row = color_ctx(pg, pb);
        else if (j == 1) row = COLOR_CTX_ROWS + color_ctx(pb, partial[0]);
        else row = 2 * COLOR_CTX_ROWS + color_ctx(partial[0], partial[1]);
        return true;
      }
      case C_MV:
        if (j == 0) { tab = &T.mvflag; row = 0; return true; }
        if (partial[0] == 1) return false;
        tab = &T.mv; row = j - 1;
        return true;
    }
    return false;
  }

  void finish(const int32_t* partial, LaneState& st, Rec& out) const {
    switch (kind) {
      case C_REC:
        out.v[0] = partial[0]; out.v[1] = partial[1] + 1; st.a = partial[0];
        break;
      case C_BT:
        out.v[0] = partial[0]; out.v[1] = partial[1] + 1;
        break;
      case C_SXY:
        for (int i = 0; i < 4; i++) out.v[i] = partial[i];
        break;
      case C_COL:
        for (int i = 0; i < 3; i++) out.v[i] = partial[i];
        st.a = partial[1]; st.b = partial[2];
        break;
      case C_MV:
        if (partial[0] == 1) { out.v[0] = st.a; out.v[1] = st.b; }
        else { out.v[0] = partial[1] - MV_OFFSET; out.v[1] = partial[2] - MV_OFFSET; }
        st.a = out.v[0]; st.b = out.v[1];
        break;
    }
  }
  void enc_state(const Rec& r, LaneState& st) const {
    switch (kind) {
      case C_REC: st.a = r.v[0]; break;
      case C_COL: st.a = r.v[1]; st.b = r.v[2]; break;
      case C_MV: st.a = r.v[0]; st.b = r.v[1]; break;
      default: break;
    }
  }
};

static void lane_ranges(int n, int k, std::vector<int>& start, std::vector<int>& len) {
  int base = n / k, rem = n % k, s = 0;
  start.resize(k); len.resize(k);
  for (int i = 0; i < k; i++) {
    len[i] = base + (i < rem ? 1 : 0);
    start[i] = s;
    s += len[i];
  }
}

static std::vector<std::vector<uint8_t>> encode_section(
    const std::vector<Rec>& records, int k, SectionCodec codec) {
  int n = (int)records.size();
  std::vector<int> start, len;
  lane_ranges(n, k, start, len);
  int tmax = 0;
  for (int l : len) tmax = std::max(tmax, l);
  std::vector<LaneState> st(k);
  std::vector<std::vector<std::pair<uint16_t, uint16_t>>> iv(k);
  std::vector<std::pair<int, int>> upd_ptype, upd;
  int S = codec.substeps();
  for (int t = 0; t < tmax; t++) {
    for (int j = 0; j < S; j++) {
      std::map<Table*, std::vector<std::pair<int, int>>> by_tab;
      std::vector<Table*> order;
      for (int lane = 0; lane < k; lane++) {
        if (t >= len[lane]) continue;
        const Rec& r = records[start[lane] + t];
        Table* tab; int row, sym;
        if (!codec.enc_sym(j, r, st[lane], tab, row, sym)) continue;
        int cu, fr;
        tab->interval(row, sym, cu, fr);
        iv[lane].push_back({(uint16_t)cu, (uint16_t)fr});
        if (!by_tab.count(tab)) order.push_back(tab);
        by_tab[tab].push_back({row, sym});
      }
      for (Table* tab : order) tab->update_batch(by_tab[tab]);
    }
    for (int lane = 0; lane < k; lane++)
      if (t < len[lane]) codec.enc_state(records[start[lane] + t], st[lane]);
  }
  std::vector<std::vector<uint8_t>> blobs(k);
  for (int lane = 0; lane < k; lane++) {
    if (iv[lane].empty()) continue;
    RansEnc e;
    for (auto it = iv[lane].rbegin(); it != iv[lane].rend(); ++it)
      e.put(it->first, it->second);
    blobs[lane] = e.out();
  }
  return blobs;
}

static std::vector<Rec> decode_section(
    const std::vector<std::pair<const uint8_t*, size_t>>& blobs, int n, int k,
    SectionCodec codec) {
  std::vector<int> start, len;
  lane_ranges(n, k, start, len);
  int tmax = 0;
  for (int l : len) tmax = std::max(tmax, l);
  std::vector<LaneState> st(k);
  std::vector<std::unique_ptr<RansDec>> dec(k);
  for (int lane = 0; lane < k; lane++)
    if (len[lane] > 0) dec[lane].reset(new RansDec(blobs[lane].first, blobs[lane].second));
  std::vector<Rec> out(n);
  int S = codec.substeps();
  std::vector<std::array<int32_t, 4>> partial(k);
  for (int t = 0; t < tmax; t++) {
    for (auto& p : partial) p.fill(0);
    for (int j = 0; j < S; j++) {
      std::map<Table*, std::vector<std::pair<int, int>>> by_tab;
      std::vector<Table*> order;
      for (int lane = 0; lane < k; lane++) {
        if (t >= len[lane]) continue;
        Table* tab; int row;
        if (!codec.dec_ctx(j, partial[lane].data(), st[lane], tab, row)) {
          partial[lane][j] = 0;
          continue;
        }
        int cu, fr;
        int sym = tab->lookup(row, dec[lane]->get(), cu, fr);
        dec[lane]->advance(cu, fr);
        partial[lane][j] = sym;
        if (!by_tab.count(tab)) order.push_back(tab);
        by_tab[tab].push_back({row, sym});
      }
      for (Table* tab : order) tab->update_batch(by_tab[tab]);
    }
    for (int lane = 0; lane < k; lane++)
      if (t < len[lane]) codec.finish(partial[lane].data(), st[lane], out[start[lane] + t]);
  }
  return out;
}

}  // namespace sptc

// (frame codec + C API in sptc_frame.cpp, included below for one TU build)
#include "sptc_frame.cpp"
