// SCPR version-3/4 interop codec (backward compatibility with the reference
// ScreenPressor 3.x/4.x rANS bitstream format).
//
// Written from a behavioral study of the reference (not ported):
//  - byte rANS semantics: L = 1<<23, PROB_BITS = 12, byte renorm, 4-byte LE
//    flush/init (`rans_byte.h:39-146`)
//  - 128K-interval entropy blocks, each an independent reverse-encoded rANS
//    stream with bypass bytes placed inline (`ransmt.h:38,116-134`); the
//    decoder counts symbols (incl. bypass and bools) and re-seeds its state
//    every 128K (`screencap.h:326-359`)
//  - escalating per-context models Cx1..Cx7 with auto-upgrade
//    (`ans_contexts.h:62-1008`, `ans_contexts.cpp:3-80`) and fixed-alphabet
//    adaptive tables `FixedSizeRansCtx<N>` (`ans_contexts.h:1053-1132`)
//  - `UseANS` symbol-kind strategy incl. the raw-byte bypass while a context
//    is still a pure symbol list, and the p=1/2 bool coder
//    (`screencap.h:270-422`)
//  - v3/v4 walk additions: same-MV-as-previous bool per motion block
//    (`screencap.cpp:1199-1213,1348-1362`); Cx6 initial frequency f0 = 64
//    (v3) / 32 (v4) (`screencap.cpp:1613-1614`)
//
// Deliberate structural deviations (observable state stays in lockstep):
// the reference uses different lookup structures on the encode side (Robin-
// Hood hash, `ans_contexts.h:377-560`) and decode side (freq-sorted linear
// array with move-to-front), which never affect the emitted intervals; this
// implementation uses one symbol-indexed representation for both directions.
// Its table-capacity growth points (S 32->64 at d 24 vs 32) are likewise
// structural; the observable upgrade edge is d == 40 (MaxD6) on both sides.
// The frame walk mirrors the deterministic single-worker variant (like
// scpr_legacy.cpp; the reference's work-stealing changes scheduling only,
// not the stream, `screencap.cpp:972`).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 scpr_ans.cpp -o libscpr34.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <vector>
#include <cstdio>
#include <cstdlib>

// Debug symbol tracing (SCPR_ANS_TRACE=/path): dumps every decoded symbol
// with its context kind, for oracle-divergence debugging.
static FILE* scpr_ans_trace_file() {
  static FILE* f = [] {
    const char* p = getenv("SCPR_ANS_TRACE");
    return p ? fopen(p, "w") : (FILE*)nullptr;
  }();
  return f;
}
#define SCPR_ANS_TRACE(...)                      \
  do {                                           \
    if (FILE* tf_ = scpr_ans_trace_file()) {     \
      fprintf(tf_, __VA_ARGS__);                 \
    }                                            \
  } while (0)


namespace scpr34 {

using u8 = uint8_t;
using u16 = uint16_t;
using u32 = uint32_t;

constexpr int PROB_BITS = 12;
constexpr int PROB_SCALE = 1 << PROB_BITS;
constexpr u32 RANS_L = 1u << 23;
constexpr int BLOCK_B = 128 * 1024;  // intervals per rANS block (ransmt.h:38)
constexpr int STEP_CX5 = 50;
constexpr int STEP_CX6 = 25;
constexpr int STEP_CX7 = 16;
constexpr int STEP_FX = 16;
constexpr int MAXD6 = 40;

struct StreamError : std::runtime_error {
  using std::runtime_error::runtime_error;
};

struct Freq {
  u16 freq, cumFreq;  // freq==0 => bypass byte with value cumFreq
};

// ---- rANS primitives (behavioral: rans_byte.h) -----------------------------
static inline void rans_enc_put(u32& x, std::vector<u8>& rev, u32 cum, u32 fr) {
  const u32 x_max = ((RANS_L >> PROB_BITS) << 8) * fr;
  while (x >= x_max) {
    rev.push_back((u8)x);
    x >>= 8;
  }
  x = ((x / fr) << PROB_BITS) + (x % fr) + cum;
}

struct RansDec {
  u32 x = 0;
  const u8* p = nullptr;
  const u8* end = nullptr;

  void init() {
    if (p + 4 > end) throw StreamError("v3/v4 rANS input exhausted");
    x = (u32)p[0] | ((u32)p[1] << 8) | ((u32)p[2] << 16) | ((u32)p[3] << 24);
    p += 4;
  }
  u32 get() const { return x & (PROB_SCALE - 1); }
  void advance(u32 cum, u32 fr) {
    x = fr * (x >> PROB_BITS) + (x & (PROB_SCALE - 1)) - cum;
    while (x < RANS_L) {
      if (p >= end) throw StreamError("v3/v4 rANS input exhausted");
      x = (x << 8) | *p++;
    }
  }
};

// ---- pipelined block writer (ransmt.h semantics, single-threaded) ----------
struct BlockWriter {
  std::vector<Freq> ranges;
  std::vector<u8>* out = nullptr;

  void start(std::vector<u8>* dst) {
    out = dst;
    ranges.clear();
    ranges.reserve(BLOCK_B);
  }
  void put(Freq fr) {
    ranges.push_back(fr);
    if ((int)ranges.size() == BLOCK_B) flush_block();
  }
  void flush_block() {
    u32 x = RANS_L;
    std::vector<u8> rev;  // bytes in reverse emission order
    rev.reserve(ranges.size() * 2 + 4);
    for (int i = (int)ranges.size() - 1; i >= 0; i--) {
      if (ranges[i].freq)
        rans_enc_put(x, rev, ranges[i].cumFreq, ranges[i].freq);
      else
        rev.push_back((u8)ranges[i].cumFreq);  // bypass byte
    }
    // 4-byte LE flush in front of the code bytes (`rev` is reversed into the
    // stream, so push high byte first)
    rev.push_back((u8)(x >> 24));
    rev.push_back((u8)(x >> 16));
    rev.push_back((u8)(x >> 8));
    rev.push_back((u8)(x >> 0));
    out->insert(out->end(), rev.rbegin(), rev.rend());
    ranges.clear();
  }
  void finish() {
    if (!ranges.empty()) flush_block();
  }
};

// ---- escalating contexts (ans_contexts.h, symbol-indexed re-derivation) ----
struct Context {
  u8 kind = 0;
  std::vector<u8> list;   // kinds 1..3 (pure symbol lists; n == d)
  // kinds 4/5 (SmallContext<4|16>): sorted symbols + freqs
  std::vector<u8> ssym;
  std::vector<u16> sfreq;
  int maxpos = 0;
  int cntsum5 = 0;        // kind 5 running total (Cx5.cntsum)
  // kind 6: per-symbol interval snapshots + counts
  struct Sym6 { u8 sym; Freq fr; u16 cnt; };
  std::vector<Sym6> syms6;
  int fshift = 0;
  int cntsum6 = 0;
  // kind 7: full table
  std::vector<Freq> freqs7;
  std::vector<u16> cnts7;
  int cntsum7 = 0;

  void renew() {
    kind = 0;
    maxpos = 0;
    list.clear(); ssym.clear(); sfreq.clear(); syms6.clear();
    freqs7.clear(); cnts7.clear();
  }

  // ---- kinds 4/5: SmallContext semantics (ans_contexts.h:153-291) ----
  static void norm_shift(int& shift, int& tot) {
    while (tot <= PROB_SCALE / 2) { tot <<= 1; shift++; }
  }
  int small_tot() const {
    int t = 256 - (int)ssym.size();
    for (u16 f : sfreq) t += f;
    return t;
  }
  void small_rescale(int& totFr) {
    int s = 256 - (int)ssym.size();
    for (auto& f : sfreq) { f = (u16)(f - (f >> 1)); s += f; }
    totFr = s;
  }
  bool small_add(int pos, u8 c, int& totFr, int cap) {
    if ((int)ssym.size() == cap) return false;
    ssym.insert(ssym.begin() + pos, c);
    sfreq.insert(sfreq.begin() + pos, (u16)STEP_CX5);
    if (maxpos >= pos) maxpos++;
    totFr += STEP_CX5;
    if (totFr + STEP_CX5 > PROB_SCALE) small_rescale(totFr);
    return true;
  }
  bool small_encode(u8 c, Freq& interval, int& totFr, int cap) {
    int shift = 0, tot = totFr;
    norm_shift(shift, tot);
    const int bonus = (PROB_SCALE - tot) >> shift;
    const int d = (int)ssym.size();
    int cumFr = 0, lastSymb = 0;
    for (int pos = 0; pos < d; pos++) {
      const u8 s = ssym[pos];
      const int fr_pos = sfreq[pos] + (pos == maxpos ? bonus : 0);
      if (s == c) {
        cumFr += c - lastSymb;
        interval.cumFreq = (u16)(cumFr << shift);
        interval.freq = (u16)(fr_pos << shift);
        sfreq[pos] = (u16)(sfreq[pos] + STEP_CX5); totFr += STEP_CX5;
        if (pos != maxpos && sfreq[pos] > sfreq[maxpos]) maxpos = pos;
        if (totFr + STEP_CX5 > PROB_SCALE) small_rescale(totFr);
        return true;
      }
      if (c < s) {
        cumFr += c - lastSymb;
        interval.cumFreq = (u16)(cumFr << shift);
        interval.freq = (u16)(1 << shift);
        return small_add(pos, c, totFr, cap);
      }
      cumFr += s - lastSymb + fr_pos;
      lastSymb = s + 1;
    }
    cumFr += c - lastSymb;
    interval.cumFreq = (u16)(cumFr << shift);
    interval.freq = (u16)(1 << shift);
    return small_add(d, c, totFr, cap);
  }
  bool small_decode(int someFreq, u8& c, Freq& interval, int& totFr, int cap) {
    int shift = 0, tot = totFr;
    norm_shift(shift, tot);
    someFreq >>= shift;
    const int bonus = (PROB_SCALE - tot) >> shift;
    const int d = (int)ssym.size();
    int cumFr = 0, lastSymb = 0;
    for (int pos = 0; pos < d; pos++) {
      const u8 s = ssym[pos];
      const int fr_pos = sfreq[pos] + (pos == maxpos ? bonus : 0);
      const int startFr = cumFr + s - lastSymb;
      if (someFreq < startFr) {  // unmet symbol below s
        c = (u8)(someFreq - cumFr + lastSymb);
        cumFr = someFreq;
        interval.cumFreq = (u16)(cumFr << shift);
        interval.freq = (u16)(1 << shift);
        return small_add(pos, c, totFr, cap);
      }
      if (startFr + fr_pos > someFreq) {  // s == c
        c = s;
        cumFr += c - lastSymb;
        interval.cumFreq = (u16)(cumFr << shift);
        interval.freq = (u16)(fr_pos << shift);
        sfreq[pos] = (u16)(sfreq[pos] + STEP_CX5); totFr += STEP_CX5;
        if (pos != maxpos && sfreq[pos] > sfreq[maxpos]) maxpos = pos;
        if (totFr + STEP_CX5 > PROB_SCALE) small_rescale(totFr);
        return true;
      }
      cumFr += s - lastSymb + fr_pos;
      lastSymb = s + 1;
    }
    c = (u8)(lastSymb + someFreq - cumFr);
    interval.cumFreq = (u16)(someFreq << shift);
    interval.freq = (u16)(1 << shift);
    return small_add(d, c, totFr, cap);
  }

  void create45_from_list(u8 c) {  // Cx1 Found -> Cx4/Cx5 (:158-172)
    ssym.assign(list.begin(), list.end());
    std::sort(ssym.begin(), ssym.end());
    sfreq.assign(ssym.size(), (u16)STEP_CX5);
    maxpos = 0;
    for (size_t i = 0; i < ssym.size(); i++)
      if (ssym[i] == c) { sfreq[i] = 2 * STEP_CX5; maxpos = (int)i; }
    list.clear();
    if (kind == 5) cntsum5 = small_tot();
  }
  void create5_from_4(u8 c) {  // Cx4 full -> Cx5, inserting c (:349-368)
    size_t pos = 0;
    while (pos < ssym.size() && ssym[pos] < c) pos++;
    ssym.insert(ssym.begin() + pos, c);
    sfreq.insert(sfreq.begin() + pos, (u16)STEP_CX5);
    // The reference's Cx5::create(Cx4&) copies into a value-initialized
    // SmallContext and never assigns maxpos, leaving it 0
    // (ans_contexts.h:350-369); the bonus then goes to slot 0 until a
    // later encode moves it.  Bit-exactness requires replicating that.
    maxpos = 0;
    int totFr = 0;
    for (u16 f : sfreq) totFr += f;
    if (totFr > PROB_SCALE) small_rescale(totFr);
    cntsum5 = small_tot();
  }

  // ---- kind 6 helpers (ans_contexts.h:377-829) ----
  Sym6* find6(u8 c) {
    for (auto& s : syms6)
      if (s.sym == c) return &s;
    return nullptr;
  }
  Freq unmet_interval6(u8 c) const {
    Freq fr;
    fr.freq = (u16)(1 << fshift);
    fr.cumFreq = 0;
    if (c > 0) {
      int lowerSym = -1;
      Freq lfr{0, 0};
      for (const auto& s : syms6)
        if (s.sym > lowerSym && s.sym < c) { lowerSym = s.sym; lfr = s.fr; }
      if (lfr.freq > 0)
        fr.cumFreq = (u16)(lfr.cumFreq + lfr.freq + ((c - lowerSym - 1) << fshift));
      else
        fr.cumFreq = (u16)(c << fshift);
    }
    return fr;
  }
  void calc_sum6() {
    const int shft = fshift > 0 ? fshift - 1 : 0;
    int sum = (256 - (int)syms6.size()) << shft;
    for (const auto& s : syms6) sum += s.cnt;
    cntsum6 = sum;
  }
  void rescale6() {  // ans_contexts.h:735-787 (freq := cnt, fshift--)
    const int sh = fshift > 0 ? fshift - 1 : 0;
    const int c0 = 1 << sh;
    u16 cnts_all[256];
    for (int i = 0; i < 256; i++) cnts_all[i] = (u16)c0;
    for (const auto& s : syms6) cnts_all[s.sym] = s.cnt;
    u16 cum_all[256];
    int cf = 0;
    for (int i = 0; i < 256; i++) { cum_all[i] = (u16)cf; cf += cnts_all[i]; }
    if (fshift > 0) fshift--;
    const int shft = fshift > 0 ? fshift - 1 : 0;
    int cntsum = (256 - (int)syms6.size()) << shft;
    for (auto& s : syms6) {
      s.cnt = (u16)(s.cnt - (s.cnt >> 1));
      cntsum += s.cnt;
      s.fr.freq = cnts_all[s.sym];
      s.fr.cumFreq = cum_all[s.sym];
    }
    cntsum6 = cntsum;
  }
  void incr6(Sym6& s) {
    const int step = STEP_CX6 << fshift;
    s.cnt = (u16)(s.cnt + step);
    cntsum6 += step;
    if (cntsum6 + step > PROB_SCALE) rescale6();
  }
  bool add6(u8 c, Freq fr) {  // false => upgrade to Cx7 (d == MaxD6)
    if ((int)syms6.size() >= MAXD6) return false;
    syms6.push_back({c, fr, (u16)(fr.freq - (fr.freq >> 1))});
    incr6(syms6.back());
    return true;
  }
  void create6_from_small(u8 c) {  // Cx5 full -> Cx6, 17th symbol c (:454-489)
    const int totFr = small_tot();
    int shift = 0, tot = totFr;
    norm_shift(shift, tot);
    syms6.clear();
    int cumFr = 0, lastSymb = 0;
    for (size_t pos = 0; pos < ssym.size(); pos++) {
      const u8 s = ssym[pos];
      cumFr += s - lastSymb;
      const int cfr = sfreq[pos];
      Freq fr;
      fr.freq = (u16)(cfr << shift);
      fr.cumFreq = (u16)(cumFr << shift);
      syms6.push_back({s, fr, (u16)(fr.freq - (fr.freq >> 1))});
      cumFr += cfr;
      lastSymb = s + 1;
    }
    fshift = shift;
    ssym.clear(); sfreq.clear();
    // add(c) with the unmet interval, count it, THEN recompute the sum —
    // the reference's incrCnt runs against a zeroed cntsum and calcSum
    // recomputes afterwards (no rescale possible at this point)
    const Freq fr = unmet_interval6(c);
    syms6.push_back({c, fr, (u16)(fr.freq - (fr.freq >> 1))});
    syms6.back().cnt = (u16)(syms6.back().cnt + (STEP_CX6 << fshift));
    calc_sum6();
  }
  void create6_from_list(u8 c, int f0) {  // Cx2 Found -> Cx6 (:513-546)
    const int oldd = (int)list.size();
    const int totFr = 256 - oldd + oldd * f0 + f0;
    int shift = 0, tot = totFr;
    norm_shift(shift, tot);
    std::sort(list.begin(), list.end());
    syms6.clear();
    int cumFr = 0, lastSymb = 0;
    for (int pos = 0; pos < oldd; pos++) {
      const u8 s = list[pos];
      cumFr += s - lastSymb;
      const int cfr = (s == c) ? f0 * 2 : f0;
      Freq fr;
      fr.freq = (u16)(cfr << shift);
      fr.cumFreq = (u16)(cumFr << shift);
      syms6.push_back({s, fr, (u16)(fr.freq - (fr.freq >> 1))});
      cumFr += cfr;
      lastSymb = s + 1;
    }
    fshift = shift;
    list.clear();
    calc_sum6();
  }

  // ---- kind 7 (ans_contexts.h:847-998) ----
  void incr7(int c) {
    cnts7[c] = (u16)(cnts7[c] + STEP_CX7);
    cntsum7 += STEP_CX7;
    if (cntsum7 + STEP_CX7 > PROB_SCALE) {
      cntsum7 = 0;
      int cf = 0;
      for (int j = 0; j < 256; j++) {
        freqs7[j].cumFreq = (u16)cf;
        const int fr = freqs7[j].freq = cnts7[j];
        cf += fr;
        cnts7[j] = (u16)(cnts7[j] - (fr >> 1));
        cntsum7 += cnts7[j];
      }
    }
  }
  void create7_from_6(u8 c) {  // upgrade when an unmet symbol hits d==MaxD6;
    // c itself stays unmet (the reference's Cx7::create(Cx6&) adds no step)
    (void)c;
    freqs7.assign(256, Freq{0, 0});
    cnts7.assign(256, 0);
    cntsum7 = cntsum6;
    for (const auto& s : syms6) { freqs7[s.sym] = s.fr; cnts7[s.sym] = s.cnt; }
    const int funmet = 1 << fshift;
    const u16 cntUnmet = (u16)(funmet - (funmet >> 1));
    int cumFr = 0;
    for (int i = 0; i < 256; i++) {
      if (freqs7[i].freq) {
        cumFr += freqs7[i].freq;
      } else {
        freqs7[i].freq = (u16)funmet;
        freqs7[i].cumFreq = (u16)cumFr;
        cnts7[i] = cntUnmet;
        cumFr += funmet;
      }
    }
    syms6.clear();
  }
  void create7_from_3(u8 c) {  // Cx3 Found -> Cx7 (:919-950)
    freqs7.assign(256, Freq{0, 0});
    cnts7.assign(256, 0);
    for (int i = 0; i < 256; i++) { freqs7[i].freq = 1; cnts7[i] = 1; }
    const int d = (int)list.size();
    const int f0 = (PROB_SCALE - (256 - d)) / (d + 1);
    const u16 c0 = (u16)(f0 - (f0 >> 1));
    for (u8 s : list) { freqs7[s].freq = (u16)f0; cnts7[s] = c0; }
    freqs7[c].freq = (u16)(freqs7[c].freq + f0);
    cnts7[c] = (u16)(cnts7[c] + STEP_CX7);
    cntsum7 = 0;
    int cf = 0;
    for (int i = 0; i < 256; i++) {
      cntsum7 += cnts7[i];
      freqs7[i].cumFreq = (u16)cf;
      cf += freqs7[i].freq;
    }
    list.clear();
  }

  // ---- list update dispatch (ans_contexts.cpp:3-31,54-61) ----
  void update(u8 c, int f0) {
    if (kind == 0) { kind = 1; list.assign(1, c); return; }
    auto it = std::find(list.begin(), list.end(), c);
    if (it != list.end()) {  // Found: upgrade to a counted kind
      if (kind == 1) {
        kind = (list.size() <= 4) ? 4 : 5;
        create45_from_list(c);
      } else if (kind == 2) {
        kind = 6;
        create6_from_list(c, f0);
      } else {  // kind 3
        kind = 7;
        create7_from_3(c);
      }
      return;
    }
    if (kind == 1 && (int)list.size() >= 14) kind = 2;
    else if (kind == 2 && (int)list.size() >= 64) kind = 3;
    else if (kind == 3 && (int)list.size() >= 256)
      throw StreamError("cx3 overflow");
    list.push_back(c);
  }

  // encode: false => bypass (caller writes raw byte); state already updated
  bool encode(u8 c, Freq& interval, int f0) {
    switch (kind) {
      case 0: case 1: case 2: case 3:
        update(c, f0);
        return false;
      case 4: {
        int tot = small_tot();
        if (!small_encode(c, interval, tot, 4)) { kind = 5; create5_from_4(c); }
        return true;
      }
      case 5: {
        int tot = cntsum5;
        const bool ok = small_encode(c, interval, tot, 16);
        cntsum5 = tot;
        if (!ok) { kind = 6; create6_from_small(c); }
        return true;
      }
      case 6: {
        Sym6* s = find6(c);
        if (s) { interval = s->fr; incr6(*s); return true; }
        const Freq fr = unmet_interval6(c);
        interval = fr;
        if (!add6(c, fr)) { kind = 7; create7_from_6(c); }
        return true;
      }
      case 7: interval = freqs7[c]; incr7(c); return true;
    }
    throw StreamError("bad context kind");
  }

  bool can_decode() const { return kind >= 4; }
  void decode(int someFreq, u8& c, Freq& interval) {
    switch (kind) {
      case 4: {
        int tot = small_tot();
        if (!small_decode(someFreq, c, interval, tot, 4)) {
          kind = 5; create5_from_4(c);
        }
        return;
      }
      case 5: {
        int tot = cntsum5;
        const bool ok = small_decode(someFreq, c, interval, tot, 16);
        cntsum5 = tot;
        if (!ok) { kind = 6; create6_from_small(c); }
        return;
      }
      case 6: {
        Freq lfr{0, 0};
        int lowerSym = 0;
        for (auto& s : syms6) {
          const int cf = s.fr.cumFreq;
          if (cf <= someFreq) {
            if (cf + s.fr.freq > someFreq) {
              c = s.sym; interval = s.fr; incr6(s);
              return;
            }
            if (cf >= lfr.cumFreq) { lfr = s.fr; lowerSym = s.sym; }
          }
        }
        Freq fr;
        fr.freq = (u16)(1 << fshift);
        if (lfr.freq) {
          const int cumFr = lfr.cumFreq + lfr.freq;
          const int x = (someFreq - cumFr) >> fshift;
          c = (u8)(x + lowerSym + 1);
          fr.cumFreq = (u16)(lfr.cumFreq + lfr.freq + (x << fshift));
        } else {
          c = (u8)(someFreq >> fshift);
          fr.cumFreq = (u16)(c << fshift);
        }
        interval = fr;
        if (!add6(c, fr)) { kind = 7; create7_from_6(c); }
        return;
      }
      case 7: {
        int lo = 0;
        while (lo < 255 && freqs7[lo + 1].cumFreq <= someFreq) lo++;
        c = (u8)lo;
        interval = freqs7[lo];
        incr7(lo);
        return;
      }
    }
    throw StreamError("bad context kind in decode");
  }
};

// ---- FixedSizeRansCtx<N> (ans_contexts.h:1053-1132) ------------------------
struct FixedCtx {
  int n = 2;
  std::vector<Freq> freqs;
  std::vector<u16> cnts;
  int cntsum = 0;

  void init(int nsym) {
    n = nsym;
    freqs.assign(n, Freq{0, 0});
    cnts.assign(n, 0);
    renew();
  }
  void renew() {
    int cf = 0;
    const int fr = PROB_SCALE / n;
    const u16 c0 = (u16)(fr - (fr >> 1));
    cntsum = c0 * n;
    for (int i = 0; i < n; i++) {
      freqs[i].freq = (u16)fr;
      freqs[i].cumFreq = (u16)cf;
      cnts[i] = c0;
      cf += fr;
    }
  }
  void incr(int c) {
    cnts[c] = (u16)(cnts[c] + STEP_FX);
    cntsum += STEP_FX;
    if (cntsum + STEP_FX > PROB_SCALE) {
      cntsum = 0;
      int cf = 0;
      for (int j = 0; j < n; j++) {
        freqs[j].cumFreq = (u16)cf;
        const int fr = freqs[j].freq = cnts[j];
        cf += fr;
        cnts[j] = (u16)(cnts[j] - (fr >> 1));
        cntsum += cnts[j];
      }
    }
  }
  void encode(int c, Freq& interval) { interval = freqs[c]; incr(c); }
  int decode(int someFreq, Freq& interval) {
    int lo = 0;
    while (lo < n - 1 && freqs[lo + 1].cumFreq <= someFreq) lo++;
    interval = freqs[lo];
    incr(lo);
    return lo;
  }
};

// ---- UseANS strategy + frame walk ------------------------------------------
struct Codec {
  int version;  // 3 or 4
  int f0val;    // Cx6 f0: v3=64, v4=32
  int X, Y, stride;
  int msr_x, msr_y, msrlow_x = 8, msrlow_y = 8;
  std::vector<Context> cn;  // [3 * 4096] color contexts
  FixedCtx nrun[6], ptab[6], xx, btn, bt, sxy[4], mvx, mvy;
  std::vector<u8> prev;
  bool last_flat = false;
  // FFmpeg's scpr decoder does not renew model state on flat frames (the
  // reference does: screencap.cpp:1490-1493,1547-1550 — verified against the
  // compiled reference).  Forcing an I-frame after a new-color flat keeps our
  // streams decodable by BOTH ecosystems at negligible cost.
  bool force_i_next = false;
  u8 flat_clr[3] = {0, 0, 0};
  long fn = 0;
  std::vector<int> mv_xs, mv_ys;  // per-block MVs, persistent across frames
  u32 cx = 0, cx1 = 0;

  // entropy state
  BlockWriter bw;
  RansDec rdec;
  int nDec = 0;

  Codec(int ver, int x, int y, int mx, int my)
      : version(ver), f0val(ver == 3 ? 64 : 32), X(x), Y(y),
        stride((x * 3 + 3) & ~3), msr_x(mx), msr_y(my) {
    cn.resize(3 * 4096);
    for (auto& t : nrun) t.init(256);
    for (auto& t : ptab) t.init(6);
    xx.init(256);
    btn.init(256);
    bt.init(5);
    for (auto& t : sxy) t.init(16);
    mvx.init(msr_x * 2);
    mvy.init(msr_y * 2);
    prev.assign((size_t)stride * Y, 0);
    renew();
  }

  void renew() {  // RenewI (screencap.cpp:178-198)
    for (auto& t : cn) t.renew();
    for (auto& t : nrun) t.renew();
    for (auto& t : ptab) t.renew();
    xx.renew();
    btn.renew();
    bt.renew();
    for (auto& t : sxy) t.renew();
    mvx.renew();
    mvy.renew();
  }

  // ---- symbol kinds ----
  void count_dec() {
    if (++nDec == BLOCK_B) {
      rdec.init();
      nDec = 0;
    }
  }
  void enc_c(Context& ctx, u8 c) {
    Freq fr;
    if (!ctx.encode(c, fr, f0val)) { fr.freq = 0; fr.cumFreq = c; }
    bw.put(fr);
  }
  u8 dec_c(Context& ctx) {
    u8 c;
    Freq fr;
    const int kind_before = ctx.kind;
    if (ctx.can_decode()) {
      ctx.decode((int)rdec.get(), c, fr);
      rdec.advance(fr.cumFreq, fr.freq);
      SCPR_ANS_TRACE("C k=%d c=%d fr=%d cum=%d\n", kind_before, c, fr.freq,
                     fr.cumFreq);
    } else {
      if (rdec.p >= rdec.end) throw StreamError("v3/v4 bypass exhausted");
      c = *rdec.p++;
      ctx.update(c, f0val);
      SCPR_ANS_TRACE("B k=%d c=%d\n", kind_before, c);
    }
    count_dec();
    return c;
  }
  void enc_f(FixedCtx& cx_, int c) {
    Freq fr;
    cx_.encode(c, fr);
    bw.put(fr);
  }
  int dec_f(FixedCtx& cx_) {
    Freq fr;
    const int c = cx_.decode((int)rdec.get(), fr);
    rdec.advance(fr.cumFreq, fr.freq);
    SCPR_ANS_TRACE("F c=%d fr=%d cum=%d\n", c, fr.freq, fr.cumFreq);
    count_dec();
    return c;
  }
  void enc_bool(bool flag) {
    Freq fr{PROB_SCALE / 2, (u16)(flag ? PROB_SCALE / 2 : 0)};
    bw.put(fr);
  }
  bool dec_bool() {
    const bool flag = rdec.get() >= (u32)(PROB_SCALE / 2);
    rdec.advance(flag ? PROB_SCALE / 2 : 0, PROB_SCALE / 2);
    count_dec();
    return flag;
  }

  void make_cx(u32 v) { cx1 = (cx << 6) & 0xFC0; cx = v >> 2; }
  void enc_rgb(const u8* p) {
    enc_c(cn[0 * 4096 + cx + cx1], p[0]); make_cx(p[0]);
    enc_c(cn[1 * 4096 + cx + cx1], p[1]); make_cx(p[1]);
    enc_c(cn[2 * 4096 + cx + cx1], p[2]); make_cx(p[2]);
  }
  void dec_rgb(int& r, int& g, int& b) {
    r = dec_c(cn[0 * 4096 + cx + cx1]); make_cx((u32)r);
    g = dec_c(cn[1 * 4096 + cx + cx1]); make_cx((u32)g);
    b = dec_c(cn[2 * 4096 + cx + cx1]); make_cx((u32)b);
  }
  void resync_cx(const u8* last_pix) {
    cx1 = ((u32)(last_pix[1] >> 2) << 6) & 0xFC0;
    cx = (u32)last_pix[2] >> 2;
  }

  static bool eq3(const u8* a, const u8* b) {
    return a[0] == b[0] && a[1] == b[1] && a[2] == b[2];
  }

  // ---------- I-frame (CompressI/DecompressI, screencap.cpp:319-498) --------
  bool fits_i(int t, const u8* buf, int i, int lasti) const {
    const int off = -stride - 3;
    const u8* c = buf + i;
    switch (t) {
      case 0: case 1: return eq3(c, buf + lasti);
      case 2: return eq3(c, c + off + 3);
      case 5: return eq3(c, c + off);
      case 4:
        // unwrapped int compare (`screencap.cpp:515-518,567-569`): the
        // reference only picks the gradient when left+above-aboveleft is
        // already in 0..255 (its decoder truncates on store, but its
        // encoder-side fit test does int math with no wraparound)
        return (int)c[0] == (int)buf[lasti] + c[off + 3] - c[off] &&
               (int)c[1] == (int)buf[lasti + 1] + c[off + 4] - c[off + 1] &&
               (int)c[2] == (int)buf[lasti + 2] + c[off + 5] - c[off + 2];
    }
    return false;
  }
  int start_i(const u8* buf, int i, int lasti) const {
    if (fits_i(1, buf, i, lasti)) return 1;
    if (fits_i(5, buf, i, lasti)) return 5;
    if (fits_i(2, buf, i, lasti)) return 2;
    if (fits_i(4, buf, i, lasti)) return 4;
    return 0;
  }

  void compress_i(const u8* buf) {
    renew();
    cx = cx1 = 0;
    enc_rgb(buf);
    int n = 1, lasti = 0;
    for (int k = 1; k < X + 1; k++) {
      const int i = (k / X) * stride + (k % X) * 3;
      if (eq3(buf + i, buf + lasti) && n < 255) n++;
      else {
        enc_f(nrun[0], n);
        enc_rgb(buf + i);
        n = 1;
      }
      lasti = i;
    }
    enc_f(nrun[0], n);

    int x = 1, y = 1, lastptype = 0;
    lasti = stride;  // pixel (1, 0)
    while (y < Y) {
      const int i = y * stride + x * 3;
      const int ptype = start_i(buf, i, lasti);
      int run = 1;
      {
        int px = x, py = y, plast = i;
        while (run < 255) {
          px++;
          if (px >= X) { px = 0; py++; }
          if (py >= Y) break;
          const int pi = py * stride + px * 3;
          if (!fits_i(ptype, buf, pi, plast)) break;
          run++;
          plast = pi;
        }
      }
      resync_cx(buf + lasti);
      enc_f(ptab[lastptype], ptype);
      if (ptype == 0) enc_rgb(buf + i);
      lastptype = ptype;
      enc_f(nrun[ptype], run);
      for (int q = 0; q < run; q++) {
        lasti = y * stride + x * 3;
        x++;
        if (x >= X) { x = 0; y++; }
      }
    }
  }

  void decompress_i(u8* buf) {
    renew();
    cx = cx1 = 0;
    int r, g = 0, b = 0;
    int i = 0, k = 0, lasti = 0;
    while (k < X + 1) {
      dec_rgb(r, g, b);
      const int n = dec_f(nrun[0]);
      for (int q = 0; q < n; q++) {
        buf[i] = (u8)r; buf[i + 1] = (u8)g; buf[i + 2] = (u8)b;
        k++;
        lasti = i;
        i += 3;
        if ((i % stride) >= X * 3) i = (i / stride + 1) * stride;
      }
    }
    const int off = -stride - 3;
    int x = (i % stride) / 3, y = i / stride, ptype = 0;
    while (y < Y) {
      const int lastptype = ptype;
      ptype = dec_f(ptab[lastptype]);
      if (!ptype) dec_rgb(r, g, b);
      int n = dec_f(nrun[ptype]);
      i = y * stride + x * 3;
      while (n-- > 0) {
        switch (ptype) {
          case 0: buf[i] = (u8)r; buf[i + 1] = (u8)g; buf[i + 2] = (u8)b; break;
          case 1: memcpy(buf + i, buf + lasti, 3); break;
          case 2: memcpy(buf + i, buf + i + off + 3, 3); break;
          case 5: memcpy(buf + i, buf + i + off, 3); break;
          case 4:
            buf[i] = (u8)(buf[lasti] + buf[i + off + 3] - buf[i + off]);
            buf[i + 1] = (u8)(buf[lasti + 1] + buf[i + off + 4] - buf[i + off + 1]);
            buf[i + 2] = (u8)(buf[lasti + 2] + buf[i + off + 5] - buf[i + off + 2]);
            break;
        }
        lasti = i;
        x++;
        i += 3;
        if (x >= X) { x = 0; y++; i = y * stride + x * 3; }
      }
      resync_cx(buf + lasti);
    }
  }

  // ---------- P-frame (CompressP/DecompressP, screencap.cpp:1091-1432) ------
  bool same_blocks(const u8* buf, int is, int ip, int wb, int hg) const {
    for (int y = 0; y < hg; y++) {
      if (memcmp(buf + is, prev.data() + ip, wb)) return false;
      is += stride; ip += stride;
    }
    return true;
  }
  bool find_mv(const u8* buf, int x1, int y1, int x2, int y2, int& lmx, int& lmy,
               bool can_up, int umx, int umy, int& omx, int& omy) const {
    int fx1 = std::max(x1 - msr_x, 0), fy1 = std::max(y1 - msr_y, 0);
    int fx2 = x1 + msr_x, fy2 = y1 + msr_y;
    if (fx2 + x2 - x1 > X) fx2 = X - x2 + x1 + 1;
    if (fy2 + y2 - y1 > Y) fy2 = Y - y2 + y1 + 1;
    int rx1 = std::max(x1 - msrlow_x, 0), ry1 = std::max(y1 - msrlow_y, 0);
    int rx2 = x1 + msrlow_x, ry2 = y1 + msrlow_y;
    if (rx2 + x2 - x1 > X) rx2 = X - x2 + x1 + 1;
    if (ry2 + y2 - y1 > Y) ry2 = Y - y2 + y1 + 1;
    const int is = y1 * stride + x1 * 3, wb = (x2 - x1) * 3, hg = y2 - y1;
    auto ok = [&](int sx, int sy) {
      return same_blocks(buf, is, sy * stride + sx * 3, wb, hg);
    };
    {
      const int sx = x1 + lmx, sy = y1 + lmy;
      if (sx >= fx1 && sx < fx2 && sy >= fy1 && sy < fy2 && ok(sx, sy)) {
        omx = lmx; omy = lmy;
        return true;
      }
    }
    if (can_up && (umx != lmx || umy != lmy)) {
      const int sx = x1 + umx, sy = y1 + umy;
      if (sx >= fx1 && sx < fx2 && sy >= fy1 && sy < fy2 && ok(sx, sy)) {
        omx = umx; omy = umy;
        return true;
      }
    }
    const int common = std::min(y1 - fy1, fy2 - y1 - 1);
    int yup = y1 - 1, ydn = y1 + 1;
    auto hit = [&](int mx, int my) { lmx = omx = mx; lmy = omy = my; return true; };
    for (int k = 0; k < common; k++, yup--, ydn++) {
      if (ok(x1, yup)) return hit(0, yup - y1);
      if (ok(x1, ydn)) return hit(0, ydn - y1);
    }
    for (; yup >= fy1; yup--) if (ok(x1, yup)) return hit(0, yup - y1);
    for (; ydn < fy2; ydn++) if (ok(x1, ydn)) return hit(0, ydn - y1);
    for (int x = x1; x >= fx1; x--) if (ok(x, y1)) return hit(x - x1, 0);
    for (int x = x1; x < fx2; x++) if (ok(x, y1)) return hit(x - x1, 0);
    for (int x = x1; x >= rx1; x--) {
      for (int y = y1; y >= ry1; y--) if (ok(x, y)) return hit(x - x1, y - y1);
      for (int y = y1 + 1; y < ry2; y++) if (ok(x, y)) return hit(x - x1, y - y1);
    }
    for (int x = x1 + 1; x < rx2; x++) {
      for (int y = y1; y >= ry1; y--) if (ok(x, y)) return hit(x - x1, y - y1);
      for (int y = y1 + 1; y < ry2; y++) if (ok(x, y)) return hit(x - x1, y - y1);
    }
    return false;
  }

  bool fits_p(int t, const u8* buf, int i, int lasti) const {
    const int off = -stride - 3;
    const u8* c = buf + i;
    switch (t) {
      case 0: return eq3(c, buf + lasti);
      case 1: return eq3(c, c - 3);
      case 2: return eq3(c, c + off + 3);
      case 3: return eq3(c, prev.data() + i);
      case 5: return eq3(c, c + off);
      case 4:
        // unwrapped int compare (`screencap.cpp:586-588`)
        return (int)c[0] == (int)c[-3] + c[off + 3] - c[off] &&
               (int)c[1] == (int)c[-2] + c[off + 4] - c[off + 1] &&
               (int)c[2] == (int)c[-1] + c[off + 5] - c[off + 2];
    }
    return false;
  }
  bool fits_p0(int t, const u8* buf, int i, int lasti) const {
    if (t == 0) return eq3(buf + i, buf + lasti);
    if (t == 3) return eq3(buf + i, prev.data() + i);
    return false;
  }
  int start_p(const u8* buf, int i, int x, int y) const {
    if (x > 0 && y > 0) {
      if (fits_p(1, buf, i, 0)) return 1;
      if (fits_p(3, buf, i, 0)) return 3;
      if (fits_p(5, buf, i, 0)) return 5;
      if (fits_p(2, buf, i, 0)) return 2;
      if (fits_p(4, buf, i, 0)) return 4;
      return 0;
    }
    return fits_p(3, buf, i, 0) ? 3 : 0;
  }

  struct PRec { int ptype, n, i_start; };
  void classify_block(const u8* buf, int sx1, int sy1, int sx2, int sy2,
                      std::vector<PRec>& out) const {
    int ptype = -1, n = 0, lasti = 0, i_start = 0;
    for (int y = sy1; y < sy2; y++) {
      int i = y * stride + sx1 * 3;
      for (int x = sx1; x < sx2; x++, i += 3) {
        const bool notedge = x > 0 && y > 0;
        const bool ext =
            ptype >= 0 && n < 255 &&
            (notedge ? fits_p(ptype, buf, i, lasti) : fits_p0(ptype, buf, i, lasti));
        if (ext) n++;
        else {
          if (ptype >= 0) out.push_back({ptype, n, i_start});
          ptype = start_p(buf, i, x, y);
          i_start = i;
          n = 1;
        }
        lasti = i;
      }
    }
    out.push_back({ptype, n, i_start});
  }

  int compress_p(const u8* buf, std::vector<u8>& hdr) {
    const int nbx = (X + 15) / 16, nby = (Y + 15) / 16;
    std::vector<int> bts(nbx * nby, 0);
    std::vector<int> sx1v(nbx * nby), sy1v(nbx * nby), sx2v(nbx * nby), sy2v(nbx * nby);
    // persistent across frames: the reference's mvs[] arrays are allocated
    // once at Init and never cleared (screencap.cpp:95-97), so stale MVs
    // from earlier frames serve as upper-block candidates (:726-735).
    if ((int)mv_xs.size() != nbx * nby) {
      mv_xs.assign(nbx * nby, 0);
      mv_ys.assign(nbx * nby, 0);
    }
    std::vector<int>& mxs = mv_xs;
    std::vector<int>& mys = mv_ys;
    std::vector<std::vector<PRec>> brecs(nbx * nby);
    bool any = false;
    int lmx = 0, lmy = 0;
    for (int by = 0; by < nby; by++) {
      for (int bx = 0; bx < nbx; bx++) {
        const int x_lo = bx * 16, y_lo = by * 16;
        const int x_hi = std::min(x_lo + 16, X), y_hi = std::min(y_lo + 16, Y);
        int sx1 = x_hi, sy1 = y_hi, sx2 = x_lo, sy2 = y_lo;
        for (int y = y_lo; y < y_hi; y++) {
          const int i = y * stride + x_lo * 3;
          if (memcmp(buf + i, prev.data() + i, (x_hi - x_lo) * 3)) {
            for (int x = x_lo; x < x_hi; x++) {
              const int si = y * stride + x * 3;
              if (!eq3(buf + si, prev.data() + si)) {
                sx1 = std::min(sx1, x); sx2 = std::max(sx2, x + 1);
                sy1 = std::min(sy1, y); sy2 = std::max(sy2, y + 1);
              }
            }
          }
        }
        if (sx2 <= sx1) continue;
        any = true;
        const int bi = by * nbx + bx;
        const bool partial = !(sx1 == x_lo && sy1 == y_lo && sx2 == x_hi && sy2 == y_hi);
        int t = partial ? 2 : 1;
        sx1v[bi] = sx1; sy1v[bi] = sy1; sx2v[bi] = sx2; sy2v[bi] = sy2;
        const bool can_up = by > 0;
        const int ubi = bi - nbx;
        int omx, omy;
        // upper candidate: any block above, with whatever (possibly stale)
        // MV its array slot holds; scans update last_mv inside find_mv, but
        // last-MV / upper-MV hits leave it untouched (:718-735).
        if (find_mv(buf, sx1, sy1, sx2, sy2, lmx, lmy, can_up,
                    can_up ? mxs[ubi] : 0, can_up ? mys[ubi] : 0, omx, omy)) {
          t += 2;
          mxs[bi] = omx; mys[bi] = omy;
        } else {
          classify_block(buf, sx1, sy1, sx2, sy2, brecs[bi]);
        }
        bts[bi] = t;
      }
    }
    if (!any) {
      hdr.push_back(0);
      return 0;
    }
    hdr.push_back(1);
    // xx1/xx2 are corner indices of the block-space bounding RECTANGLE of
    // changed blocks (min/max column x min/max row, screencap.cpp:1132-1150),
    // not the min/max linear indices.
    int bcx1 = nbx, bcx2 = -1, bcy1 = nby, bcy2 = -1;
    for (int by = 0; by < nby; by++)
      for (int bx = 0; bx < nbx; bx++)
        if (bts[by * nbx + bx]) {
          bcx1 = std::min(bcx1, bx); bcx2 = std::max(bcx2, bx);
          bcy1 = std::min(bcy1, by); bcy2 = std::max(bcy2, by);
        }
    const int xx1 = bcy1 * nbx + bcx1, xx2 = bcy2 * nbx + bcx2;
    enc_f(xx, xx1 & 255);
    enc_f(xx, (xx1 >> 8) & 255);
    enc_f(xx, xx2 & 255);
    enc_f(xx, (xx2 >> 8) & 255);
    {
      int oldt = -1, n = -1;
      for (int x = xx1; x <= xx2; x++) {
        if (bts[x] == oldt && n < 255) n++;
        else {
          if (n > 0) enc_f(btn, n);
          enc_f(bt, bts[x]);
          oldt = bts[x];
          n = 1;
        }
      }
      enc_f(btn, n);
    }
    cx = cx1 = 0;
    int lastmx = 0, lastmy = 0;
    bool first_block = true;
    for (int by = 0; by < nby; by++)
      for (int bx = 0; bx < nbx; bx++) {
        const int bi = by * nbx + bx;
        if (!bts[bi]) continue;
        const int t = bts[bi];
        if ((t - 1) & 1) {
          enc_f(sxy[0], sx1v[bi] - bx * 16);
          enc_f(sxy[1], sy1v[bi] - by * 16);
          enc_f(sxy[2], sx2v[bi] - 1 - bx * 16);
          enc_f(sxy[3], sy2v[bi] - 1 - by * 16);
        }
        if ((t - 1) & 2) {
          // v3/v4 same-MV flag (screencap.cpp:1199-1213; the reference's
          // `bi > 0` guard makes the very first coded motion block always
          // emit an explicit MV)
          if (!first_block && mxs[bi] == lastmx && mys[bi] == lastmy) {
            enc_bool(true);
          } else {
            enc_bool(false);
            enc_f(mvx, mxs[bi] + msr_x);
            enc_f(mvy, mys[bi] + msr_y);
            lastmx = mxs[bi]; lastmy = mys[bi];
          }
        } else {
          const int bx1 = sx1v[bi], bx2 = sx2v[bi];
          int lastptype = 0;
          for (const PRec& r : brecs[bi]) {
            enc_f(ptab[lastptype], r.ptype);
            if (r.ptype == 0) enc_rgb(buf + r.i_start);
            lastptype = r.ptype;
            enc_f(nrun[r.ptype], r.n);
            int sx = (r.i_start % stride) / 3, sy = r.i_start / stride;
            int tpos = sx - bx1 + r.n - 1;
            sx = tpos % (bx2 - bx1) + bx1;
            sy += tpos / (bx2 - bx1);
            resync_cx(buf + sy * stride + sx * 3);
          }
        }
        first_block = false;
      }
    return 1;
  }

  void decompress_p(u8* buf) {
    const int nbx = (X + 15) / 16, nby = (Y + 15) / 16;
    int t0 = dec_f(xx), t1 = dec_f(xx);
    const int xx1 = (t1 << 8) + t0;
    t0 = dec_f(xx); t1 = dec_f(xx);
    const int xx2 = (t1 << 8) + t0;
    if (xx2 >= nbx * nby || xx1 > xx2) throw StreamError("v3/v4 xx range");
    std::vector<int> bts(nbx * nby, 0);
    {
      int x = xx1;
      while (x <= xx2) {
        const int c = dec_f(bt);
        const int n = dec_f(btn);
        for (int i = 0; i < n && x <= xx2; i++) bts[x++] = c;
      }
    }
    const int off = -stride - 3;
    cx = cx1 = 0;
    int lastmx = 0, lastmy = 0;
    for (int by = 0; by < nby; by++)
      for (int bx = 0; bx < nbx; bx++) {
        const int x_lo = bx * 16, y_lo = by * 16;
        const int x_hi = std::min(x_lo + 16, X), y_hi = std::min(y_lo + 16, Y);
        int x1 = x_lo, y1 = y_lo, x2 = x_hi, y2 = y_hi;
        const int bi = by * nbx + bx;
        if (!bts[bi]) {
          for (int y = y1; y < y2; y++) {
            const int i = y * stride + x1 * 3;
            memcpy(buf + i, prev.data() + i, (x2 - x1) * 3);
          }
          continue;
        }
        const int t = bts[bi];
        if ((t - 1) & 1) {
          for (int y = y1; y < y2; y++) {
            const int i = y * stride + x1 * 3;
            memcpy(buf + i, prev.data() + i, (x2 - x1) * 3);
          }
          x1 = dec_f(sxy[0]) + x_lo;
          y1 = dec_f(sxy[1]) + y_lo;
          x2 = dec_f(sxy[2]) + x_lo + 1;
          y2 = dec_f(sxy[3]) + y_lo + 1;
          if (!(x1 < x2 && y1 < y2 && x2 <= X && y2 <= Y))
            throw StreamError("v3/v4 sub-rect out of range");
        }
        if ((t - 1) & 2) {
          int mx, my;
          if (dec_bool()) {
            mx = lastmx; my = lastmy;
          } else {
            mx = dec_f(mvx) - msr_x;
            my = dec_f(mvy) - msr_y;
          }
          lastmx = mx; lastmy = my;
          if (x1 + mx < 0 || y1 + my < 0 || x2 + mx > X || y2 + my > Y)
            throw StreamError("v3/v4 motion vector out of range");
          for (int y = y1; y < y2; y++)
            memcpy(buf + y * stride + x1 * 3,
                   prev.data() + (y + my) * stride + (x1 + mx) * 3, (x2 - x1) * 3);
        } else {
          int x = x1, y = y1, ptype = 0;
          int r = 0, g = 0, b = 0;
          while (y < y2) {
            const int lastptype = ptype;
            ptype = dec_f(ptab[lastptype]);
            if (!ptype) dec_rgb(r, g, b);
            int n = dec_f(nrun[ptype]);
            int i = y * stride + x * 3;
            while (n-- > 0) {
              switch (ptype) {
                case 1: r = buf[i - 3]; g = buf[i - 2]; b = buf[i - 1]; break;
                case 2: r = buf[i + off + 3]; g = buf[i + off + 4]; b = buf[i + off + 5]; break;
                case 3: {
                  const u8* p = prev.data() + i;
                  r = p[0]; g = p[1]; b = p[2];
                  break;
                }
                case 4:
                  r = (u8)(buf[i - 3] + buf[i + off + 3] - buf[i + off]);
                  g = (u8)(buf[i - 2] + buf[i + off + 4] - buf[i + off + 1]);
                  b = (u8)(buf[i - 1] + buf[i + off + 5] - buf[i + off + 2]);
                  break;
                case 5: r = buf[i + off]; g = buf[i + off + 1]; b = buf[i + off + 2]; break;
              }
              buf[i] = (u8)r; buf[i + 1] = (u8)g; buf[i + 2] = (u8)b;
              i += 3;
              x++;
              if (x >= x2) { x = x1; y++; i = y * stride + x * 3; }
            }
            cx = (u32)g >> 2;
            cx1 = (cx << 6) & 0xFC0;
            cx = (u32)b >> 2;
          }
        }
      }
  }

  // ---------- framing (version nibble (ver-1)<<4; screencap.cpp:1477-1536) --
  int encode(const u8* frame, int force_key, long kf_interval, std::vector<u8>& out) {
    std::vector<u8> buf((size_t)stride * Y, 0);
    for (int y = 0; y < Y; y++)
      memcpy(buf.data() + (size_t)y * stride, frame + (size_t)y * X * 3, (size_t)X * 3);

    bool flat = true;
    for (int i = 1; i < X * Y && flat; i++)
      flat = eq3(buf.data(), buf.data() + (i % X) * 3 + (i / X) * stride);
    const u8 vernib = (u8)((version - 1) << 4);
    if (flat) {
      if (!(last_flat && eq3(flat_clr, buf.data()))) {
        prev = buf;
        renew();
        memcpy(flat_clr, buf.data(), 3);
        force_i_next = true;
      }
      last_flat = true;
      fn++;
      out = {(u8)(vernib | 1), buf[0], buf[1], buf[2]};
      return 0;
    }
    last_flat = false;
    const bool key = force_key || fn == 0 || force_i_next ||
                     (kf_interval > 0 && fn % kf_interval == 0);
    force_i_next = false;
    fn++;
    out.clear();
    if (key) {
      out.push_back((u8)(vernib | 2));
      bw.start(&out);
      compress_i(buf.data());
      bw.finish();
      prev = buf;
      return 0;
    }
    std::vector<u8> payload;
    std::vector<u8> hdr;
    bw.start(&payload);
    const int changes = compress_p(buf.data(), hdr);
    if (changes) bw.finish();
    out = hdr;
    out.insert(out.end(), payload.begin(), payload.end());
    prev = buf;
    return 1;
  }

  void decode(const u8* d, size_t len, int ftype, u8* out_frame) {
    std::vector<u8> buf((size_t)stride * Y, 0);
    if (ftype == 1) {
      if (!len) throw StreamError("empty v3/v4 P-frame");
      if (!(d[0] & 1)) {
        buf = prev;
      } else {
        rdec.p = d + 1;
        rdec.end = d + len;
        rdec.init();
        nDec = 0;
        decompress_p(buf.data());
        prev = buf;
      }
      last_flat = false;
    } else {
      if (!len) throw StreamError("empty v3/v4 frame");
      const int ver = (d[0] >> 4) + 1;
      if (ver != version) throw StreamError("stream/codec version mismatch");
      const int alg = d[0] & 0x0F;
      if (alg == 1) {
        if (len < 4) throw StreamError("truncated v3/v4 flat frame");
        for (int y = 0; y < Y; y++)
          for (int x = 0; x < X; x++)
            memcpy(buf.data() + y * stride + x * 3, d + 1, 3);
        if (!(last_flat && eq3(flat_clr, d + 1))) {
          prev = buf;
          renew();
          memcpy(flat_clr, d + 1, 3);
        }
        last_flat = true;
      } else if (alg == 2) {
        rdec.p = d + 1;
        rdec.end = d + len;
        rdec.init();
        nDec = 0;
        decompress_i(buf.data());
        prev = buf;
        last_flat = false;
      } else {
        throw StreamError("unknown v3/v4 algorithm");
      }
    }
    for (int y = 0; y < Y; y++)
      memcpy(out_frame + (size_t)y * X * 3, buf.data() + (size_t)y * stride,
             (size_t)X * 3);
  }
};

}  // namespace scpr34

extern "C" {

void* scpr34_new(int version, int w, int h, int msr_x, int msr_y) {
  try {
    return new scpr34::Codec(version, w, h, msr_x, msr_y);
  } catch (...) {
    return nullptr;
  }
}
void scpr34_free(void* c) { delete (scpr34::Codec*)c; }

long scpr34_encode(void* c, const uint8_t* frame, int force_key, long kf_interval,
                   uint8_t* out, long cap, int* ftype) {
  try {
    std::vector<uint8_t> buf;
    *ftype = ((scpr34::Codec*)c)->encode(frame, force_key, kf_interval, buf);
    if ((long)buf.size() > cap) return -2;
    memcpy(out, buf.data(), buf.size());
    return (long)buf.size();
  } catch (...) {
    return -1;
  }
}

int scpr34_decode(void* c, const uint8_t* data, long len, int ftype, uint8_t* out) {
  try {
    ((scpr34::Codec*)c)->decode(data, (size_t)len, ftype, out);
    return 0;
  } catch (...) {
    return -1;
  }
}

}  // extern "C"
