// SCPR version-2 legacy interop codec (backward compatibility with the
// reference ScreenPressor 2.x bitstream format).
//
// Written from a behavioral study of the reference (not ported): range coder
// semantics `sub.cpp:13-58`, count-table models `sub.cpp:61-178`, v2 frame
// walks `screencap.cpp:319-498 (I)`, `:1091-1432 (P)`, framing
// `screencap.cpp:1436-1557`, table kinds/steps `screencap.h:33-45,105-265`.
//
// The encoder emulates a deterministic single-worker reference encoder (the
// reference's thread-count-dependent band splits / MV chains all produce
// valid streams; we emit the 1-band raster variant).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 scpr_legacy.cpp -o libscpr2.so

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <stdexcept>
#include <vector>

// Debug record tracing (SCPR_TRACE=/path/file): dumps the decoded record
// stream for oracle-divergence debugging; no effect when unset.
static FILE* scpr_trace_file() {
  static FILE* f = [] {
    const char* p = getenv("SCPR_TRACE");
    return p ? fopen(p, "w") : (FILE*)nullptr;
  }();
  return f;
}
#define SCPR_TRACE_REC(...)                       \
  do {                                            \
    if (FILE* tf_ = scpr_trace_file()) {          \
      fprintf(tf_, __VA_ARGS__);                  \
      fflush(tf_);                                \
    }                                             \
  } while (0)

namespace scpr2 {

using u8 = uint8_t;
using u32 = uint32_t;
using i64 = int64_t;

constexpr u32 TOP = 1u << 24;
constexpr u32 BOT = 1u << 16;

struct StreamError : std::runtime_error {
  using std::runtime_error::runtime_error;
};

// ---- carry-counting range coder ------------------------------------------------
struct RC {
  i64 low = 0;
  u32 range = 0xFFFFFFFFu, cache = 0, ffnum = 0;
  std::vector<u8>* out = nullptr;
  u32 code = 0;
  const u8* in = nullptr;
  const u8* in_end = nullptr;

  void enc_begin(std::vector<u8>* o) {
    out = o;
    low = 0; range = 0xFFFFFFFFu; cache = 0; ffnum = 0;
  }
  void shift_low() {
    if ((low >> 24) != 0xFF) {
      out->push_back((u8)(cache + (u32)(low >> 32)));
      u8 c = (u8)(0xFFu + (u32)(low >> 32));
      while (ffnum) { out->push_back(c); ffnum--; }
      cache = ((u32)low) >> 24;
    } else {
      ffnum++;
    }
    low = (i64)(((u32)low) << 8);
  }
  void encode(u32 cum, u32 fr, u32 tot) {
    low += (i64)cum * (range /= tot);
    range *= fr;
    while (range < TOP) { shift_low(); range <<= 8; }
  }
  void enc_end() {
    low += 1;
    for (int i = 0; i < 5; i++) shift_low();
  }
  void dec_begin(const u8* d, size_t n) {
    if (n < 5) throw StreamError("v2 stream too short");
    code = 0; range = 0xFFFFFFFFu;
    in = d; in_end = d + n;
    for (int i = 0; i < 5; i++) code = (code << 8) | *in++;
  }
  u32 get_freq(u32 tot) { return code / (range /= tot); }
  void decode(u32 cum, u32 fr) {
    code -= cum * range;
    range *= fr;
    while (range < TOP) {
      if (in >= in_end) throw StreamError("v2 input exhausted");
      code = (code << 8) | *in++;
      range <<= 8;
    }
  }
};

// ---- adaptive count tables -------------------------------------------------------
struct Counts {
  std::vector<u32> c;
  u32 tot = 0;
  int maxc = 0;
  void init(int m) {
    maxc = m;
    c.assign(m, 1);
    tot = m;
  }
  void bump(int s, u32 step) {
    c[s] += step;
    tot += step;
    if (tot > BOT) {
      tot = 0;
      for (int i = 0; i < maxc; i++) { c[i] = (c[i] >> 1) + 1; tot += c[i]; }
    }
  }
  void enc(RC& rc, int s, u32 step) {
    u32 cum = 0;
    for (int i = 0; i < s; i++) cum += c[i];
    rc.encode(cum, c[s], tot);
    bump(s, step);
  }
  int dec(RC& rc, u32 step) {
    u32 v = rc.get_freq(tot), cum = 0;
    int s = 0;
    while (s < maxc - 1 && v >= cum + c[s]) cum += c[s++];
    rc.decode(cum, c[s]);
    bump(s, step);
    return s;
  }
};

// 256-ary with 16-bucket acceleration (color tables, `sub.cpp:109-178`)
struct CountsUni {
  std::vector<u32> c;
  u32 tot = 0;
  void init() {
    c.assign(256 + 16, 0);
    for (int i = 0; i < 256; i++) c[i] = 1;
    for (int i = 0; i < 16; i++) c[256 + i] = 16;
    tot = 256;
  }
  void rescale() {
    tot = 0;
    for (int i = 0; i < 256; i++) { c[i] = (c[i] >> 1) + 1; tot += c[i]; }
    for (int i = 0; i < 16; i++) {
      c[256 + i] = 0;
      for (int j = 0; j < 16; j++) c[256 + i] += c[i * 16 + j];
    }
  }
  void enc(RC& rc, int s, u32 step) {
    u32 cum = 0;
    int x = s / 16;
    for (int b = 0; b < x; b++) cum += c[256 + b];
    for (int i = x * 16; i < s; i++) cum += c[i];
    rc.encode(cum, c[s], tot);
    c[s] += step; c[256 + x] += step; tot += step;
    if (tot > BOT) rescale();
  }
  int dec(RC& rc, u32 step) {
    u32 v = rc.get_freq(tot), cum = 0;
    int x = 0;
    while (x < 15 && v >= cum + c[256 + x]) cum += c[256 + x++];
    int s = x * 16;
    while (s < 255 && v >= cum + c[s]) cum += c[s++];
    rc.decode(cum, c[s]);
    c[s] += step; c[256 + x] += step; tot += step;
    if (tot > BOT) rescale();
    return s;
  }
};

// adaptation steps (`screencap.h:33-45`)
constexpr u32 STEP_C = 400, STEP_N = 400, STEP_BT = 10, STEP_BTN = 20,
              STEP_SXY = 100, STEP_MV = 100, STEP_P = 1000, STEP_XX = 1;

struct Codec {
  int X, Y, stride;
  int msr_x, msr_y, msrlow_x = 8, msrlow_y = 8;
  std::vector<CountsUni> cn;  // [3 * 4096]
  Counts nrun[6], ptab[6], xx, btn, bt, sxy[4], mvx, mvy;
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

  Codec(int x, int y, int mx, int my)
      : X(x), Y(y), stride((x * 3 + 3) & ~3), msr_x(mx), msr_y(my) {
    cn.resize(3 * 4096);
    prev.assign((size_t)stride * Y, 0);
    renew();
  }

  void renew() {
    for (auto& t : cn) t.init();
    for (auto& t : nrun) t.init(256);
    for (auto& t : ptab) t.init(6);
    xx.init(256);
    btn.init(256);
    bt.init(5);
    for (auto& t : sxy) t.init(16);
    mvx.init(msr_x * 2);
    mvy.init(msr_y * 2);
  }

  void make_cx(u32 v) { cx1 = (cx << 6) & 0xFC0; cx = v >> 2; }
  void enc_rgb(RC& rc, const u8* p) {
    cn[0 * 4096 + cx + cx1].enc(rc, p[0], STEP_C); make_cx(p[0]);
    cn[1 * 4096 + cx + cx1].enc(rc, p[1], STEP_C); make_cx(p[1]);
    cn[2 * 4096 + cx + cx1].enc(rc, p[2], STEP_C); make_cx(p[2]);
  }
  void dec_rgb(RC& rc, int& r, int& g, int& b) {
    r = cn[0 * 4096 + cx + cx1].dec(rc, STEP_C); make_cx(r);
    g = cn[1 * 4096 + cx + cx1].dec(rc, STEP_C); make_cx(g);
    b = cn[2 * 4096 + cx + cx1].dec(rc, STEP_C); make_cx(b);
  }
  void resync_cx(const u8* last_pix) {
    cx1 = ((u32)(last_pix[1] >> 2) << 6) & 0xFC0;
    cx = (u32)last_pix[2] >> 2;
  }

  static bool eq3(const u8* a, const u8* b) {
    return a[0] == b[0] && a[1] == b[1] && a[2] == b[2];
  }

  // ---------- I-frame ----------
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

  void compress_i(RC& rc, const u8* buf) {
    renew();
    cx = cx1 = 0;
    enc_rgb(rc, buf);
    int n = 1, lasti = 0;
    for (int k = 1; k < X + 1; k++) {
      const int i = (k / X) * stride + (k % X) * 3;
      if (eq3(buf + i, buf + lasti) && n < 255) n++;
      else {
        nrun[0].enc(rc, n, STEP_N);
        enc_rgb(rc, buf + i);
        n = 1;
      }
      lasti = i;
    }
    nrun[0].enc(rc, n, STEP_N);

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
      ptab[lastptype].enc(rc, ptype, STEP_P);
      if (ptype == 0) enc_rgb(rc, buf + i);
      lastptype = ptype;
      nrun[ptype].enc(rc, run, STEP_N);
      for (int q = 0; q < run; q++) {
        lasti = y * stride + x * 3;
        x++;
        if (x >= X) { x = 0; y++; }
      }
    }
  }

  void decompress_i(RC& rc, u8* buf) {
    renew();
    cx = cx1 = 0;
    int r, g = 0, b = 0;
    int i = 0, k = 0, lasti = 0;
    while (k < X + 1) {
      dec_rgb(rc, r, g, b);
      const int n = nrun[0].dec(rc, STEP_N);
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
      ptype = ptab[lastptype].dec(rc, STEP_P);
      if (!ptype) dec_rgb(rc, r, g, b);
      int n = nrun[ptype].dec(rc, STEP_N);
      SCPR_TRACE_REC("I y=%d x=%d ptype=%d n=%d rgb=%d,%d,%d\n", y, x, ptype,
                     n, ptype ? -1 : r, ptype ? -1 : g, ptype ? -1 : b);
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

  // ---------- P-frame ----------
  bool same_blocks(const u8* buf, int is, int ip, int wb, int hg) const {
    for (int y = 0; y < hg; y++) {
      if (memcmp(buf + is, prev.data() + ip, wb)) return false;
      is += stride; ip += stride;
    }
    return true;
  }

  // prioritized exact-match search (`FindMV`, screencap.cpp:684-814)
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

  // classify one data block into records (`DecideBlockTypes` inner walk)
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

  int compress_p(RC& rc, const u8* buf, std::vector<u8>& hdr) {
    const int nbx = (X + 15) / 16, nby = (Y + 15) / 16;
    // block analysis (single-worker deterministic order)
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
    std::vector<char> row_done(nby, 0);
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
      row_done[by] = 1;
    }
    if (!any) {
      hdr.push_back(0);
      return 0;  // no RC payload
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
    xx.enc(rc, xx1 & 255, STEP_XX);
    xx.enc(rc, (xx1 >> 8) & 255, STEP_XX);
    xx.enc(rc, xx2 & 255, STEP_XX);
    xx.enc(rc, (xx2 >> 8) & 255, STEP_XX);
    // RLE'd block types
    {
      int oldt = -1, n = -1;
      for (int x = xx1; x <= xx2; x++) {
        if (bts[x] == oldt && n < 255) n++;
        else {
          if (n > 0) btn.enc(rc, n, STEP_BTN);
          bt.enc(rc, bts[x], STEP_BT);
          oldt = bts[x];
          n = 1;
        }
      }
      btn.enc(rc, n, STEP_BTN);
    }
    // per-block payloads
    cx = cx1 = 0;
    int lastmx = 0, lastmy = 0;
    (void)lastmx; (void)lastmy;  // v2 has no same-MV flag
    for (int by = 0; by < nby; by++)
      for (int bx = 0; bx < nbx; bx++) {
        const int bi = by * nbx + bx;
        if (!bts[bi]) continue;
        const int t = bts[bi];
        if ((t - 1) & 1) {
          sxy[0].enc(rc, sx1v[bi] - bx * 16, STEP_SXY);
          sxy[1].enc(rc, sy1v[bi] - by * 16, STEP_SXY);
          sxy[2].enc(rc, sx2v[bi] - 1 - bx * 16, STEP_SXY);
          sxy[3].enc(rc, sy2v[bi] - 1 - by * 16, STEP_SXY);
        }
        if ((t - 1) & 2) {
          mvx.enc(rc, mxs[bi] + msr_x, STEP_MV);
          mvy.enc(rc, mys[bi] + msr_y, STEP_MV);
        } else {
          const int bx1 = sx1v[bi], bx2 = sx2v[bi];
          int lastptype = 0;
          for (const PRec& r : brecs[bi]) {
            ptab[lastptype].enc(rc, r.ptype, STEP_P);
            if (r.ptype == 0) enc_rgb(rc, buf + r.i_start);
            lastptype = r.ptype;
            nrun[r.ptype].enc(rc, r.n, STEP_N);
            // context resync from the record's last pixel
            int sx = (r.i_start % stride) / 3, sy = r.i_start / stride;
            int tpos = sx - bx1 + r.n - 1;
            sx = tpos % (bx2 - bx1) + bx1;
            sy += tpos / (bx2 - bx1);
            resync_cx(buf + sy * stride + sx * 3);
          }
        }
      }
    return 1;
  }

  void decompress_p(RC& rc, u8* buf) {
    const int nbx = (X + 15) / 16, nby = (Y + 15) / 16;
    int t0 = xx.dec(rc, STEP_XX), t1 = xx.dec(rc, STEP_XX);
    const int xx1 = (t1 << 8) + t0;
    t0 = xx.dec(rc, STEP_XX); t1 = xx.dec(rc, STEP_XX);
    const int xx2 = (t1 << 8) + t0;
    SCPR_TRACE_REC("P xx1=%d xx2=%d\n", xx1, xx2);
    std::vector<int> bts(nbx * nby, 0);
    {
      int x = xx1;
      while (x <= xx2) {
        const int c = bt.dec(rc, STEP_BT);
        const int n = btn.dec(rc, STEP_BTN);
        SCPR_TRACE_REC("P bt=%d n=%d\n", c, n);
        for (int i = 0; i < n && x <= xx2; i++) bts[x++] = c;
      }
    }
    const int off = -stride - 3;
    cx = cx1 = 0;
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
          SCPR_TRACE_REC("P sxy bi=%d\n", bi);
          x1 = sxy[0].dec(rc, STEP_SXY) + x_lo;
          y1 = sxy[1].dec(rc, STEP_SXY) + y_lo;
          x2 = sxy[2].dec(rc, STEP_SXY) + x_lo + 1;
          y2 = sxy[3].dec(rc, STEP_SXY) + y_lo + 1;
          if (!(x1 < x2 && y1 < y2 && x2 <= X && y2 <= Y))
            throw StreamError("v2 sub-rect out of range");
        }
        if ((t - 1) & 2) {
          const int mx = mvx.dec(rc, STEP_MV) - msr_x;
          const int my = mvy.dec(rc, STEP_MV) - msr_y;
          SCPR_TRACE_REC("P mv bi=%d mx=%d my=%d\n", bi, mx, my);
          if (x1 + mx < 0 || y1 + my < 0 || x2 + mx > X || y2 + my > Y)
            throw StreamError("v2 motion vector out of range");
          for (int y = y1; y < y2; y++)
            memcpy(buf + y * stride + x1 * 3,
                   prev.data() + (y + my) * stride + (x1 + mx) * 3, (x2 - x1) * 3);
        } else {
          int x = x1, y = y1, ptype = 0;
          int r = 0, g = 0, b = 0;
          while (y < y2) {
            const int lastptype = ptype;
            ptype = ptab[lastptype].dec(rc, STEP_P);
            if (!ptype) dec_rgb(rc, r, g, b);
            int n = nrun[ptype].dec(rc, STEP_N);
            SCPR_TRACE_REC("P rec bi=%d ptype=%d n=%d rgb=%d,%d,%d\n", bi,
                           ptype, n, ptype ? -1 : r, ptype ? -1 : g,
                           ptype ? -1 : b);
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

  // ---------- framing (v2: I header byte 0x12 / flat 0x11; P byte 0/1) ------
  int encode(const u8* frame, int force_key, long kf_interval, std::vector<u8>& out) {
    std::vector<u8> buf((size_t)stride * Y, 0);
    for (int y = 0; y < Y; y++)
      memcpy(buf.data() + (size_t)y * stride, frame + (size_t)y * X * 3, (size_t)X * 3);

    bool flat = true;
    for (int i = 1; i < X * Y && flat; i++)
      flat = eq3(buf.data(), buf.data() + (i % X) * 3 + (i / X) * stride);
    if (flat) {
      if (!(last_flat && eq3(flat_clr, buf.data()))) {
        prev = buf;
        renew();
        memcpy(flat_clr, buf.data(), 3);
        force_i_next = true;
      }
      last_flat = true;
      fn++;
      out = {0x11, buf[0], buf[1], buf[2]};
      return 0;
    }
    last_flat = false;
    const bool key = force_key || fn == 0 || force_i_next ||
                     (kf_interval > 0 && fn % kf_interval == 0);
    force_i_next = false;
    fn++;
    out.clear();
    RC rc;
    if (key) {
      out.push_back(0x12);
      rc.enc_begin(&out);
      compress_i(rc, buf.data());
      rc.enc_end();
      prev = buf;
      return 0;
    }
    std::vector<u8> payload;
    std::vector<u8> hdr;
    rc.enc_begin(&payload);
    const int changes = compress_p(rc, buf.data(), hdr);
    if (changes) rc.enc_end();
    out = hdr;
    out.insert(out.end(), payload.begin(), payload.end());
    prev = buf;
    return 1;
  }

  // ftype: 0 = I, 1 = P (the VfW layer infers this; we take it explicitly,
  // with the same first-byte inference available in the Python wrapper)
  void decode(const u8* d, size_t len, int ftype, u8* out_frame) {
    std::vector<u8> buf((size_t)stride * Y, 0);
    RC rc;
    if (ftype == 1) {
      if (!len) throw StreamError("empty v2 P-frame");
      if (!(d[0] & 1)) {
        buf = prev;
      } else {
        rc.dec_begin(d + 1, len - 1);
        decompress_p(rc, buf.data());
        prev = buf;
      }
      last_flat = false;
    } else {
      if (!len) throw StreamError("empty v2 frame");
      const int alg = d[0] & 0x0F;
      if ((d[0] >> 4) != 1) throw StreamError("not a v2 stream");
      if (alg == 1) {
        if (len < 4) throw StreamError("truncated v2 flat frame");
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
        rc.dec_begin(d + 1, len - 1);
        decompress_i(rc, buf.data());
        prev = buf;
        last_flat = false;
      } else {
        throw StreamError("unknown v2 algorithm");
      }
    }
    for (int y = 0; y < Y; y++)
      memcpy(out_frame + (size_t)y * X * 3, buf.data() + (size_t)y * stride,
             (size_t)X * 3);
  }
};

}  // namespace scpr2

extern "C" {

void* scpr2_new(int w, int h, int msr_x, int msr_y) {
  return new scpr2::Codec(w, h, msr_x, msr_y);
}
void scpr2_free(void* c) { delete (scpr2::Codec*)c; }

long scpr2_encode(void* c, const uint8_t* frame, int force_key, long kf_interval,
                  uint8_t* out, long cap, int* ftype) {
  try {
    std::vector<uint8_t> buf;
    *ftype = ((scpr2::Codec*)c)->encode(frame, force_key, kf_interval, buf);
    if ((long)buf.size() > cap) return -2;
    memcpy(out, buf.data(), buf.size());
    return (long)buf.size();
  } catch (...) {
    return -1;
  }
}

int scpr2_decode(void* c, const uint8_t* data, long len, int ftype, uint8_t* out) {
  try {
    ((scpr2::Codec*)c)->decode(data, (size_t)len, ftype, out);
    return 0;
  } catch (...) {
    return -1;
  }
}

}  // extern "C"
