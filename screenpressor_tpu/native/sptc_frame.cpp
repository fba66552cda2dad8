// SPTC1 native codec — frame layer + C API (included from sptc.cpp).
// Pixel model / block analysis per FORMAT.md; reference capability analogs:
// `GetPixelType*`/`PixelTypeFits*` (`screencap.cpp:502-604`),
// `DecideBlockTypes`/`FindMV` (`screencap.cpp:684-1087`),
// `CompressFrame`/`DecompressFrame` (`screencap.cpp:1456-1557`).

#include <array>
#include <map>
#include <memory>

namespace sptc {

struct Config {
  int w = 0, h = 0;
  int kf_interval = 500;
  int loss = 0;
  int msr_x = 64, msr_y = 64, msr_low_x = 8, msr_low_y = 8;
};

// ----- container helpers -----------------------------------------------------
static void put_u32(std::vector<uint8_t>& o, uint32_t v) {
  o.push_back(v & 0xFF); o.push_back((v >> 8) & 0xFF);
  o.push_back((v >> 16) & 0xFF); o.push_back((v >> 24) & 0xFF);
}
static uint32_t get_u32(const uint8_t* d, size_t n, size_t& pos) {
  if (pos + 4 > n) throw StreamError("truncated header");
  uint32_t v = d[pos] | (d[pos + 1] << 8) | (d[pos + 2] << 16) |
               ((uint32_t)d[pos + 3] << 24);
  pos += 4;
  return v;
}
static void put_varint(std::vector<uint8_t>& o, uint32_t v) {
  // unsigned LEB128 (container rev 3: headers are varints)
  do {
    uint8_t b = v & 0x7F;
    v >>= 7;
    o.push_back(b | (v ? 0x80 : 0));
  } while (v);
}
static uint32_t get_varint(const uint8_t* d, size_t n, size_t& pos) {
  uint32_t v = 0;
  int shift = 0;
  while (true) {
    if (pos >= n) throw StreamError("truncated varint header");
    uint8_t b = d[pos++];
    v |= (uint32_t)(b & 0x7F) << shift;
    if (!(b & 0x80)) return v;
    shift += 7;
    if (shift > 35) throw StreamError("varint overflow");
  }
}
static void pack_section(std::vector<uint8_t>& o,
                         const std::vector<std::vector<uint8_t>>& blobs) {
  int k = (int)blobs.size(), klog = 0;
  while ((1 << klog) < k) klog++;
  size_t m = 0;
  for (auto& b : blobs) m = std::max(m, b.size());
  // status byte: bits 0-3 klog, bits 4-5 size-table width code (1/2/4 B)
  const int w = m < (1u << 8) ? 1 : (m < (1u << 16) ? 2 : 4);
  const int wcode = w == 1 ? 0 : (w == 2 ? 1 : 2);
  o.push_back((uint8_t)(klog | (wcode << 4)));
  for (auto& b : blobs)
    for (int i = 0; i < w; i++) o.push_back((uint8_t)(b.size() >> (8 * i)));
  for (auto& b : blobs) o.insert(o.end(), b.begin(), b.end());
}
static std::vector<std::pair<const uint8_t*, size_t>> unpack_section(
    const uint8_t* d, size_t n, size_t& pos, int expect_k) {
  if (pos >= n) throw StreamError("truncated section");
  const uint8_t status = d[pos++];
  int k = 1 << (status & 0x0F);
  const int wcode = (status >> 4) & 0x03;
  if (wcode > 2) throw StreamError("bad section width code");
  const int w = 1 << wcode;
  if (k != expect_k) throw StreamError("lane count mismatch");
  std::vector<uint32_t> sizes(k, 0);
  for (int i = 0; i < k; i++) {
    if (pos + w > n) throw StreamError("truncated lane size table");
    for (int j = 0; j < w; j++) sizes[i] |= (uint32_t)d[pos++] << (8 * j);
  }
  std::vector<std::pair<const uint8_t*, size_t>> out(k);
  for (int i = 0; i < k; i++) {
    if (pos + sizes[i] > n) throw StreamError("truncated lane payload");
    out[i] = {d + pos, sizes[i]};
    pos += sizes[i];
  }
  return out;
}

// ----- I-frame classification / reconstruction -------------------------------
struct Px { int32_t r, g, b; };
static inline bool eq3(const uint8_t* a, const uint8_t* b) {
  return a[0] == b[0] && a[1] == b[1] && a[2] == b[2];
}

static void classify_i(const uint8_t* f, int h, int w, std::vector<Rec>& recs,
                       std::vector<Rec>& lits) {
  const int n = h * w;
  auto fits = [&](int t, int i) -> bool {
    if (i == 0) return false;
    const uint8_t* c = f + 3 * i;
    const uint8_t* lf = f + 3 * (i - 1);
    switch (t) {
      case PT_LIT: case PT_LEFT: return eq3(c, lf);
      case PT_ABOVE: return i >= w && eq3(c, f + 3 * (i - w));
      case PT_AL: {
        if (i < w) return false;
        int al = (i % w) ? i - w - 1 : i - 1;
        return eq3(c, f + 3 * al);
      }
      case PT_GRAD: {
        if (i < w) return false;
        int al = (i % w) ? i - w - 1 : i - 1;
        const uint8_t* ab = f + 3 * (i - w);
        const uint8_t* alp = f + 3 * al;
        return c[0] == lf[0] + ab[0] - alp[0] && c[1] == lf[1] + ab[1] - alp[1] &&
               c[2] == lf[2] + ab[2] - alp[2];
      }
    }
    return false;
  };
  auto start_type = [&](int i) -> int {
    if (i == 0) return PT_LIT;
    if (fits(PT_LEFT, i)) return PT_LEFT;
    if (fits(PT_AL, i)) return PT_AL;
    if (fits(PT_ABOVE, i)) return PT_ABOVE;
    if (fits(PT_GRAD, i)) return PT_GRAD;
    return PT_LIT;
  };
  // shared encoder policy (config.seg_tile): legacy 1024 for small
  // frames; large frames use whole-row tiles near 16K pixels (fewer
  // forced run breaks — the atypical break run lengths dilute the nrun
  // tables)
  int seg_tile = 1024;
  if (n > 128 * 1024) {
    int cap = std::min(16384, n / 64);
    int rows = std::max(1, cap / w);
    seg_tile = rows * w;
  }
  int i = 0;
  while (i < n) {
    int t = start_type(i);
    int ln = 1;
    const int lim = std::min({n - i, (int)MAX_RUN, seg_tile - (i % seg_tile)});
    while (ln < lim && fits(t, i + ln)) ln++;
    Rec r{};
    r.v[0] = t; r.v[1] = ln;
    recs.push_back(r);
    if (t == PT_LIT) {
      Rec l{};
      l.v[0] = f[3 * i]; l.v[1] = f[3 * i + 1]; l.v[2] = f[3 * i + 2];
      lits.push_back(l);
    }
    i += ln;
  }
}

static void reconstruct_i(const std::vector<Rec>& recs, const std::vector<Rec>& lits,
                          int h, int w, uint8_t* out) {
  const int n = h * w;
  int i = 0;
  size_t li = 0;
  for (auto& r : recs) {
    int t = r.v[0], ln = r.v[1];
    int32_t lit[3] = {0, 0, 0};
    if (t == PT_LIT) {
      lit[0] = lits[li].v[0]; lit[1] = lits[li].v[1]; lit[2] = lits[li].v[2];
      li++;
    }
    for (int p = 0; p < ln; p++, i++) {
      uint8_t* c = out + 3 * i;
      int al = (i % w) ? i - w - 1 : i - 1;
      const uint8_t* lf = out + 3 * (i - 1);
      switch (t) {
        case PT_LIT: c[0] = lit[0]; c[1] = lit[1]; c[2] = lit[2]; break;
        case PT_LEFT: memcpy(c, lf, 3); break;
        case PT_ABOVE: memcpy(c, out + 3 * (i - w), 3); break;
        case PT_AL: memcpy(c, out + 3 * al, 3); break;
        case PT_GRAD: {
          const uint8_t* ab = out + 3 * (i - w);
          const uint8_t* alp = out + 3 * al;
          c[0] = lf[0] + ab[0] - alp[0];
          c[1] = lf[1] + ab[1] - alp[1];
          c[2] = lf[2] + ab[2] - alp[2];
          break;
        }
      }
    }
  }
  if (i != n) throw StreamError("records do not tile frame");
}

// ----- P-frame ----------------------------------------------------------------
struct BRect { int x1, y1, x2, y2; };

struct PNeighbors {
  const uint8_t *cur, *prev;
  int w, h;
  BRect r;
  // neighbor with out-of-sub-rect reads from prev (FORMAT.md)
  const uint8_t* at(int y, int x) const {
    bool inside = x >= r.x1 && x < r.x2 && y >= r.y1 && y < r.y2;
    return (inside ? cur : prev) + 3 * (y * w + x);
  }
};

static void classify_block_p(const uint8_t* cur, const uint8_t* prev, int w, int h,
                             BRect rc, std::vector<Rec>& recs, std::vector<Rec>& lits) {
  PNeighbors nb{cur, prev, w, h, rc};
  int bw = rc.x2 - rc.x1, bh = rc.y2 - rc.y1, n = bw * bh;
  auto pos = [&](int p, int& y, int& x) { y = rc.y1 + p / bw; x = rc.x1 + p % bw; };
  auto fits = [&](int t, int p) -> bool {
    if (p == 0 && t == PT_LIT) return false;
    int y, x; pos(p, y, x);
    const uint8_t* c = cur + 3 * (y * w + x);
    switch (t) {
      case PT_LIT: {
        int py, px; pos(p - 1, py, px);
        return eq3(c, cur + 3 * (py * w + px));
      }
      case PT_LEFT: return x > 0 && eq3(c, nb.at(y, x - 1));
      case PT_ABOVE: return y > 0 && eq3(c, nb.at(y - 1, x));
      case PT_PREV: return eq3(c, prev + 3 * (y * w + x));
      case PT_AL: return x > 0 && y > 0 && eq3(c, nb.at(y - 1, x - 1));
      case PT_GRAD: {
        if (x == 0 || y == 0) return false;
        const uint8_t* lf = nb.at(y, x - 1);
        const uint8_t* ab = nb.at(y - 1, x);
        const uint8_t* al = nb.at(y - 1, x - 1);
        return c[0] == lf[0] + ab[0] - al[0] && c[1] == lf[1] + ab[1] - al[1] &&
               c[2] == lf[2] + ab[2] - al[2];
      }
    }
    return false;
  };
  auto start_type = [&](int p) -> int {
    for (int t : {PT_LEFT, PT_PREV, PT_AL, PT_ABOVE, PT_GRAD})
      if (fits(t, p)) return t;
    return PT_LIT;
  };
  int p = 0;
  while (p < n) {
    int t = start_type(p);
    int ln = 1;
    while (p + ln < n && ln < MAX_RUN && fits(t, p + ln)) ln++;
    Rec r{};
    r.v[0] = t; r.v[1] = ln;
    recs.push_back(r);
    if (t == PT_LIT) {
      int y, x; pos(p, y, x);
      const uint8_t* c = cur + 3 * (y * w + x);
      Rec l{};
      l.v[0] = c[0]; l.v[1] = c[1]; l.v[2] = c[2];
      lits.push_back(l);
    }
    p += ln;
  }
}

static void reconstruct_block_p(uint8_t* out, const uint8_t* prev, int w, int h,
                                BRect rc, const std::vector<Rec>& recs, size_t r0,
                                size_t r1, const std::vector<Rec>& lits, size_t& li) {
  PNeighbors nb{out, prev, w, h, rc};
  int bw = rc.x2 - rc.x1, bh = rc.y2 - rc.y1, n = bw * bh;
  int p = 0;
  for (size_t ri = r0; ri < r1; ri++) {
    int t = recs[ri].v[0], ln = recs[ri].v[1];
    int32_t lit[3] = {0, 0, 0};
    if (t == PT_LIT) {
      lit[0] = lits[li].v[0]; lit[1] = lits[li].v[1]; lit[2] = lits[li].v[2];
      li++;
    }
    for (int q = 0; q < ln; q++, p++) {
      int y = rc.y1 + p / bw, x = rc.x1 + p % bw;
      uint8_t* c = out + 3 * (y * w + x);
      switch (t) {
        case PT_LIT: c[0] = lit[0]; c[1] = lit[1]; c[2] = lit[2]; break;
        case PT_LEFT: memcpy(c, nb.at(y, x - 1), 3); break;
        case PT_ABOVE: memcpy(c, nb.at(y - 1, x), 3); break;
        case PT_PREV: memcpy(c, prev + 3 * (y * w + x), 3); break;
        case PT_AL: memcpy(c, nb.at(y - 1, x - 1), 3); break;
        case PT_GRAD: {
          const uint8_t* lf = nb.at(y, x - 1);
          const uint8_t* ab = nb.at(y - 1, x);
          const uint8_t* al = nb.at(y - 1, x - 1);
          c[0] = lf[0] + ab[0] - al[0];
          c[1] = lf[1] + ab[1] - al[1];
          c[2] = lf[2] + ab[2] - al[2];
          break;
        }
      }
    }
  }
  if (p != n) throw StreamError("pixel records do not tile block");
}

static std::vector<std::pair<int, int>> mv_candidates(const Config& cfg) {
  std::vector<std::pair<int, int>> c;
  // negative reach -msr, positive stop at msr-1 (spec/blocks.py)
  for (int d = 1; d <= cfg.msr_y; d++) {
    c.push_back({0, -d});
    if (d < cfg.msr_y) c.push_back({0, d});
  }
  for (int d = 1; d <= cfg.msr_x; d++) c.push_back({-d, 0});
  for (int d = 1; d < cfg.msr_x; d++) c.push_back({d, 0});
  std::map<std::pair<int, int>, bool> seen;
  seen[{0, 0}] = true;
  for (auto& p : c) seen[p] = true;
  for (int dy = -cfg.msr_low_y; dy <= cfg.msr_low_y; dy++)
    for (int dx = -cfg.msr_low_x; dx <= cfg.msr_low_x; dx++)
      if (!seen.count({dx, dy})) { c.push_back({dx, dy}); seen[{dx, dy}] = true; }
  return c;
}

static bool same_rect(const uint8_t* cur, const uint8_t* prev, int w, BRect rc,
                      int mx, int my) {
  for (int y = rc.y1; y < rc.y2; y++)
    if (memcmp(cur + 3 * (y * w + rc.x1), prev + 3 * ((y + my) * w + rc.x1 + mx),
               3 * (rc.x2 - rc.x1)))
      return false;
  return true;
}

// ----- sessions ----------------------------------------------------------------
struct Encoder {
  Config cfg;
  TableSet T;
  std::vector<uint8_t> prev;
  long fn = 0;
  bool last_flat = false;
  uint8_t flat_clr[3] = {0, 0, 0};

  explicit Encoder(Config c) : cfg(c) {}

  void apply_loss(std::vector<uint8_t>& f) const {
    if (cfg.loss <= 0) return;
    uint8_t mask = 0xFF & ~((1 << cfg.loss) - 1);
    uint8_t corr = (1 << cfg.loss) >> 1;
    for (auto& v : f) v = (v & mask) | corr;
  }

  // returns frame type (0=I, 1=P)
  int encode(const uint8_t* frame_in, int force_key, std::vector<uint8_t>& out) {
    const int w = cfg.w, h = cfg.h, n = w * h;
    std::vector<uint8_t> f(frame_in, frame_in + (size_t)3 * n);
    apply_loss(f);

    bool flat = true;
    for (int i = 1; i < n && flat; i++) flat = eq3(&f[0], &f[3 * i]);
    if (flat) {
      if (!(last_flat && eq3(flat_clr, &f[0]))) {
        prev = f;
        T.renew();
        memcpy(flat_clr, &f[0], 3);
      }
      last_flat = true;
      fn++;
      out = {(uint8_t)((VER_NIBBLE << 4) | ALG_FLAT), f[0], f[1], f[2]};
      return 0;
    }
    last_flat = false;

    bool key = force_key || prev.empty() || fn == 0 ||
               (cfg.kf_interval > 0 && fn % cfg.kf_interval == 0);
    fn++;
    int ftype;
    if (key) {
      T.renew();
      encode_i_frame(f, out);
      ftype = 0;
    } else {
      encode_p_frame(f, out);
      ftype = 1;
    }
    const size_t raw_size = 1 + (size_t)3 * n;
    if (out.size() >= raw_size) {
      T.renew();
      out.clear();
      out.push_back((VER_NIBBLE << 4) | ALG_RAW);
      out.insert(out.end(), f.begin(), f.end());
      ftype = 0;
    }
    prev = f;
    return ftype;
  }

  void encode_i_frame(const std::vector<uint8_t>& f, std::vector<uint8_t>& out) {
    std::vector<Rec> recs, lits;
    classify_i(f.data(), cfg.h, cfg.w, recs, lits);
    out.clear();
    out.push_back((VER_NIBBLE << 4) | ALG_I);
    put_varint(out, (uint32_t)recs.size());
    put_varint(out, (uint32_t)lits.size());
    pack_section(out, encode_section(recs, lane_count((int)recs.size()),
                                     SectionCodec(C_REC, T)));
    pack_section(out, encode_section(lits, lane_count((int)lits.size()),
                                     SectionCodec(C_COL, T)));
  }

  void encode_p_frame(const std::vector<uint8_t>& f, std::vector<uint8_t>& out) {
    const int w = cfg.w, h = cfg.h;
    const int nbx = (w + BLOCK - 1) / BLOCK, nby = (h + BLOCK - 1) / BLOCK;
    out.clear();
    out.push_back((VER_NIBBLE << 4) | ALG_P);

    std::vector<int> bts(nbx * nby, 0);
    std::vector<BRect> rects(nbx * nby);
    std::vector<std::pair<int, int>> mvs(nbx * nby, {0, 0});
    auto cands = mv_candidates(cfg);
    bool any = false;
    for (int by = 0; by < nby; by++)
      for (int bx = 0; bx < nbx; bx++) {
        int x_lo = bx * BLOCK, y_lo = by * BLOCK;
        int x_hi = std::min(x_lo + BLOCK, w), y_hi = std::min(y_lo + BLOCK, h);
        int sx1 = x_hi, sy1 = y_hi, sx2 = x_lo, sy2 = y_lo;
        for (int y = y_lo; y < y_hi; y++)
          for (int x = x_lo; x < x_hi; x++)
            if (!eq3(&f[3 * (y * w + x)], &prev[3 * (y * w + x)])) {
              sx1 = std::min(sx1, x); sx2 = std::max(sx2, x + 1);
              sy1 = std::min(sy1, y); sy2 = std::max(sy2, y + 1);
            }
        if (sx2 <= sx1) continue;
        any = true;
        int bi = by * nbx + bx;
        BRect rc{sx1, sy1, sx2, sy2};
        rects[bi] = rc;
        bool partial = !(sx1 == x_lo && sy1 == y_lo && sx2 == x_hi && sy2 == y_hi);
        int bt = partial ? 2 : 1;
        for (auto& c : cands) {
          int mx = c.first, my = c.second;
          if (rc.x1 + mx < 0 || rc.y1 + my < 0 || rc.x2 + mx > w || rc.y2 + my > h)
            continue;
          if (same_rect(f.data(), prev.data(), w, rc, mx, my)) {
            bt += 2;
            mvs[bi] = c;
            break;
          }
        }
        bts[bi] = bt;
      }

    if (!any) {
      out.push_back(0);
      return;
    }
    out.push_back(1);
    int xx1 = 0, xx2 = nbx * nby - 1;
    while (!bts[xx1]) xx1++;
    while (!bts[xx2]) xx2--;

    std::vector<Rec> btr, sxyr, mvr, pixr, litr;
    for (int x = xx1; x <= xx2;) {
      int bt = bts[x], ln = 1;
      while (x + ln <= xx2 && bts[x + ln] == bt && ln < MAX_RUN) ln++;
      Rec r{};
      r.v[0] = bt; r.v[1] = ln;
      btr.push_back(r);
      x += ln;
    }
    for (int bi = xx1; bi <= xx2; bi++) {
      if (!bts[bi]) continue;
      int bx = bi % nbx, by = bi / nbx, bt = bts[bi];
      BRect rc = rects[bi];
      if (bt == 2 || bt == 4) {
        Rec r{};
        r.v[0] = rc.x1 - bx * BLOCK; r.v[1] = rc.y1 - by * BLOCK;
        r.v[2] = rc.x2 - 1 - bx * BLOCK; r.v[3] = rc.y2 - 1 - by * BLOCK;
        sxyr.push_back(r);
      }
      if (bt == 3 || bt == 4) {
        Rec r{};
        r.v[0] = mvs[bi].first; r.v[1] = mvs[bi].second;
        mvr.push_back(r);
      }
      if (bt == 1 || bt == 2)
        classify_block_p(f.data(), prev.data(), w, h, rc, pixr, litr);
    }

    uint32_t ndata = 0;
    for (int bi = xx1; bi <= xx2; bi++)
      if (bts[bi] == 1 || bts[bi] == 2) ndata++;
    put_varint(out, xx1); put_varint(out, xx2);
    put_varint(out, (uint32_t)btr.size()); put_varint(out, (uint32_t)sxyr.size());
    put_varint(out, (uint32_t)mvr.size()); put_varint(out, (uint32_t)pixr.size());
    put_varint(out, (uint32_t)litr.size()); put_varint(out, ndata);
    pack_section(out, encode_section(btr, lane_count((int)btr.size()), SectionCodec(C_BT, T)));
    pack_section(out, encode_section(sxyr, lane_count((int)sxyr.size()), SectionCodec(C_SXY, T)));
    pack_section(out, encode_section(mvr, lane_count((int)mvr.size()), SectionCodec(C_MV, T)));
    pack_section(out, encode_section(pixr, lane_count((int)pixr.size()), SectionCodec(C_REC, T)));
    pack_section(out, encode_section(litr, lane_count((int)litr.size()), SectionCodec(C_COL, T)));
  }
};

struct Decoder {
  Config cfg;
  TableSet T;
  std::vector<uint8_t> prev;
  bool last_flat = false;
  uint8_t flat_clr[3] = {0, 0, 0};

  explicit Decoder(Config c) : cfg(c) {}

  void decode(const uint8_t* d, size_t len, uint8_t* out) {
    if (!len) throw StreamError("empty frame");
    if ((d[0] >> 4) != VER_NIBBLE) throw StreamError("bad version nibble");
    const int w = cfg.w, h = cfg.h, n = w * h;
    int alg = d[0] & 0x0F;
    if (alg == ALG_FLAT) {
      if (len < 4) throw StreamError("truncated flat frame");
      for (int i = 0; i < n; i++) memcpy(out + 3 * i, d + 1, 3);
      if (!(last_flat && eq3(flat_clr, d + 1))) {
        prev.assign(out, out + (size_t)3 * n);
        T.renew();
        memcpy(flat_clr, d + 1, 3);
      }
      last_flat = true;
      return;
    }
    last_flat = false;
    size_t pos = 1;
    if (alg == ALG_I) {
      T.renew();
      uint32_t nrec = get_varint(d, len, pos), nlit = get_varint(d, len, pos);
      auto rb = unpack_section(d, len, pos, lane_count(nrec));
      auto cb = unpack_section(d, len, pos, lane_count(nlit));
      auto recs = decode_section(rb, nrec, lane_count(nrec), SectionCodec(C_REC, T));
      auto lits = decode_section(cb, nlit, lane_count(nlit), SectionCodec(C_COL, T));
      long total = 0;
      for (auto& r : recs) total += r.v[1];
      if (total != n) throw StreamError("records do not tile frame");
      reconstruct_i(recs, lits, h, w, out);
      prev.assign(out, out + (size_t)3 * n);
      return;
    }
    if (alg == ALG_RAW) {
      if (len < 1 + (size_t)3 * n) throw StreamError("truncated raw frame");
      memcpy(out, d + 1, (size_t)3 * n);
      T.renew();
      prev.assign(out, out + (size_t)3 * n);
      return;
    }
    if (alg != ALG_P) throw StreamError("unknown frame algorithm");
    if (prev.empty()) throw StreamError("P-frame before any I-frame");
    if (pos >= len) throw StreamError("truncated P-frame");
    int flags = d[pos++];
    if (!(flags & 1)) {
      memcpy(out, prev.data(), (size_t)3 * n);
      return;
    }
    uint32_t xx1 = get_varint(d, len, pos), xx2 = get_varint(d, len, pos);
    uint32_t nbt = get_varint(d, len, pos), nsxy = get_varint(d, len, pos);
    uint32_t nmv = get_varint(d, len, pos), npix = get_varint(d, len, pos);
    uint32_t nlit = get_varint(d, len, pos), ndata = get_varint(d, len, pos);
    auto bb = unpack_section(d, len, pos, lane_count(nbt));
    auto sb = unpack_section(d, len, pos, lane_count(nsxy));
    auto mb = unpack_section(d, len, pos, lane_count(nmv));
    auto pb = unpack_section(d, len, pos, lane_count(npix));
    auto cb = unpack_section(d, len, pos, lane_count(nlit));
    auto btr = decode_section(bb, nbt, lane_count(nbt), SectionCodec(C_BT, T));
    auto sxyr = decode_section(sb, nsxy, lane_count(nsxy), SectionCodec(C_SXY, T));
    auto mvr = decode_section(mb, nmv, lane_count(nmv), SectionCodec(C_MV, T));
    auto pixr = decode_section(pb, npix, lane_count(npix), SectionCodec(C_REC, T));
    auto litr = decode_section(cb, nlit, lane_count(nlit), SectionCodec(C_COL, T));

    const int nbx = (w + BLOCK - 1) / BLOCK, nby = (h + BLOCK - 1) / BLOCK;
    std::vector<int> bts(nbx * nby, 0);
    uint32_t x = xx1;
    for (auto& r : btr) {
      if (x + r.v[1] > xx2 + 1) throw StreamError("bt runs overflow");
      for (int i = 0; i < r.v[1]; i++) bts[x++] = r.v[0];
    }
    if (x != xx2 + 1) throw StreamError("bt runs do not cover range");

    uint32_t ndata_seen = 0;
    for (int bi = 0; bi < nbx * nby; bi++)
      if (bts[bi] == 1 || bts[bi] == 2) ndata_seen++;
    if (ndata_seen != ndata) throw StreamError("data block count mismatch");

    memcpy(out, prev.data(), (size_t)3 * n);
    size_t si = 0, mi = 0, pi = 0, li = 0;
    for (int bi = 0; bi < nbx * nby; bi++) {
      int bt = bts[bi];
      if (!bt) continue;
      int bx = bi % nbx, by = bi / nbx;
      int x_lo = bx * BLOCK, y_lo = by * BLOCK;
      int x_hi = std::min(x_lo + BLOCK, w), y_hi = std::min(y_lo + BLOCK, h);
      BRect rc{x_lo, y_lo, x_hi, y_hi};
      if (bt == 2 || bt == 4) {
        const Rec& s = sxyr.at(si++);
        rc = {x_lo + s.v[0], y_lo + s.v[1], x_lo + s.v[2] + 1, y_lo + s.v[3] + 1};
        if (!(x_lo <= rc.x1 && rc.x1 < rc.x2 && rc.x2 <= x_hi && y_lo <= rc.y1 &&
              rc.y1 < rc.y2 && rc.y2 <= y_hi))
          throw StreamError("sub-rect outside block");
      }
      if (bt == 3 || bt == 4) {
        const Rec& m = mvr.at(mi++);
        int mx = m.v[0], my = m.v[1];
        if (rc.x1 + mx < 0 || rc.y1 + my < 0 || rc.x2 + mx > w || rc.y2 + my > h)
          throw StreamError("motion vector out of bounds");
        for (int y = rc.y1; y < rc.y2; y++)
          memcpy(out + 3 * (y * w + rc.x1),
                 prev.data() + 3 * ((y + my) * w + rc.x1 + mx),
                 3 * (rc.x2 - rc.x1));
      } else {
        long area = (long)(rc.x2 - rc.x1) * (rc.y2 - rc.y1);
        long covered = 0;
        size_t r0 = pi;
        while (covered < area) {
          if (pi >= pixr.size()) throw StreamError("pixel records exhausted");
          covered += pixr[pi++].v[1];
        }
        if (covered != area) throw StreamError("pixel records do not tile block");
        reconstruct_block_p(out, prev.data(), w, h, rc, pixr, r0, pi, litr, li);
      }
    }
    prev.assign(out, out + (size_t)3 * n);
  }
};

}  // namespace sptc

// ----- C API -------------------------------------------------------------------
extern "C" {

void* sptc_encoder_new(int w, int h, int kf_interval, int loss, int msr_x,
                       int msr_y, int msr_low_x, int msr_low_y) {
  sptc::Config c;
  c.w = w; c.h = h; c.kf_interval = kf_interval; c.loss = loss;
  c.msr_x = msr_x; c.msr_y = msr_y; c.msr_low_x = msr_low_x; c.msr_low_y = msr_low_y;
  return new sptc::Encoder(c);
}
void sptc_encoder_free(void* e) { delete (sptc::Encoder*)e; }

// returns compressed size, sets *ftype; returns -1 on error, -2 if out_cap small
long sptc_encode(void* e, const uint8_t* frame, int force_key, uint8_t* out,
                 long out_cap, int* ftype) {
  try {
    std::vector<uint8_t> buf;
    *ftype = ((sptc::Encoder*)e)->encode(frame, force_key, buf);
    if ((long)buf.size() > out_cap) return -2;
    memcpy(out, buf.data(), buf.size());
    return (long)buf.size();
  } catch (...) {
    return -1;
  }
}

void* sptc_decoder_new(int w, int h, int msr_x, int msr_y, int msr_low_x,
                       int msr_low_y) {
  sptc::Config c;
  c.w = w; c.h = h;
  c.msr_x = msr_x; c.msr_y = msr_y; c.msr_low_x = msr_low_x; c.msr_low_y = msr_low_y;
  return new sptc::Decoder(c);
}
void sptc_decoder_free(void* d) { delete (sptc::Decoder*)d; }

// returns 0 on success, -1 on error
int sptc_decode(void* dd, const uint8_t* data, long len, uint8_t* out) {
  try {
    ((sptc::Decoder*)dd)->decode(data, (size_t)len, out);
    return 0;
  } catch (...) {
    return -1;
  }
}

}  // extern "C"
