// Fast host-side PNG codec for the serving/training pipelines.
//
// WHY THIS EXISTS: the folder/watch drivers are host-codec-bound, not
// device-bound (PERF.md "Folder/watch serving pipeline"): PIL encodes the
// 3x HR output at ~2.6 MPix/s/core (adaptive filter + zlib level 6),
// ~500x slower than the chip's 1356 MPix/s.  The reference's host data
// path is native Rust (the `image` crate, reference src/main.rs:170,175);
// ours is native C++.
//
// Encoder: hand-rolled PNG container + zlib, because speed comes from
// three choices libpng's writer cannot make for us:
//   1. fixed Sub filter (one SIMD-friendly pass, no 5-way adaptive trial);
//   2. zlib level 1 (deflate dominates encode wall-clock);
//   3. pigz-style parallel deflate: the filtered scanlines are split into
//      row slabs, each thread raw-deflates its slab primed with the
//      previous slab's last 32 KB as dictionary (compression quality kept)
//      and ends on a byte boundary via Z_FULL_FLUSH; slab outputs simply
//      concatenate into ONE valid zlib stream (adler32_combine for the
//      checksum).  Byte-deterministic for a given (input, level, threads).
// Output parity: RGBA8 with alpha=255, exactly the pixels PIL writes after
// .convert("RGBA") (reference saves RGBA PNGs, src/main.rs:175).
//
// Decoder: libpng (system lib) for full-format coverage, but ONLY for
// 8-bit-depth files (IHDR-checked) — 16-bit PIL convert() and libpng
// disagree on the 16->8 rounding, so those fall back to PIL in Python.
// Always reads as RGBA then strips alpha: PIL's convert("RGB") DROPS
// alpha rather than compositing, and libpng's simplified RGB read would
// composite.  Returns negative codes on anything unsupported; the Python
// binding (utils/native.py) falls back to PIL on any negative.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <png.h>
#include <zlib.h>

namespace {

inline void put_be32(uint8_t* p, uint32_t v) {
  p[0] = uint8_t(v >> 24); p[1] = uint8_t(v >> 16);
  p[2] = uint8_t(v >> 8);  p[3] = uint8_t(v);
}

// Append one PNG chunk (length, type, data, crc) at `out`, return new end.
uint8_t* put_chunk(uint8_t* out, const char type[4], const uint8_t* data,
                   uint32_t len) {
  put_be32(out, len);
  std::memcpy(out + 4, type, 4);
  if (len) std::memcpy(out + 8, data, len);
  uint32_t crc = crc32(0L, out + 4, len + 4);
  put_be32(out + 8 + len, crc);
  return out + 12 + len;
}

struct SlabResult {
  std::vector<uint8_t> bytes;
  uint32_t adler = 1;
  size_t raw_len = 0;
  int err = 0;
};

// Raw-deflate one slab of the filtered stream.  Non-final slabs end with
// Z_FULL_FLUSH (byte-aligned, no BFINAL) so outputs concatenate; the final
// slab ends with Z_FINISH.
void deflate_slab(const uint8_t* data, size_t len, const uint8_t* dict,
                  size_t dict_len, int level, bool final, SlabResult* res) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  // windowBits=-15: raw deflate (we write the zlib wrapper ourselves);
  // memLevel 8/9 default-ish; strategy filtered helps post-Sub data.
  if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8, Z_FILTERED) != Z_OK) {
    res->err = -10;
    return;
  }
  if (dict_len) deflateSetDictionary(&zs, dict, uInt(dict_len));
  res->bytes.resize(deflateBound(&zs, uLong(len)) + 64);
  zs.next_out = res->bytes.data();
  // zlib's avail_in/avail_out and adler32's len are 32-bit: feed/drain in
  // <=1 GB windows so gigapixel-class slabs (>4 GB filtered) stay correct.
  size_t fed = 0;
  uint32_t ad = 1;
  bool done = false;
  while (!done) {
    size_t bite = std::min<size_t>(len - fed, 1u << 30);
    zs.next_in = const_cast<uint8_t*>(data + fed);
    zs.avail_in = uInt(bite);
    ad = uint32_t(adler32(ad, data + fed, uInt(bite)));
    fed += bite;
    bool last = fed == len;
    int flush = last ? (final ? Z_FINISH : Z_FULL_FLUSH) : Z_NO_FLUSH;
    while (true) {  // drain: deflate may stop on the 1 GB output window
      size_t used = size_t(zs.next_out - res->bytes.data());
      zs.avail_out = uInt(std::min<size_t>(res->bytes.size() - used, 1u << 30));
      if (zs.avail_out == 0) {  // deflateBound sizing makes this unreachable
        deflateEnd(&zs);
        res->err = -12;
        return;
      }
      int rc = deflate(&zs, flush);
      if (rc == Z_STREAM_END) {
        done = true;
        break;
      }
      if (rc != Z_OK && rc != Z_BUF_ERROR) {
        deflateEnd(&zs);
        res->err = -11;
        return;
      }
      // this window is fully processed when input is consumed AND the
      // output window didn't fill (nothing pending inside zlib)
      if (zs.avail_in == 0 && zs.avail_out != 0) {
        done = last && !final;  // FULL_FLUSH complete; FINISH ends above
        break;
      }
    }
  }
  res->bytes.resize(size_t(zs.next_out - res->bytes.data()));
  deflateEnd(&zs);
  res->adler = ad;
  res->raw_len = len;
}

// ---- fast-Huffman deflate (fpnge-class, VERDICT r4 #2) --------------------
//
// zlib level 1 still pays the full deflate machinery (hash chains, match
// search, lazy evaluation) per byte; on Sub-filtered scanlines nearly all
// of the compression comes from (a) entropy-coding the residual bytes and
// (b) collapsing runs of identical bytes (flat regions filter to zero
// runs).  So this codec does exactly those two things and nothing else:
// ONE dynamic-Huffman deflate block per slab, literals plus distance-1
// matches for runs >= 3, emitted through a 64-bit bit buffer.  Each slab
// is self-contained (the first byte of a run is always a literal, so no
// window crosses slab boundaries) and ends byte-aligned (Z_FULL_FLUSH
// sync pattern), so slabs concatenate into one valid raw-deflate stream
// exactly like the zlib path.  A slab whose Huffman coding would exceed
// stored size falls back to stored blocks (bound safety on adversarial
// input).
namespace fh {

struct BitWriter {
  uint8_t* out;
  size_t pos = 0;
  uint64_t acc = 0;
  unsigned n = 0;  // bits pending in acc (< 8 after flush)
  // LSB-first, cnt <= 40 total pending: branch-free flush — speculatively
  // store 8 bytes of acc (little-endian hosts; the build is -march=native
  // on x86) and advance by the whole bytes completed.  Callers guarantee
  // >= 8 bytes of slack in `out` (slab buffers reserve 64).
  inline void put(uint32_t bits, unsigned cnt) {
    acc |= uint64_t(bits) << n;
    n += cnt;
    std::memcpy(out + pos, &acc, 8);
    pos += n >> 3;
    acc >>= (n & ~7u);
    n &= 7;
  }
  // batched variant: cnt <= 56 (pending n <= 7 keeps the total < 64)
  inline void put64(uint64_t bits, unsigned cnt) {
    acc |= bits << n;
    n += cnt;
    std::memcpy(out + pos, &acc, 8);
    pos += n >> 3;
    acc >>= (n & ~7u);
    n &= 7;
  }
  inline void align() {
    if (n) {
      out[pos++] = uint8_t(acc);
      acc = 0;
      n = 0;
    }
  }
};

inline uint32_t bitrev(uint32_t v, unsigned bits) {
  uint32_t r = 0;
  for (unsigned i = 0; i < bits; ++i) r = (r << 1) | ((v >> i) & 1);
  return r;
}

// Deflate length codes 257..285: base length and extra bits.
static const uint16_t LEN_BASE[29] = {3,  4,  5,  6,  7,  8,  9,  10,
                                      11, 13, 15, 17, 19, 23, 27, 31,
                                      35, 43, 51, 59, 67, 83, 99, 115,
                                      131, 163, 195, 227, 258};
static const uint8_t LEN_EXTRA[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1,
                                      1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
                                      4, 4, 4, 4, 5, 5, 5, 5, 0};

inline int len_code_index(unsigned run) {  // run in [3, 258]
  // branchless-enough table walk (29 entries, called per match only)
  int c = 28;
  while (LEN_BASE[c] > run) --c;
  return c;
}

// Code lengths for `n` symbols with the given frequencies, max `limit`
// bits.  O(m^2) pair-merge Huffman (m <= 286 used symbols, built once
// per slab — negligible next to the megabytes of payload); overlong
// trees are fixed by halving the frequencies and rebuilding (monotonic:
// depths shrink every retry).  Deterministic (lowest-index tie-breaks).
void build_lengths(const uint64_t* freq_in, int n, int limit, uint8_t* len) {
  std::vector<uint64_t> f(freq_in, freq_in + n);
  std::vector<int> sym;
  for (;;) {
    sym.clear();
    for (int i = 0; i < n; ++i)
      if (f[i]) sym.push_back(i);
    std::memset(len, 0, size_t(n));
    const int m = int(sym.size());
    if (m == 0) return;
    if (m == 1) {
      len[sym[0]] = 1;
      return;
    }
    const int total = 2 * m - 1;
    std::vector<uint64_t> w(static_cast<size_t>(total), 0);
    std::vector<int> parent(static_cast<size_t>(total), -1);
    std::vector<char> act(static_cast<size_t>(total), 0);
    for (int i = 0; i < m; ++i) {
      w[i] = f[sym[i]];
      act[i] = 1;
    }
    int nn = m, remaining = m;
    while (remaining > 1) {
      int a = -1, b = -1;
      for (int i = 0; i < nn; ++i) {
        if (!act[i]) continue;
        if (a < 0 || w[i] < w[a]) {
          b = a;
          a = i;
        } else if (b < 0 || w[i] < w[b]) {
          b = i;
        }
      }
      w[nn] = w[a] + w[b];
      act[a] = act[b] = 0;
      act[nn] = 1;
      parent[a] = nn;
      parent[b] = nn;
      ++nn;
      --remaining;
    }
    int maxd = 0;
    for (int i = 0; i < m; ++i) {
      int d = 0, j = i;
      while (parent[j] >= 0) {
        j = parent[j];
        ++d;
      }
      len[sym[i]] = uint8_t(d);
      if (d > maxd) maxd = d;
    }
    if (maxd <= limit) return;
    for (int i = 0; i < n; ++i)
      if (f[i]) f[i] = (f[i] >> 1) + 1;  // flatten and retry
  }
}

// Canonical code assignment (RFC 1951 §3.2.2), pre-reversed for the
// LSB-first bit stream.
void assign_codes(const uint8_t* len, int n, uint16_t* code) {
  int bl_count[16] = {0};
  for (int i = 0; i < n; ++i) ++bl_count[len[i]];
  bl_count[0] = 0;
  uint32_t next[16] = {0};
  uint32_t c = 0;
  for (int bits = 1; bits <= 15; ++bits) {
    c = (c + uint32_t(bl_count[bits - 1])) << 1;
    next[bits] = c;
  }
  for (int i = 0; i < n; ++i)
    code[i] = len[i] ? uint16_t(bitrev(next[len[i]]++, len[i])) : 0;
}

// Walk the slab once, firing lit(byte) / match(run in [3,258]) exactly as
// the encoder will emit them — the histogram and the emit pass share this
// so the two can never disagree.
template <class Lit, class Match>
inline void scan(const uint8_t* d, size_t len, Lit lit, Match match) {
  size_t i = 0;
  while (i < len) {
    const uint8_t b = d[i];
    lit(b);
    ++i;
    while (i < len && d[i] == b) {
      size_t run = 1;
      const size_t lim = std::min<size_t>(len - i, 258);
      while (run < lim && d[i + run] == b) ++run;
      if (run < 3) break;  // the outer loop emits the stragglers
      match(unsigned(run));
      i += run;
    }
  }
}

// Emit the dynamic-Huffman block header (HLIT/HDIST/HCLEN + code-length
// code + RLE-coded lengths, RFC 1951 §3.2.7).
void put_dynamic_header(BitWriter& bw, const uint8_t* llen, int nlit,
                        const uint8_t* dlen, int ndist) {
  // concatenated code-length sequence with 16/17/18 RLE
  struct Item { uint8_t sym; uint8_t extra_bits; uint16_t extra; };
  std::vector<Item> seq;
  std::vector<uint8_t> all(size_t(nlit + ndist));
  std::memcpy(all.data(), llen, size_t(nlit));
  std::memcpy(all.data() + nlit, dlen, size_t(ndist));
  const int tot = nlit + ndist;
  for (int i = 0; i < tot;) {
    const uint8_t v = all[i];
    int run = 1;
    while (i + run < tot && all[i + run] == v) ++run;
    if (v == 0) {
      while (run >= 11) {
        const int take = std::min(run, 138);
        seq.push_back({18, 7, uint16_t(take - 11)});
        run -= take;
        i += take;
      }
      while (run >= 3) {
        const int take = std::min(run, 10);
        seq.push_back({17, 3, uint16_t(take - 3)});
        run -= take;
        i += take;
      }
      while (run-- > 0) {
        seq.push_back({0, 0, 0});
        ++i;
      }
    } else {
      seq.push_back({v, 0, 0});
      --run;
      ++i;
      while (run >= 3) {
        const int take = std::min(run, 6);
        seq.push_back({16, 2, uint16_t(take - 3)});
        run -= take;
        i += take;
      }
      while (run-- > 0) {
        seq.push_back({v, 0, 0});
        ++i;
      }
    }
  }
  uint64_t clfreq[19] = {0};
  for (const auto& it : seq) ++clfreq[it.sym];
  uint8_t cllen[19];
  uint16_t clcode[19];
  build_lengths(clfreq, 19, 7, cllen);
  assign_codes(cllen, 19, clcode);
  static const uint8_t ORDER[19] = {16, 17, 18, 0, 8,  7, 9,  6, 10, 5,
                                    11, 4,  12, 3, 13, 2, 14, 1, 15};
  int ncl = 19;
  while (ncl > 4 && cllen[ORDER[ncl - 1]] == 0) --ncl;
  bw.put(uint32_t(nlit - 257), 5);
  bw.put(uint32_t(ndist - 1), 5);
  bw.put(uint32_t(ncl - 4), 4);
  for (int i = 0; i < ncl; ++i) bw.put(cllen[ORDER[i]], 3);
  for (const auto& it : seq) {
    bw.put(clcode[it.sym], cllen[it.sym]);
    if (it.extra_bits) bw.put(it.extra, it.extra_bits);
  }
}

// Stored-block fallback: len bytes as raw <=65535-byte blocks.
void put_stored(BitWriter& bw, const uint8_t* d, size_t len, bool final) {
  size_t i = 0;
  do {
    const size_t take = std::min<size_t>(len - i, 65535);
    const bool last = final && (i + take == len);
    bw.put(last ? 1u : 0u, 1);
    bw.put(0, 2);  // BTYPE=00
    bw.align();
    bw.put(uint32_t(take) & 0xff, 8);
    bw.put((uint32_t(take) >> 8) & 0xff, 8);
    bw.put(uint32_t(take ^ 0xffff) & 0xff, 8);
    bw.put((uint32_t(take ^ 0xffff) >> 8) & 0xff, 8);
    std::memcpy(bw.out + bw.pos, d + i, take);
    bw.pos += take;
    i += take;
  } while (i < len);
}

// Compress one slab (self-contained; byte-aligned at exit).
void fh_slab(const uint8_t* data, size_t len, bool final, SlabResult* res) {
  // adler over the raw slab, in <=1 GB windows (32-bit API)
  uint32_t ad = 1;
  for (size_t fed = 0; fed < len;) {
    const size_t bite = std::min<size_t>(len - fed, 1u << 30);
    ad = uint32_t(adler32(ad, data + fed, uInt(bite)));
    fed += bite;
  }
  res->adler = ad;
  res->raw_len = len;
  // output bound: stored fallback + sync/pad slack
  res->bytes.resize(len + len / 65535 * 5 + 64);
  BitWriter bw{res->bytes.data()};

  // Pass 1: SAMPLED histogram — every 8th 4 KB block (deterministic).
  // Counts only tune the code lengths; symbol coverage is guaranteed by
  // +1 smoothing on every literal/length symbol, so the emitter can
  // never produce a code-less symbol.  (A full-pass histogram measured
  // ~25-40% of encode wall-clock for ~1% ratio; probe61.)
  uint64_t lfreq[286];
  for (int i = 0; i < 286; ++i) lfreq[i] = 1;
  uint64_t dfreq = 1;
  uint64_t sample_bits = 0;  // entropy-ish estimate, filled after codes
  size_t sampled = 0;
  const size_t BLK = 4096;
  for (size_t off = 0; off < len; off += 8 * BLK) {
    const size_t end = std::min(len, off + BLK);
    sampled += end - off;
    scan(data + off, end - off,
         [&](uint8_t b) { ++lfreq[b]; },
         [&](unsigned run) {
           ++lfreq[257 + len_code_index(run)];
           ++dfreq;
         });
  }
  uint8_t llen[286];
  uint16_t lcode[286];
  build_lengths(lfreq, 286, 15, llen);
  assign_codes(llen, 286, lcode);
  const uint8_t dlen[1] = {1};
  const uint16_t dcode[1] = {0};

  for (int s = 0; s < 286; ++s) sample_bits += (lfreq[s] - 1) * llen[s];
  const uint64_t est_bytes =
      sampled ? sample_bits * ((len + sampled - 1) / sampled) / 8 : 0;
  bool stored = len == 0 || est_bytes + 512 >= len;
  if (!stored) {
    int nlit = 286;
    while (nlit > 257 && llen[nlit - 1] == 0) --nlit;
    bw.put(final ? 1u : 0u, 1);
    bw.put(2, 2);  // BTYPE=10 dynamic
    put_dynamic_header(bw, llen, nlit, dlen, 1);
    // Guarded emit (hand-scheduled hot loop — the token stream need not
    // match the sampling scan, only be valid deflate): literals batch up
    // to three codes into one 64-bit put; runs of >= 4 identical bytes
    // take the match path (literal + dist-1 matches, chained for runs
    // past 258).  The histogram is sampled, so the true coded size is
    // only known here — if it ever nears stored size, abandon and
    // rewrite the slab as stored blocks (bound safety; pathological
    // inputs only pay one wasted pass).
    const size_t guard = len > 64 ? len - 64 : 0;
    bool overflow = false;
    const uint8_t* d = data;
    // packed literal table: code | (len << 16) — one load per literal
    uint32_t ltab[256];
    for (int s = 0; s < 256; ++s)
      ltab[s] = uint32_t(lcode[s]) | (uint32_t(llen[s]) << 16);
    // PAIR table: both codes pre-merged per little-endian byte pair
    // (bits in the low 32, combined length in bits 32+) — the literal
    // fast path emits FOUR literals per put with two loads.  512 KB,
    // L2-resident; built once per slab (<1 ms vs MBs of payload).
    std::vector<uint64_t> ptab(65536);
    for (int a = 0; a < 256; ++a) {
      const uint32_t ca = lcode[a], la = llen[a];
      for (int b2 = 0; b2 < 256; ++b2)
        ptab[size_t(a) | (size_t(b2) << 8)] =
            (ca | (uint32_t(lcode[b2]) << la)) |
            (uint64_t(la + llen[b2]) << 32);
    }
    auto run_at = [&](size_t j) -> bool {  // 4 equal bytes at j?
      uint32_t v;
      std::memcpy(&v, d + j, 4);
      return v == uint32_t(d[j]) * 0x01010101u;
    };
    size_t i = 0;
    while (i < len) {
      if (bw.pos >= guard) {
        overflow = true;
        break;
      }
      if (i + 8 > len) {  // tail: plain literals
        const uint32_t e = ltab[d[i]];
        bw.put(e & 0xffff, e >> 16);
        ++i;
        continue;
      }
      const uint8_t b = d[i];
      if (run_at(i)) {
        const uint32_t e = ltab[b];
        bw.put(e & 0xffff, e >> 16);
        ++i;
        for (;;) {
          const size_t lim = std::min<size_t>(len - i, 258);
          size_t run = 1;
          while (run < lim && d[i + run] == b) ++run;
          if (run < 3) break;  // stragglers exit as literals
          const int c = len_code_index(unsigned(run));
          bw.put(lcode[257 + c], llen[257 + c]);
          if (LEN_EXTRA[c])
            bw.put(uint32_t(run) - LEN_BASE[c], LEN_EXTRA[c]);
          bw.put(dcode[0], dlen[0]);
          i += run;
          if (i >= len || d[i] != b) break;
        }
        continue;
      }
      // 4 literals via two pair entries.  A run STARTING inside the
      // quad is simply emitted as literals (matches are optional in
      // deflate — the next iteration's run probe catches the rest of
      // the run; the ratio cost is <= 3 literals per missed head).
      uint16_t k1, k2;
      std::memcpy(&k1, d + i, 2);
      std::memcpy(&k2, d + i + 2, 2);
      const uint64_t e1 = ptab[k1], e2 = ptab[k2];
      const unsigned c1 = unsigned(e1 >> 32), c2 = unsigned(e2 >> 32);
      if (c1 + c2 <= 56) {
        bw.put64((e1 & 0xffffffffu) |
                 ((e2 & 0xffffffffu) << c1), c1 + c2);
      } else {  // two long codes back to back (rare): split the put
        bw.put64(e1 & 0xffffffffu, c1);
        bw.put64(e2 & 0xffffffffu, c2);
      }
      i += 4;
    }
    if (overflow) {
      bw.pos = 0;
      bw.acc = 0;
      bw.n = 0;
      stored = true;
    } else {
      bw.put(lcode[256], llen[256]);  // end of block
      if (!final) {
        // Z_FULL_FLUSH sync: empty stored block, leaves us byte-aligned.
        bw.put(0, 1);
        bw.put(0, 2);
        bw.align();
        bw.put(0x0000, 16);
        bw.put(0xffff, 16);
      }
    }
  }
  if (stored) put_stored(bw, data, len, final);
  bw.align();
  res->bytes.resize(bw.pos);
}

}  // namespace fh
}  // namespace

extern "C" {

// Worst-case output size for sr_png_encode's `out` buffer.
int64_t sr_png_bound(int64_t h, int64_t w) {
  int64_t raw = h * (1 + w * 4);
  // stored-block worst case ~ raw*(1+1/16K)+slack, plus container/chunk
  // overhead (one chunk header per <=4 MB of IDAT) and slab flush bytes.
  return raw + raw / 1024 + (raw / (4 << 20) + 4) * 12 + 4096;
}

// (h,w,3) u8 RGB -> RGBA PNG bytes in `out` (caller: cap >= sr_png_bound).
// level: zlib 0..9 (0 = stored, fastest, no compression).
// threads: deflate threads (<=0 -> 1).
// codec: 0 = zlib deflate at `level`; 1 = fast-Huffman deflate (fh::,
//        `level` ignored except 0 which still means stored/None-filter).
// Returns bytes written, <0 on error.
int64_t sr_png_encode2(const uint8_t* rgb, int64_t h, int64_t w,
                       int64_t level, int64_t threads, int64_t codec,
                       uint8_t* out, int64_t cap) {
  if (h <= 0 || w <= 0 || level < 0 || level > 9) return -1;
  if (codec != 0 && codec != 1) return -1;
  if (cap < sr_png_bound(h, w)) return -2;
  const size_t stride = 1 + size_t(w) * 4;     // filter byte + RGBA row
  const size_t raw = size_t(h) * stride;

  // Filter pass: RGB -> RGBA (alpha 255) with per-row filter.
  // level 0 is stored deflate: filtering would only slow decode, use None.
  // Two vectorizable passes (expand, then byte-shifted subtract) instead
  // of one scalar pixel loop: Sub has NO loop-carried dependency when
  // expressed as out[i] = cur[i] - cur[i-4], and the split let GCC SIMD
  // both (measured ~2x on the whole encode for photo content).
  std::vector<uint8_t> filt(raw);
  const int ftype = level == 0 ? 0 : 1;  // None : Sub
  std::vector<uint8_t> tmp(ftype ? size_t(w) * 4 : 0);
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* src = rgb + size_t(y) * w * 3;
    uint8_t* row = filt.data() + size_t(y) * stride;
    row[0] = uint8_t(ftype);
    uint8_t* dst = ftype ? tmp.data() : row + 1;
    for (int64_t x = 0; x < w; ++x) {
      dst[4 * x + 0] = src[3 * x + 0];
      dst[4 * x + 1] = src[3 * x + 1];
      dst[4 * x + 2] = src[3 * x + 2];
      dst[4 * x + 3] = 255;
    }
    if (ftype) {
      uint8_t* px = row + 1;
      px[0] = tmp[0]; px[1] = tmp[1]; px[2] = tmp[2]; px[3] = tmp[3];
      const size_t nb = size_t(w) * 4;
      for (size_t i = 4; i < nb; ++i) px[i] = uint8_t(tmp[i] - tmp[i - 4]);
    }
  }

  // Slab split on row boundaries, >=1 MB per slab (tiny slabs cost
  // dictionary-priming overhead and compression ratio for no win).
  size_t nthreads = threads <= 0 ? 1 : size_t(threads);
  size_t max_slabs = raw / (1 << 20) + 1;
  if (nthreads > max_slabs) nthreads = max_slabs;
  if (nthreads > size_t(h)) nthreads = size_t(h);  // >=1 row per slab
  size_t rows_per = (size_t(h) + nthreads - 1) / nthreads;
  std::vector<SlabResult> slabs(nthreads);
  std::vector<std::thread> pool;
  size_t row0 = 0;
  for (size_t t = 0; t < nthreads; ++t) {
    size_t row1 = row0 + rows_per;
    if (row1 > size_t(h)) row1 = size_t(h);
    const uint8_t* p = filt.data() + row0 * stride;
    size_t len = (row1 - row0) * stride;
    const uint8_t* dict = nullptr;
    size_t dict_len = 0;
    if (t > 0 && codec == 0) {  // fh slabs are self-contained, no window
      dict_len = std::min<size_t>(32768, row0 * stride);
      dict = p - dict_len;
    }
    bool final = (t == nthreads - 1);
    if (codec == 1 && level != 0) {
      if (final) {
        fh::fh_slab(p, len, true, &slabs[t]);
      } else {
        pool.emplace_back(fh::fh_slab, p, len, false, &slabs[t]);
      }
    } else if (final) {
      deflate_slab(p, len, dict, dict_len, int(level), true, &slabs[t]);
    } else {
      pool.emplace_back(deflate_slab, p, len, dict, dict_len, int(level),
                        false, &slabs[t]);
    }
    row0 = row1;
  }
  for (auto& th : pool) th.join();

  size_t zlen = 2;  // zlib header
  uint32_t adler = 1;
  for (auto& s : slabs) {
    if (s.err) return s.err;
    zlen += s.bytes.size();
    adler = uint32_t(adler32_combine(adler, s.adler, z_off_t(s.raw_len)));
  }
  zlen += 4;  // adler trailer

  // Assemble the file.
  uint8_t* p = out;
  static const uint8_t SIG[8] = {0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a};
  std::memcpy(p, SIG, 8); p += 8;
  uint8_t ihdr[13];
  put_be32(ihdr, uint32_t(w));
  put_be32(ihdr + 4, uint32_t(h));
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 6;   // color type RGBA
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  p = put_chunk(p, "IHDR", ihdr, 13);

  // IDAT in <=4 MB chunks straight from the slab buffers (one temp-free
  // pass; the chunk boundary is independent of slab boundaries).
  const size_t CHUNK = 4 << 20;
  std::vector<uint8_t> zhead = {0x78, 0x01};  // CMF/FLG, any level: valid
  uint8_t trailer[4];
  put_be32(trailer, adler);
  // Gather (head, slabs..., trailer) into chunk-sized IDATs.
  struct Piece { const uint8_t* d; size_t n; };
  std::vector<Piece> pieces;
  pieces.push_back({zhead.data(), zhead.size()});
  for (auto& s : slabs) pieces.push_back({s.bytes.data(), s.bytes.size()});
  pieces.push_back({trailer, 4});
  size_t remaining = zlen;
  size_t pi = 0, off = 0;
  while (remaining) {
    size_t this_chunk = remaining < CHUNK ? remaining : CHUNK;
    // chunk header
    put_be32(p, uint32_t(this_chunk));
    std::memcpy(p + 4, "IDAT", 4);
    uint8_t* data = p + 8;
    size_t need = this_chunk;
    while (need) {
      size_t avail = pieces[pi].n - off;
      size_t take = avail < need ? avail : need;
      std::memcpy(data, pieces[pi].d + off, take);
      data += take; off += take; need -= take;
      if (off == pieces[pi].n) { ++pi; off = 0; }
    }
    uint32_t crc = crc32(0L, p + 4, uInt(this_chunk + 4));
    put_be32(p + 8 + this_chunk, crc);
    p += 12 + this_chunk;
    remaining -= this_chunk;
  }
  p = put_chunk(p, "IEND", nullptr, 0);
  return p - out;
}

// Back-compat entry: zlib codec.
int64_t sr_png_encode(const uint8_t* rgb, int64_t h, int64_t w,
                      int64_t level, int64_t threads, uint8_t* out,
                      int64_t cap) {
  return sr_png_encode2(rgb, h, w, level, threads, 0, out, cap);
}

// Parse IHDR: returns 0 and fills hw[0..1] = {h, w} on a supported file;
// negative if not a PNG / not 8-bit / malformed.  NOTE: h/w come straight
// from the (untrusted) header — the Python binding caps h*w against PIL's
// decompression-bomb limit before allocating.
//
// Gamma parity gate: libpng's simplified read API defines 8-bit RGBA
// output as sRGB-ENCODED, so a file carrying a gAMA chunk meaningfully
// off the sRGB value (45455) — and no sRGB chunk, which takes precedence
// per the PNG spec and suppresses the remap — has its sample values
// gamma-converted by png_image_finish_read.  PIL returns the raw bytes.
// Such files (e.g. gAMA=1.0 linear-light masters) must fall back to PIL
// or the documented convert("RGB") parity silently breaks.  libpng skips
// the remap within ~0.5% of the sRGB gamma (PNG_GAMMA_THRESHOLD), so the
// common gAMA=45455-alongside-sRGB encoders stay on the fast path.
// (iCCP is fine: libpng does not apply ICC transforms.)
int64_t sr_png_info(const uint8_t* data, int64_t n, int64_t* hw) {
  static const uint8_t SIG[8] = {0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a};
  if (n < 33 || std::memcmp(data, SIG, 8) != 0) return -1;
  if (std::memcmp(data + 12, "IHDR", 4) != 0) return -1;
  uint32_t w = (uint32_t(data[16]) << 24) | (uint32_t(data[17]) << 16) |
               (uint32_t(data[18]) << 8) | data[19];
  uint32_t h = (uint32_t(data[20]) << 24) | (uint32_t(data[21]) << 16) |
               (uint32_t(data[22]) << 8) | data[23];
  if (!w || !h) return -1;
  if (data[24] != 8) return -2;  // 16-bit: PIL rounding parity, fall back

  // Walk the pre-IDAT chunk headers for gAMA / sRGB (both must appear
  // before IDAT per the spec; stop there, or on truncation/overflow —
  // libpng re-validates the stream in full during the actual decode).
  bool has_srgb = false;
  int64_t gama = -1;
  int64_t p = 8 + 4 + 4 + 13 + 4;  // past IHDR
  while (p + 8 <= n) {
    uint32_t len = (uint32_t(data[p]) << 24) | (uint32_t(data[p + 1]) << 16) |
                   (uint32_t(data[p + 2]) << 8) | data[p + 3];
    const uint8_t* t = data + p + 4;
    if (std::memcmp(t, "IDAT", 4) == 0 || std::memcmp(t, "IEND", 4) == 0)
      break;
    if (std::memcmp(t, "sRGB", 4) == 0) has_srgb = true;
    if (std::memcmp(t, "gAMA", 4) == 0 && len == 4 && p + 12 <= n)
      gama = (int64_t(data[p + 8]) << 24) | (int64_t(data[p + 9]) << 16) |
             (int64_t(data[p + 10]) << 8) | data[p + 11];
    if (int64_t(len) > n || p + 12 + int64_t(len) > n) break;  // truncated
    p += 12 + int64_t(len);
  }
  if (!has_srgb && gama >= 0 && (gama < 45255 || gama > 45655))
    return -6;  // non-sRGB gamma: libpng would remap, PIL would not

  hw[0] = h;
  hw[1] = w;
  return 0;
}

// Decode an 8-bit PNG to (h,w,3) u8 RGB, dropping alpha (PIL convert("RGB")
// parity: drop, never composite).  Caller sizes `out` from sr_png_info.
// Returns 0 ok, negative on error (caller falls back to PIL).
int64_t sr_png_decode(const uint8_t* data, int64_t n, uint8_t* out,
                      int64_t h, int64_t w) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, data, size_t(n))) return -3;
  if (int64_t(image.height) != h || int64_t(image.width) != w) {
    png_image_free(&image);
    return -4;
  }
  // RGBA (no compositing), then strip.  Gray/palette expand inside libpng.
  image.format = PNG_FORMAT_RGBA;
  std::vector<uint8_t> rgba(size_t(h) * w * 4);
  if (!png_image_finish_read(&image, nullptr, rgba.data(), 0, nullptr)) {
    png_image_free(&image);
    return -5;
  }
  const uint8_t* s = rgba.data();
  uint8_t* d = out;
  for (int64_t i = 0, npx = h * w; i < npx; ++i) {
    d[0] = s[0]; d[1] = s[1]; d[2] = s[2];
    d += 3; s += 4;
  }
  return 0;
}

}  // extern "C"
