// Native asset-loading runtime for rustexp_tpu.
//
// C++ counterpart of the reference's Rust asset loaders: the ASCII mesh
// parser (reference rs-src/rasterizer.rs:150-348) and the Radiance-HDR
// RGBE decoder the reference gets from stb_image (rasterizer.rs:555-567).
// Exposed over a C ABI and consumed from Python via ctypes (no pybind11
// dependency); the Python side keeps pure-numpy fallbacks, so the engine
// works without the native library and tests can cross-check both paths.
//
// Build: `make -C rustexp_tpu/native` -> librustexp_native.so

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// ASCII mesh parsing
// ---------------------------------------------------------------------------

// Tokenizing number scanner over the whole file: skips whitespace and
// '#'-comment lines, parses one double per call. Returns 1 on success.
struct Scanner {
  const char* p;
  const char* end;
  bool at_line_start;
};

static int next_number(Scanner* s, double* out) {
  const char* p = s->p;
  const char* end = s->end;
  bool line_start = s->at_line_start;
  while (p < end) {
    char c = *p;
    if (c == '\n') {
      line_start = true;
      ++p;
    } else if (c == ' ' || c == '\t' || c == '\r') {
      ++p;
    } else if (c == '#' && line_start) {
      while (p < end && *p != '\n') ++p;  // comment line
    } else {
      break;
    }
  }
  if (p >= end) return 0;
  char* q = nullptr;
  double v = strtod(p, &q);
  if (q == p) return 0;
  *out = v;
  s->p = q;
  s->at_line_start = false;
  return 1;
}

// Parse the header far enough to learn the vertex count. Returns vertex
// count or -1 on error; *after_header is unused (parse restarts for data).
long rx_mesh_vertex_count(const char* text, long len) {
  Scanner s{text, text + len, true};
  double v;
  if (!next_number(&s, &v)) return -1;
  return (long)v;
}

// Full parse. vdata must hold vtx_cnt*ncomp floats, indices idx_cnt ints
// (call rx_mesh_counts first). Returns 0 on success, negative on error.
//   -1 bad vertex count     -2 EOF in vertices   -3 bad index count
//   -4 EOF in indices       -5 out-of-range index
long rx_mesh_parse(const char* text, long len, long ncomp,
                   float* vdata, long vdata_cap,
                   int32_t* indices, long idx_cap,
                   long* out_vtx_cnt, long* out_idx_cnt) {
  Scanner s{text, text + len, true};
  double v;
  if (!next_number(&s, &v) || v < 3) return -1;
  long vtx_cnt = (long)v;
  if (vtx_cnt * ncomp > vdata_cap) return -1;
  for (long i = 0; i < vtx_cnt * ncomp; ++i) {
    if (!next_number(&s, &v)) return -2;
    vdata[i] = (float)v;
  }
  if (!next_number(&s, &v)) return -3;
  long idx_cnt = (long)v;
  if (idx_cnt % 3 != 0 || idx_cnt > idx_cap) return -3;
  for (long i = 0; i < idx_cnt; ++i) {
    if (!next_number(&s, &v)) return -4;
    long idx = (long)v;
    if (idx < 0 || idx >= vtx_cnt) return -5;
    indices[i] = (int32_t)idx;
  }
  *out_vtx_cnt = vtx_cnt;
  *out_idx_cnt = idx_cnt;
  return 0;
}

// ---------------------------------------------------------------------------
// Radiance HDR (RGBE) decoding
// ---------------------------------------------------------------------------

// Decode the pixel payload (after the resolution line) of a -Y h +X w file
// into float RGB using stb_image's convention c * 2^(e-136).
// Returns 0 on success, negative on malformed input.
long rx_hdr_decode(const uint8_t* data, long len, long w, long h, float* out) {
  long pos = 0;
  // Row of RGBE bytes, reused
  uint8_t* row = (uint8_t*)malloc((size_t)w * 4);
  if (!row) return -1;
  for (long y = 0; y < h; ++y) {
    bool new_rle = false;
    if (w >= 8 && w <= 0x7FFF && pos + 4 <= len && data[pos] == 2 &&
        data[pos + 1] == 2 && ((data[pos + 2] << 8) | data[pos + 3]) == w) {
      new_rle = true;
      pos += 4;
    }
    if (new_rle) {
      for (int c = 0; c < 4; ++c) {
        long x = 0;
        while (x < w) {
          if (pos >= len) { free(row); return -2; }
          int count = data[pos++];
          if (count > 128) {  // run
            count -= 128;
            if (pos >= len || x + count > w) { free(row); return -3; }
            uint8_t val = data[pos++];
            for (int k = 0; k < count; ++k) row[(x + k) * 4 + c] = val;
            x += count;
          } else {  // literal
            if (pos + count > len || x + count > w) { free(row); return -4; }
            for (int k = 0; k < count; ++k) row[(x + k) * 4 + c] = data[pos++];
            x += count;
          }
        }
      }
    } else {
      // Flat RGBE with old-style RLE repeat markers (1,1,1,count)
      long x = 0;
      int shift = 0;
      while (x < w) {
        if (pos + 4 > len) { free(row); return -5; }
        const uint8_t* px = data + pos;
        pos += 4;
        if (px[0] == 1 && px[1] == 1 && px[2] == 1) {
          long count = (long)px[3] << shift;
          if (x == 0 || x + count > w) { free(row); return -6; }
          for (long k = 0; k < count; ++k)
            memcpy(row + (x + k) * 4, row + (x - 1) * 4, 4);
          x += count;
          shift += 8;
        } else {
          memcpy(row + x * 4, px, 4);
          ++x;
          shift = 0;
        }
      }
    }
    float* orow = out + y * w * 3;
    for (long x = 0; x < w; ++x) {
      int e = row[x * 4 + 3];
      float f = e ? ldexpf(1.0f, e - 136) : 0.0f;
      orow[x * 3 + 0] = row[x * 4 + 0] * f;
      orow[x * 3 + 1] = row[x * 4 + 1] * f;
      orow[x * 3 + 2] = row[x * 4 + 2] * f;
    }
  }
  free(row);
  return 0;
}

// ---------------------------------------------------------------------------
// ANSI truecolor frame pump (the viewer's per-frame host hot path)
// ---------------------------------------------------------------------------

static inline char* put_u8(char* o, unsigned v) {
  if (v >= 100) { *o++ = (char)('0' + v / 100); v %= 100; *o++ = (char)('0' + v / 10); v %= 10; }
  else if (v >= 10) { *o++ = (char)('0' + v / 10); v %= 10; }
  *o++ = (char)('0' + v);
  return o;
}

// Render an RGB8 frame (top-left origin, even h) as ANSI truecolor
// half-block rows ("▀" with fg = top pixel, bg = bottom pixel), with
// run-length color dedup so flat regions cost 3 bytes/cell. The Python
// f-string version of this loop costs ~60 ms at 512^2; this is ~1 ms and
// emits a ~3x smaller byte stream (faster terminals).
// Returns bytes written, or -1 if out_cap is too small (callers size
// out_cap at 43*w*h/2 + 8*h, the no-dedup worst case).
long rx_ansi_frame(const uint8_t* rgb, long h, long w, char* out,
                   long out_cap) {
  // Worst case per cell: "\e[38;2;R;G;Bm" (19) + "\e[48;2;R;G;Bm" (19) +
  // UTF-8 half block (3) = 41; plus per row "\e[0m\n" (5).
  if (out_cap < (43 * w * (h / 2) + 8 * h) / 1) return -1;
  char* o = out;
  for (long y = 0; y + 1 < h; y += 2) {
    const uint8_t* t = rgb + y * w * 3;
    const uint8_t* b = rgb + (y + 1) * w * 3;
    int pfr = -1, pfg = -1, pfb = -1, pbr = -1, pbg = -1, pbb = -1;
    for (long x = 0; x < w; ++x) {
      int fr = t[x * 3], fg = t[x * 3 + 1], fb = t[x * 3 + 2];
      int br = b[x * 3], bg = b[x * 3 + 1], bb = b[x * 3 + 2];
      if (fr != pfr || fg != pfg || fb != pfb) {
        memcpy(o, "\x1b[38;2;", 7); o += 7;
        o = put_u8(o, fr); *o++ = ';';
        o = put_u8(o, fg); *o++ = ';';
        o = put_u8(o, fb); *o++ = 'm';
        pfr = fr; pfg = fg; pfb = fb;
      }
      if (br != pbr || bg != pbg || bb != pbb) {
        memcpy(o, "\x1b[48;2;", 7); o += 7;
        o = put_u8(o, br); *o++ = ';';
        o = put_u8(o, bg); *o++ = ';';
        o = put_u8(o, bb); *o++ = 'm';
        pbr = br; pbg = bg; pbb = bb;
      }
      memcpy(o, "\xe2\x96\x80", 3); o += 3;  // U+2580 upper half block
    }
    memcpy(o, "\x1b[0m\n", 5); o += 5;
  }
  if (o > out) --o;  // drop the final newline (caller joins rows)
  return (long)(o - out);
}

// GIF-variant LZW over a flat uint8 index stream. Mirrors the pure-
// Python encoder in core/gif.py (_lzw_encode_py) BYTE FOR BYTE — same
// leading clear code, same code-size growth rule (grow when next_code
// exceeds 1<<code_size), same dictionary reset once next_code reaches
// 4096 — so the Python form stays a drop-in fallback and tests can pin
// equality. ~50x faster than the Python loop (the only scalar stage of
// the GIF writer). Returns bytes written, or -1 if out_cap too small
// (callers size out_cap at 2*n + 64: worst case is 12 bits per pixel).
long rx_gif_lzw(const uint8_t* idx, long n, int min_code_size,
                uint8_t* out, long out_cap) {
  if (out_cap < 2 * n + 64) return -1;
  const int clear = 1 << min_code_size;
  const int end_code = clear + 1;
  int code_size = min_code_size + 1;
  int next_code = end_code + 1;

  // (prefix code, byte) -> code table as flat arrays with an epoch mark
  // so a dictionary reset is O(1) instead of an 8 MB clear.
  const long tsize = 4096L * 256;
  int32_t* codes = (int32_t*)malloc(tsize * sizeof(int32_t));
  int32_t* epochs = (int32_t*)calloc(tsize, sizeof(int32_t));
  if (!codes || !epochs) { free(codes); free(epochs); return -1; }
  int32_t epoch = 1;

  uint8_t* o = out;
  uint32_t acc = 0;
  int nbits = 0;
  auto emit = [&](int code, int size) {
    acc |= (uint32_t)code << nbits;
    nbits += size;
    while (nbits >= 8) { *o++ = (uint8_t)(acc & 0xFF); acc >>= 8; nbits -= 8; }
  };

  emit(clear, code_size);
  int prefix = -1;
  for (long i = 0; i < n; ++i) {
    int v = idx[i];
    if (prefix < 0) { prefix = v; continue; }
    long key = (long)prefix * 256 + v;
    if (epochs[key] == epoch) { prefix = codes[key]; continue; }
    emit(prefix, code_size);
    codes[key] = next_code;
    epochs[key] = epoch;
    next_code += 1;
    if (next_code > (1 << code_size)) code_size += 1;
    if (next_code >= 4096) {  // dictionary full: reset (GIF spec)
      emit(clear, code_size);
      epoch += 1;
      next_code = end_code + 1;
      code_size = min_code_size + 1;
    }
    prefix = v;
  }
  if (prefix >= 0) emit(prefix, code_size);
  emit(end_code, code_size);
  if (nbits) *o++ = (uint8_t)(acc & 0xFF);
  free(codes);
  free(epochs);
  return (long)(o - out);
}

}  // extern "C"
