// bvt_io — native input-pipeline runtime for bayesvlm-tpu.
//
// The TPU compute path is JAX/XLA; this library accelerates the host side
// that feeds it (the reference leans on torch DataLoader worker processes;
// this image has one vCPU, so cheap C threads + no Python in the decode
// loop matter):
//
//   * tar shard indexing: one pass over a webdataset tar, returning
//     (name, offset, size) records so samples can be read with pread
//     without re-walking headers (used by bayesvlm_tpu.data.wds).
//   * batched JPEG decode + resize + center-crop + normalize straight
//     into a caller-provided float32 NHWC buffer, multithreaded with
//     pthreads; one memcpy-free pass from file bytes to model input.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <pthread.h>
#include <setjmp.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <algorithm>
#include <cmath>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// tar indexing
// ---------------------------------------------------------------------

struct BvtTarEntry {
  // 257 = 155-byte ustar prefix + '/' + 100-byte name + NUL: the maximum
  // legal ustar path is exactly 256 chars, which a 256-byte field would
  // silently truncate (dropping e.g. the 'g' of '.jpg' and breaking
  // extension grouping). Mirrored by ctypes in data/native_io.py.
  char name[257];
  uint64_t offset;  // offset of file DATA (after the 512-byte header)
  uint64_t size;
};

static uint64_t parse_octal(const char* p, size_t n) {
  uint64_t v = 0;
  for (size_t i = 0; i < n && p[i]; ++i) {
    if (p[i] < '0' || p[i] > '7') continue;
    v = v * 8 + (uint64_t)(p[i] - '0');
  }
  return v;
}

// GNU/STAR tars store sizes >= 8GB in base-256: high bit of byte 0 set,
// remaining bits + bytes are a big-endian integer. parse_octal would
// return garbage for those and corrupt every subsequent entry's offset.
static uint64_t parse_size(const unsigned char* p, size_t n) {
  if (p[0] & 0x80) {
    uint64_t v = p[0] & 0x7F;
    for (size_t i = 1; i < n; ++i) v = (v << 8) | p[i];
    return v;
  }
  return parse_octal((const char*)p, n);
}

// Index a tar file. Returns number of entries, fills *out with a
// malloc'ed array the caller frees via bvt_free_index. Returns -1 on error.
long bvt_tar_index(const char* path, BvtTarEntry** out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  std::vector<BvtTarEntry> entries;
  unsigned char hdr[512];
  uint64_t pos = 0;
  while (fread(hdr, 1, 512, f) == 512) {
    pos += 512;
    if (hdr[0] == 0) break;  // end-of-archive blocks
    uint64_t size = parse_size(hdr + 124, 12);
    char typeflag = hdr[156];
    if (typeflag == '0' || typeflag == 0) {  // regular file
      BvtTarEntry e;
      memset(&e, 0, sizeof(e));
      // POSIX ustar: prefix (345, 155 bytes) + name (0, 100 bytes).
      // The prefix field is only meaningful under the exact POSIX
      // magic "ustar\0" — GNU-format tars put atime there, which would
      // garble every name. Buffer is 257 bytes: 155 prefix + '/' +
      // 100 name + NUL (the old 256 overflowed by one at max lengths).
      char name[257] = {0};
      bool posix_ustar =
          memcmp(hdr + 257, "ustar", 5) == 0 && hdr[262] == 0;
      if (posix_ustar && hdr[345]) {
        size_t pl = strnlen((const char*)hdr + 345, 155);
        memcpy(name, hdr + 345, pl);
        name[pl] = '/';
        strncat(name, (const char*)hdr, 100);
      } else {
        memcpy(name, hdr, 100);
      }
      memcpy(e.name, name, sizeof(name));  // both 257 bytes, NUL-padded
      e.offset = pos;
      e.size = size;
      entries.push_back(e);
    }
    uint64_t padded = (size + 511) & ~511ULL;
    if (fseek(f, (long)padded, SEEK_CUR) != 0) break;
    pos += padded;
  }
  fclose(f);
  BvtTarEntry* arr = (BvtTarEntry*)malloc(entries.size() * sizeof(BvtTarEntry));
  memcpy(arr, entries.data(), entries.size() * sizeof(BvtTarEntry));
  *out = arr;
  return (long)entries.size();
}

void bvt_free_index(BvtTarEntry* arr) { free(arr); }

// Read `size` bytes at `offset` from path into buf (caller-allocated).
int bvt_pread(const char* path, uint64_t offset, uint64_t size, uint8_t* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, (long)offset, SEEK_SET) != 0) {
    fclose(f);
    return -2;
  }
  size_t got = fread(buf, 1, size, f);
  fclose(f);
  return got == size ? 0 : -3;
}

// ---------------------------------------------------------------------
// JPEG decode + resize + crop + normalize
// ---------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = (JpegErr*)cinfo->err;
  longjmp(err->jb, 1);
}

// Decode one JPEG into an RGB buffer (malloc'ed). Returns 0 on success.
static int decode_rgb(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                      int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb->resize((size_t)(*w) * (*h) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + (size_t)cinfo.output_scanline * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Bilinear sample at (x, y) in source RGB image.
static inline void bilinear(const uint8_t* src, int sw, int sh, float x,
                            float y, float* out3) {
  x = std::max(0.0f, std::min(x, (float)sw - 1.001f));
  y = std::max(0.0f, std::min(y, (float)sh - 1.001f));
  int x0 = (int)x, y0 = (int)y;
  // clamp the +1 neighbors: for 1-pixel-wide/tall sources the clamp
  // above still yields x0/y0 == 0, and an unconditional +1 would read
  // past the decoded buffer (heap over-read); for sw/sh >= 2 the
  // clamped index equals the old unconditional one
  int x1 = std::min(x0 + 1, sw - 1);
  int y1 = std::min(y0 + 1, sh - 1);
  float fx = x - x0, fy = y - y0;
  const uint8_t* p00 = src + ((size_t)y0 * sw + x0) * 3;
  const uint8_t* p01 = src + ((size_t)y0 * sw + x1) * 3;
  const uint8_t* p10 = src + ((size_t)y1 * sw + x0) * 3;
  const uint8_t* p11 = src + ((size_t)y1 * sw + x1) * 3;
  for (int c = 0; c < 3; ++c) {
    float a = p00[c] + (p01[c] - p00[c]) * fx;
    float b = p10[c] + (p11[c] - p10[c]) * fx;
    out3[c] = a + (b - a) * fy;
  }
}

struct DecodeTask {
  const uint8_t* const* datas;
  const uint64_t* lens;
  float* out;       // [n, size, size, 3]; null in uint8 mode
  uint8_t* out_u8;  // [n, size, size, 3]; null in float mode
  int n;
  int size;
  int square_resize;  // 1 = SigLIP square resize; 0 = shorter-side + crop
  const float* mean;  // [3] (float mode only)
  const float* stdv;  // [3]
  int* status;        // per-image 0/err
  int next;           // shared work index
  pthread_mutex_t mu;
};

static void process_one(DecodeTask* t, int i) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  int S = t->size;
  size_t plane = (size_t)S * S * 3;
  if (decode_rgb(t->datas[i], t->lens[i], &rgb, &w, &h) != 0) {
    t->status[i] = -1;
    if (t->out_u8)
      memset(t->out_u8 + (size_t)i * plane, 0, plane);
    else
      memset(t->out + (size_t)i * plane, 0, sizeof(float) * plane);
    return;
  }
  float* dstf = t->out ? t->out + (size_t)i * plane : nullptr;
  uint8_t* dstu = t->out_u8 ? t->out_u8 + (size_t)i * plane : nullptr;
  float px[3];
  float scale = 1.0f, ox = 0.0f, oy = 0.0f;
  if (!t->square_resize) {
    // shorter-side resize to S, center crop S x S
    scale = (w <= h) ? (float)w / S : (float)h / S;
    float rw = w / scale, rh = h / scale;
    ox = (rw - S) * 0.5f;
    oy = (rh - S) * 0.5f;
  }
  for (int yy = 0; yy < S; ++yy) {
    for (int xx = 0; xx < S; ++xx) {
      float sx, sy;
      if (t->square_resize) {
        sx = (xx + 0.5f) * w / S - 0.5f;
        sy = (yy + 0.5f) * h / S - 0.5f;
      } else {
        sx = (xx + ox + 0.5f) * scale - 0.5f;
        sy = (yy + oy + 0.5f) * scale - 0.5f;
      }
      bilinear(rgb.data(), w, h, sx, sy, px);
      size_t off = ((size_t)yy * S + xx) * 3;
      if (dstu) {
        // uint8 lane: quantize like PIL's uint8 resize output; the
        // /255-mean-std normalize runs in-graph on device (4x less
        // host->device traffic, zero host float math)
        for (int c = 0; c < 3; ++c) {
          float v = px[c] + 0.5f;
          dstu[off + c] = (uint8_t)(v < 0.f ? 0.f : (v > 255.f ? 255.f : v));
        }
      } else {
        for (int c = 0; c < 3; ++c)
          dstf[off + c] = (px[c] / 255.0f - t->mean[c]) / t->stdv[c];
      }
    }
  }
  t->status[i] = 0;
}

static void* worker(void* arg) {
  DecodeTask* t = (DecodeTask*)arg;
  for (;;) {
    pthread_mutex_lock(&t->mu);
    int i = t->next++;
    pthread_mutex_unlock(&t->mu);
    if (i >= t->n) return nullptr;
    process_one(t, i);
  }
}

static int run_decode(DecodeTask* t, int num_threads) {
  t->next = 0;
  pthread_mutex_init(&t->mu, nullptr);
  int nt = std::max(1, std::min(num_threads, t->n));
  std::vector<pthread_t> threads((size_t)nt);
  for (int i = 0; i < nt; ++i) pthread_create(&threads[i], nullptr, worker, t);
  for (int i = 0; i < nt; ++i) pthread_join(threads[i], nullptr);
  pthread_mutex_destroy(&t->mu);
  int ok = 0;
  for (int i = 0; i < t->n; ++i) ok += (t->status[i] == 0);
  return ok;
}

// Decode a batch of JPEGs into out [n, size, size, 3] float32 NHWC with
// normalization; returns count of successfully decoded images.
int bvt_decode_batch(const uint8_t* const* datas, const uint64_t* lens, int n,
                     float* out, int size, int square_resize,
                     const float* mean, const float* stdv, int* status,
                     int num_threads) {
  DecodeTask t;
  t.datas = datas;
  t.lens = lens;
  t.out = out;
  t.out_u8 = nullptr;
  t.n = n;
  t.size = size;
  t.square_resize = square_resize;
  t.mean = mean;
  t.stdv = stdv;
  t.status = status;
  return run_decode(&t, num_threads);
}

// uint8 variant: decode + resize + crop only (no normalize); the model
// normalizes in-graph. Same status semantics.
int bvt_decode_batch_u8(const uint8_t* const* datas, const uint64_t* lens,
                        int n, uint8_t* out, int size, int square_resize,
                        int* status, int num_threads) {
  DecodeTask t;
  t.datas = datas;
  t.lens = lens;
  t.out = nullptr;
  t.out_u8 = out;
  t.n = n;
  t.size = size;
  t.square_resize = square_resize;
  t.mean = nullptr;
  t.stdv = nullptr;
  t.status = status;
  return run_decode(&t, num_threads);
}

}  // extern "C"
