// Standalone host entropy-decoder profiling driver (gprof).
//
// Consumes a span blob (avcc + per-span AVCC sample data; see the
// extractor in tools/entprof_extract.py), runs hw_h264_decode_gop in a
// loop, and exits — so `gprof` attributes the CABAC/CAVLC hot spots.
//
// Build (from repo root):
//   g++ -O2 -pg -march=native -std=gnu++17 -Inative/src -o /tmp/entprof \
//       native/tools/entprof.cpp native/src/h264/h264_decode.cpp
//   cd /tmp && ./entprof /tmp/ent1080.bin 4 && gprof /tmp/entprof gmon.out
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "h264/h264_types.h"

extern "C" {
void* hw_h264_open(const uint8_t* avcc, int len, char* err, int cap);
void hw_h264_close(void* h);
const char* hw_h264_error(void* h);
int hw_h264_dims(void* h, int* mbw, int* mbh, int* crop);
int hw_h264_decode_gop(void* h, const uint8_t* data, const uint64_t* offsets,
                       const uint64_t* sizes, int n, hwh264::GopOut* out);
}

static uint32_t rd32(FILE* f) {
  uint32_t v = 0;
  if (fread(&v, 4, 1, f) != 1) exit(2);
  return v;
}

template <typename T>
static T* arena(std::vector<std::vector<uint8_t>>& bufs, size_t n) {
  bufs.emplace_back(n * sizeof(T));
  return reinterpret_cast<T*>(bufs.back().data());
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s spans.bin [iters]\n", argv[0]);
    return 1;
  }
  int iters = argc > 2 ? atoi(argv[2]) : 4;
  FILE* f = fopen(argv[1], "rb");
  if (!f) return 2;
  uint32_t avlen = rd32(f);
  std::vector<uint8_t> avcc(avlen);
  if (fread(avcc.data(), 1, avlen, f) != avlen) return 2;
  uint32_t nspan = rd32(f);
  struct Span {
    std::vector<uint8_t> data;
    std::vector<uint64_t> offs, sizes;
  };
  std::vector<Span> spans(nspan);
  for (auto& s : spans) {
    uint32_t nb = rd32(f), nf = rd32(f);
    s.data.resize(nb);
    if (fread(s.data.data(), 1, nb, f) != nb) return 2;
    s.sizes.resize(nf);
    if (fread(s.sizes.data(), 8, nf, f) != nf) return 2;
    s.offs.resize(nf);
    uint64_t o = 0;
    for (uint32_t i = 0; i < nf; i++) {
      s.offs[i] = o;
      o += s.sizes[i];
    }
  }
  fclose(f);

  char err[512];
  void* h = hw_h264_open(avcc.data(), (int)avlen, err, sizeof(err));
  if (!h) {
    fprintf(stderr, "open: %s\n", err);
    return 3;
  }
  int mbw = 0, mbh = 0, crop[4];
  hw_h264_dims(h, &mbw, &mbh, crop);
  size_t M = (size_t)mbw * mbh;
  size_t F = 0;
  for (auto& s : spans) F = s.sizes.size() > F ? s.sizes.size() : F;
  size_t FM = F * M;

  std::vector<std::vector<uint8_t>> bufs;
  hwh264::GopOut out;
  out.frame_type = arena<uint8_t>(bufs, F);
  out.poc = arena<int32_t>(bufs, F);
  out.ref_map = arena<int32_t>(bufs, F * 16);
  out.ref_map_l1 = arena<int32_t>(bufs, F * 16);
  out.mb_kind = arena<uint8_t>(bufs, FM);
  out.qp = arena<int8_t>(bufs, FM);
  out.cbp = arena<uint8_t>(bufs, FM);
  out.i4_modes = arena<int8_t>(bufs, FM * 16);
  out.i16_mode = arena<int8_t>(bufs, FM);
  out.chroma_mode = arena<int8_t>(bufs, FM);
  out.mv = arena<int16_t>(bufs, FM * 32);
  out.mv_l1 = arena<int16_t>(bufs, FM * 32);
  out.refidx = arena<int8_t>(bufs, FM * 4);
  out.refidx_l1 = arena<int8_t>(bufs, FM * 4);
  out.luma_dc = arena<int16_t>(bufs, FM * 16);
  out.luma_ac = arena<int16_t>(bufs, FM * 256);
  out.chroma_dc = arena<int16_t>(bufs, FM * 8);
  out.chroma_ac = arena<int16_t>(bufs, FM * 128);
  out.nnz = arena<uint8_t>(bufs, FM * 24);
  out.deblock_idc = arena<uint8_t>(bufs, FM);
  out.alpha_off = arena<int8_t>(bufs, FM);
  out.beta_off = arena<int8_t>(bufs, FM);
  out.ipcm = nullptr;  // profiling streams carry no I_PCM
  out.intra_pred_avail = arena<uint8_t>(bufs, FM);
  out.transform8 = arena<uint8_t>(bufs, FM);
  out.frame_is_ref = arena<uint8_t>(bufs, F);
  out.pred_weights = arena<int16_t>(bufs, F * 128);
  out.weight_flag = arena<uint8_t>(bufs, F);
  out.pred_weights_l1 = arena<int16_t>(bufs, F * 128);
  out.ring_slot = arena<int16_t>(bufs, F);
  out.sparse_counts = arena<int64_t>(bufs, 4);

  long frames = 0;
  for (int it = 0; it < iters; it++) {
    for (auto& s : spans) {
      int n = hw_h264_decode_gop(h, s.data.data(), s.offs.data(),
                                 s.sizes.data(), (int)s.sizes.size(), &out);
      if (n < 0) {
        fprintf(stderr, "decode: %s\n", hw_h264_error(h));
        return 4;
      }
      frames += n;
    }
  }
  printf("decoded %ld frames\n", frames);
  hw_h264_close(h);
  return 0;
}
