// Standalone profiling harness for the host entropy decoder.
//
// Reads a span blob dumped by tools/entbench-style Python code:
//   <u32 meta_len> <u32 data_len> <u32 n_samples>
//   <meta bytes> <data bytes> <u64 offsets[n]> <u64 sizes[n]>
// and loops hw_h264_decode_gop over it.  Build with -pg for gprof:
//   g++ -O3 -march=native -pg -o /tmp/prof native/tools/prof_main.cpp \
//       native/src/h264/h264_pack.cpp -Inative/src
//   /tmp/prof /tmp/span1080.bin 20 && gprof /tmp/prof gmon.out
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "../src/h264/h264_types.h"

extern "C" {
void* hw_h264_open(const uint8_t*, int, char*, int);
void hw_h264_close(void*);
const char* hw_h264_error(void*);
int hw_h264_dims(void*, int*, int*, int*);
int hw_h264_decode_gop(void*, const uint8_t*, const uint64_t*,
                       const uint64_t*, int, hwh264::GopOut*);
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s span.bin [iters]\n", argv[0]);
    return 2;
  }
  int iters = argc > 2 ? atoi(argv[2]) : 10;
  FILE* f = fopen(argv[1], "rb");
  if (!f) { perror("open"); return 2; }
  uint32_t meta_len, data_len, n;
  if (fread(&meta_len, 4, 1, f) != 1 || fread(&data_len, 4, 1, f) != 1 ||
      fread(&n, 4, 1, f) != 1) { fprintf(stderr, "hdr\n"); return 2; }
  std::vector<uint8_t> meta(meta_len), data(data_len);
  std::vector<uint64_t> offs(n), sizes(n);
  if (fread(meta.data(), 1, meta_len, f) != meta_len ||
      fread(data.data(), 1, data_len, f) != data_len ||
      fread(offs.data(), 8, n, f) != n ||
      fread(sizes.data(), 8, n, f) != n) { fprintf(stderr, "body\n"); return 2; }
  fclose(f);

  char err[512];
  void* h = hw_h264_open(meta.data(), (int)meta_len, err, sizeof(err));
  if (!h) { fprintf(stderr, "open: %s\n", err); return 1; }
  int mbw, mbh, crop[4];
  hw_h264_dims(h, &mbw, &mbh, crop);
  size_t F = n, M = (size_t)mbw * mbh;
  printf("F=%zu M=%zu (%dx%d mbs)\n", F, M, mbw, mbh);

  // caller-allocated SoA buffers (mirrors entropy.py decode_gop)
  std::vector<uint8_t> frame_type(F), mb_kind(F * M), cbp(F * M),
      nnz(F * M * 24), deblock_idc(F * M), ipcm(F * M * 384), avail(F * M),
      transform8(F * M), frame_is_ref(F), weight_flag(F);
  std::vector<int32_t> poc(F), ref_map(F * 16, -1), ref_map_l1(F * 16, -1);
  std::vector<int8_t> qp(F * M), i4_modes(F * M * 16), i16_mode(F * M),
      chroma_mode(F * M), refidx(F * M * 4, -1), refidx_l1(F * M * 4, -1),
      alpha_off(F * M), beta_off(F * M);
  std::vector<int16_t> mv(F * M * 32), mv_l1(F * M * 32), luma_dc(F * M * 16),
      luma_ac(F * M * 256), chroma_dc(F * M * 8), chroma_ac(F * M * 128),
      pred_weights(F * 16 * 8), pred_weights_l1(F * 16 * 8), ring_slot(F, -1);
  std::vector<int64_t> sparse_counts(4);

  hwh264::GopOut out;
  out.frame_type = frame_type.data(); out.poc = poc.data();
  out.ref_map = ref_map.data(); out.ref_map_l1 = ref_map_l1.data();
  out.mb_kind = mb_kind.data(); out.qp = qp.data(); out.cbp = cbp.data();
  out.i4_modes = i4_modes.data(); out.i16_mode = i16_mode.data();
  out.chroma_mode = chroma_mode.data(); out.mv = mv.data();
  out.mv_l1 = mv_l1.data(); out.refidx = refidx.data();
  out.refidx_l1 = refidx_l1.data(); out.luma_dc = luma_dc.data();
  out.luma_ac = luma_ac.data(); out.chroma_dc = chroma_dc.data();
  out.chroma_ac = chroma_ac.data(); out.nnz = nnz.data();
  out.deblock_idc = deblock_idc.data(); out.alpha_off = alpha_off.data();
  out.beta_off = beta_off.data(); out.ipcm = ipcm.data();
  out.intra_pred_avail = avail.data(); out.transform8 = transform8.data();
  out.frame_is_ref = frame_is_ref.data();
  out.pred_weights = pred_weights.data();
  out.pred_weights_l1 = pred_weights_l1.data();
  out.weight_flag = weight_flag.data(); out.ring_slot = ring_slot.data();
  out.sparse_counts = sparse_counts.data();

  for (int i = 0; i < iters; i++) {
    int r = hw_h264_decode_gop(h, data.data(), offs.data(), sizes.data(),
                               (int)F, &out);
    if (r < 0) { fprintf(stderr, "decode: %s\n", hw_h264_error(h)); return 1; }
  }
  printf("ok %d iters\n", iters);
  hw_h264_close(h);
  return 0;
}
