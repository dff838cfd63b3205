// C-ABI shim over the system libavcodec/libavformat/libswscale.
//
// Three facilities, all consumed from Python via ctypes (hwang_tpu/native.py):
//
//  1. Encoder (hw_enc_*): synthesize real H.264/HEVC MP4 fixtures with
//     controlled GOP structure (libx264/libx265 + mp4 mux, optionally
//     fragmented).  Used by tests and benchmarks; the reference instead
//     downloaded fixture videos over the network (hwang/tests/videos.h:26-43),
//     which made its tests fail offline.
//
//  2. Stateful packet decoder (hw_dec_*): the software decode backend.
//     Behavioral analog of the reference's FFmpeg backend
//     (hwang/impls/software/software_video_decoder.cpp): configure with
//     avcC/hvcC extradata, feed MP4-framed (AVCC) samples, pull decoded
//     frames as RGB24 (swscale, like the reference) or planar YUV420.
//     Unlike the reference we feed AVCC packets directly instead of running
//     an annex-b bitstream filter — libavcodec handles AVCC natively when
//     the extradata is an avcC record (the annex-b conversion in the
//     reference existed for NVDEC's benefit).
//
//  3. Whole-file oracle (hw_oracle_*): independent demux (libavformat) +
//     decode path used as ground truth in tests, so correctness checks do
//     not depend on our own MP4 parser.
//
// All functions return 0 on success / negative on failure; use
// hw_*_error() for the message.  No exits, no aborts in library code.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cstdarg>
#include <cstdio>
#include <cstring>
#include <deque>
#include <string>

#define HW_API extern "C" __attribute__((visibility("default")))

namespace {

void set_err(char *err, size_t cap, const char *fmt, ...) {
  if (!err || cap == 0) return;
  va_list ap;
  va_start(ap, fmt);
  vsnprintf(err, cap, fmt, ap);
  va_end(ap);
}

std::string av_errstr(int code) {
  char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
  av_strerror(code, buf, sizeof(buf));
  return buf;
}

struct QuietLogs {
  QuietLogs() { av_log_set_level(AV_LOG_ERROR); }
} quiet_logs_once;

}  // namespace

// ===========================================================================
// Encoder
// ===========================================================================

struct HwEncoder {
  AVFormatContext *fmt = nullptr;
  AVCodecContext *codec = nullptr;
  AVStream *stream = nullptr;
  SwsContext *sws = nullptr;
  AVFrame *yuv = nullptr;
  AVPacket *pkt = nullptr;
  uint8_t *rgb_staging = nullptr;  // padded copy: swscale SIMD overreads
  uint8_t *sws_dst = nullptr;      // padded planes: swscale overWRITES too
  int width = 0, height = 0;
  int64_t next_pts = 0;
  char err[512] = {0};
};

static int enc_write_packets(HwEncoder *e, bool flush) {
  int ret;
  if (flush) {
    ret = avcodec_send_frame(e->codec, nullptr);
  } else {
    ret = avcodec_send_frame(e->codec, e->yuv);
  }
  if (ret < 0) {
    set_err(e->err, sizeof(e->err), "send_frame: %s", av_errstr(ret).c_str());
    return -1;
  }
  while (true) {
    ret = avcodec_receive_packet(e->codec, e->pkt);
    if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) break;
    if (ret < 0) {
      set_err(e->err, sizeof(e->err), "receive_packet: %s",
              av_errstr(ret).c_str());
      return -1;
    }
    av_packet_rescale_ts(e->pkt, e->codec->time_base, e->stream->time_base);
    e->pkt->stream_index = e->stream->index;
    ret = av_interleaved_write_frame(e->fmt, e->pkt);
    if (ret < 0) {
      set_err(e->err, sizeof(e->err), "write_frame: %s",
              av_errstr(ret).c_str());
      return -1;
    }
  }
  return 0;
}

HW_API void *hw_enc_open(const char *path, int width, int height, int fps,
                         const char *codec_name, const char *profile,
                         int gop_size, int max_b_frames, int crf,
                         int bitrate, int fragmented, const char *extra_opts,
                         char *err, int err_cap) {
  auto *e = new HwEncoder();
  e->width = width;
  e->height = height;

  const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec) {
    set_err(err, err_cap, "encoder '%s' not found", codec_name);
    delete e;
    return nullptr;
  }
  int ret = avformat_alloc_output_context2(&e->fmt, nullptr, "mp4", path);
  if (ret < 0 || !e->fmt) {
    set_err(err, err_cap, "alloc_output_context: %s", av_errstr(ret).c_str());
    delete e;
    return nullptr;
  }
  e->stream = avformat_new_stream(e->fmt, nullptr);
  e->codec = avcodec_alloc_context3(codec);
  e->codec->width = width;
  e->codec->height = height;
  e->codec->time_base = AVRational{1, fps};
  e->codec->framerate = AVRational{fps, 1};
  e->codec->pix_fmt = AV_PIX_FMT_YUV420P;
  e->codec->gop_size = gop_size;
  e->codec->max_b_frames = max_b_frames;
  if (e->fmt->oformat->flags & AVFMT_GLOBALHEADER)
    e->codec->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (profile && profile[0])
    av_opt_set(e->codec->priv_data, "profile", profile, 0);
  if (crf >= 0) {
    char buf[16];
    snprintf(buf, sizeof(buf), "%d", crf);
    av_opt_set(e->codec->priv_data, "crf", buf, 0);
  } else if (bitrate > 0) {
    // ABR mode (EncodeOptions.bitrate, reference video_encoder.h:34-38)
    e->codec->bit_rate = bitrate;
  }
  if (extra_opts && extra_opts[0]) {
    // e.g. x264-params keyint=30:min-keyint=30:no-scenecut=1
    if (strcmp(codec_name, "libx264") == 0)
      av_opt_set(e->codec->priv_data, "x264-params", extra_opts, 0);
    else if (strcmp(codec_name, "libx265") == 0)
      av_opt_set(e->codec->priv_data, "x265-params", extra_opts, 0);
  }
  ret = avcodec_open2(e->codec, codec, nullptr);
  if (ret < 0) {
    set_err(err, err_cap, "avcodec_open2: %s", av_errstr(ret).c_str());
    avcodec_free_context(&e->codec);
    avformat_free_context(e->fmt);
    delete e;
    return nullptr;
  }
  avcodec_parameters_from_context(e->stream->codecpar, e->codec);
  e->stream->time_base = e->codec->time_base;

  AVDictionary *movopts = nullptr;
  if (fragmented)
    av_dict_set(&movopts, "movflags", "+frag_keyframe+empty_moov", 0);
  ret = avio_open(&e->fmt->pb, path, AVIO_FLAG_WRITE);
  if (ret >= 0) ret = avformat_write_header(e->fmt, &movopts);
  av_dict_free(&movopts);
  if (ret < 0) {
    set_err(err, err_cap, "write_header: %s", av_errstr(ret).c_str());
    avcodec_free_context(&e->codec);
    avformat_free_context(e->fmt);
    delete e;
    return nullptr;
  }

  e->yuv = av_frame_alloc();
  e->yuv->format = AV_PIX_FMT_YUV420P;
  e->yuv->width = width;
  e->yuv->height = height;
  // align=64: this libswscale's SIMD output loops write past narrow
  // (width < 64) default-aligned chroma rows — observed glibc heap
  // corruption at 48x48 with align=0.
  av_frame_get_buffer(e->yuv, 64);
  e->pkt = av_packet_alloc();
  e->sws = sws_getContext(width, height, AV_PIX_FMT_RGB24, width, height,
                          AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr, nullptr,
                          nullptr);
  return e;
}

HW_API const char *hw_enc_error(void *handle) {
  return static_cast<HwEncoder *>(handle)->err;
}

// Write one RGB24 frame (h*w*3 bytes, row-major).
HW_API int hw_enc_write_rgb(void *handle, const uint8_t *rgb) {
  auto *e = static_cast<HwEncoder *>(handle);
  av_frame_make_writable(e->yuv);
  // swscale's SIMD row loops read past width*3 bytes on the last row of
  // a tightly-packed caller buffer (observed SEGV under ASAN at 48x48);
  // stage through an AV_INPUT_BUFFER_PADDING_SIZE-padded copy.
  size_t nbytes = (size_t)e->height * e->width * 3;
  if (!e->rgb_staging)
    e->rgb_staging =
        (uint8_t *)av_malloc(nbytes + AV_INPUT_BUFFER_PADDING_SIZE);
  memcpy(e->rgb_staging, rgb, nbytes);
  memset(e->rgb_staging + nbytes, 0, AV_INPUT_BUFFER_PADDING_SIZE);
  const uint8_t *src[1] = {e->rgb_staging};
  int src_stride[1] = {3 * e->width};
  // This libswscale also WRITES past the last chroma row at narrow
  // widths (glibc heap corruption at 48x48, bypassing swscale fixes it):
  // give it generously padded private planes, then copy the real rows.
  int ls0 = e->yuv->linesize[0], ls1 = e->yuv->linesize[1];
  int h = e->height, hc = h / 2;
  size_t p0 = (size_t)ls0 * (h + 16);
  size_t p1 = (size_t)ls1 * (hc + 16);
  if (!e->sws_dst) e->sws_dst = (uint8_t *)av_malloc(p0 + 2 * p1 + 64);
  uint8_t *dst[3] = {e->sws_dst, e->sws_dst + p0, e->sws_dst + p0 + p1};
  int dst_stride[3] = {ls0, ls1, ls1};
  sws_scale(e->sws, src, src_stride, 0, e->height, dst, dst_stride);
  memcpy(e->yuv->data[0], dst[0], (size_t)ls0 * h);
  memcpy(e->yuv->data[1], dst[1], (size_t)ls1 * hc);
  memcpy(e->yuv->data[2], dst[2], (size_t)ls1 * hc);
  e->yuv->pts = e->next_pts++;
  e->yuv->pkt_duration = 1;
  return enc_write_packets(e, false);
}

// Write one planar YUV420 frame (Y: h*w, U,V: h/2*w/2), bit-exact input.
HW_API int hw_enc_write_yuv(void *handle, const uint8_t *y, const uint8_t *u,
                            const uint8_t *v) {
  auto *e = static_cast<HwEncoder *>(handle);
  av_frame_make_writable(e->yuv);
  int w = e->width, h = e->height;
  for (int r = 0; r < h; r++)
    memcpy(e->yuv->data[0] + r * e->yuv->linesize[0], y + r * w, w);
  for (int r = 0; r < h / 2; r++) {
    memcpy(e->yuv->data[1] + r * e->yuv->linesize[1], u + r * (w / 2), w / 2);
    memcpy(e->yuv->data[2] + r * e->yuv->linesize[2], v + r * (w / 2), w / 2);
  }
  e->yuv->pts = e->next_pts++;
  e->yuv->pkt_duration = 1;
  return enc_write_packets(e, false);
}

HW_API int hw_enc_close(void *handle) {
  auto *e = static_cast<HwEncoder *>(handle);
  int rc = enc_write_packets(e, true);
  if (rc == 0) {
    int ret = av_write_trailer(e->fmt);
    if (ret < 0) rc = -1;
  }
  if (e->fmt && e->fmt->pb) avio_closep(&e->fmt->pb);
  if (e->sws) sws_freeContext(e->sws);
  av_freep(&e->rgb_staging);
  av_freep(&e->sws_dst);
  av_frame_free(&e->yuv);
  av_packet_free(&e->pkt);
  avcodec_free_context(&e->codec);
  avformat_free_context(e->fmt);
  delete e;
  return rc;
}

// ===========================================================================
// Stateful packet decoder (software backend)
// ===========================================================================

struct HwDecoder {
  AVCodecContext *ctx = nullptr;
  const AVCodec *codec = nullptr;
  AVPacket *pkt = nullptr;
  SwsContext *sws = nullptr;
  std::deque<AVFrame *> queue;   // decoded, not yet consumed
  std::deque<AVFrame *> pool;    // recycled frames
  int width = 0, height = 0;
  int64_t feed_count = 0;
  char err[512] = {0};
};

static AVFrame *dec_frame_alloc(HwDecoder *d) {
  if (!d->pool.empty()) {
    AVFrame *f = d->pool.front();
    d->pool.pop_front();
    return f;
  }
  return av_frame_alloc();
}

static int dec_drain(HwDecoder *d) {
  // Receive every frame currently available from the codec into the queue.
  while (true) {
    AVFrame *f = dec_frame_alloc(d);
    int ret = avcodec_receive_frame(d->ctx, f);
    if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) {
      av_frame_unref(f);
      d->pool.push_back(f);
      return 0;
    }
    if (ret < 0) {
      av_frame_unref(f);
      d->pool.push_back(f);
      set_err(d->err, sizeof(d->err), "receive_frame: %s",
              av_errstr(ret).c_str());
      return -1;
    }
    d->queue.push_back(f);
  }
}

HW_API void *hw_dec_open(const char *codec_name, const uint8_t *extradata,
                         int extradata_len, int n_threads, char *err,
                         int err_cap) {
  auto *d = new HwDecoder();
  d->codec = avcodec_find_decoder_by_name(codec_name);
  if (!d->codec) {
    set_err(err, err_cap, "decoder '%s' not found", codec_name);
    delete d;
    return nullptr;
  }
  d->ctx = avcodec_alloc_context3(d->codec);
  if (extradata && extradata_len > 0) {
    d->ctx->extradata = static_cast<uint8_t *>(
        av_mallocz(extradata_len + AV_INPUT_BUFFER_PADDING_SIZE));
    memcpy(d->ctx->extradata, extradata, extradata_len);
    d->ctx->extradata_size = extradata_len;
  }
  d->ctx->thread_count = n_threads > 0 ? n_threads : 1;
  d->ctx->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
  int ret = avcodec_open2(d->ctx, d->codec, nullptr);
  if (ret < 0) {
    set_err(err, err_cap, "avcodec_open2: %s", av_errstr(ret).c_str());
    avcodec_free_context(&d->ctx);
    delete d;
    return nullptr;
  }
  d->pkt = av_packet_alloc();
  return d;
}

HW_API const char *hw_dec_error(void *handle) {
  return static_cast<HwDecoder *>(handle)->err;
}

// Feed one MP4-framed (AVCC) sample.  size==0 => end-of-stream drain.
// `keyframe` sets AV_PKT_FLAG_KEY (advisory for the decoder).
HW_API int hw_dec_feed(void *handle, const uint8_t *data, int size,
                       int keyframe) {
  auto *d = static_cast<HwDecoder *>(handle);
  int ret;
  if (size == 0 || data == nullptr) {
    ret = avcodec_send_packet(d->ctx, nullptr);
    if (ret < 0 && ret != AVERROR_EOF) {
      set_err(d->err, sizeof(d->err), "send_packet(EOF): %s",
              av_errstr(ret).c_str());
      return -1;
    }
    return dec_drain(d);
  }
  uint8_t *buf = static_cast<uint8_t *>(
      av_malloc(size + AV_INPUT_BUFFER_PADDING_SIZE));
  memcpy(buf, data, size);
  memset(buf + size, 0, AV_INPUT_BUFFER_PADDING_SIZE);
  av_packet_from_data(d->pkt, buf, size);
  d->pkt->pts = d->feed_count;
  d->pkt->dts = d->feed_count;
  d->feed_count++;
  if (keyframe) d->pkt->flags |= AV_PKT_FLAG_KEY;
  ret = avcodec_send_packet(d->ctx, d->pkt);
  av_packet_unref(d->pkt);
  if (ret < 0) {
    set_err(d->err, sizeof(d->err), "send_packet: %s", av_errstr(ret).c_str());
    return -1;
  }
  return dec_drain(d);
}

HW_API int hw_dec_frames_buffered(void *handle) {
  return static_cast<int>(static_cast<HwDecoder *>(handle)->queue.size());
}

HW_API int hw_dec_frame_dims(void *handle, int *w, int *h) {
  auto *d = static_cast<HwDecoder *>(handle);
  if (d->queue.empty()) return -1;
  *w = d->queue.front()->width;
  *h = d->queue.front()->height;
  return 0;
}

// fmt: 0 = RGB24 (swscale conversion, reference parity:
//          software_video_decoder.cpp:292-328); out must hold w*h*3.
//      1 = planar YUV420 (bit-exact decoder output); out must hold
//          w*h + 2*((w+1)/2)*((h+1)/2).
HW_API int hw_dec_get_frame(void *handle, uint8_t *out, int fmt) {
  auto *d = static_cast<HwDecoder *>(handle);
  if (d->queue.empty()) {
    set_err(d->err, sizeof(d->err), "get_frame on empty queue");
    return -1;
  }
  AVFrame *f = d->queue.front();
  d->queue.pop_front();
  int w = f->width, h = f->height;
  int rc = 0;
  if (fmt == 0) {
    d->sws = sws_getCachedContext(d->sws, w, h, (AVPixelFormat)f->format, w, h,
                                  AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                                  nullptr, nullptr);
    uint8_t *dst[1] = {out};
    int dst_stride[1] = {3 * w};
    sws_scale(d->sws, f->data, f->linesize, 0, h, dst, dst_stride);
  } else {
    if (f->format != AV_PIX_FMT_YUV420P && f->format != AV_PIX_FMT_YUVJ420P) {
      set_err(d->err, sizeof(d->err), "unexpected pix_fmt %d", f->format);
      rc = -1;
    } else {
      int cw = (w + 1) / 2, ch = (h + 1) / 2;
      uint8_t *p = out;
      for (int r = 0; r < h; r++, p += w)
        memcpy(p, f->data[0] + r * f->linesize[0], w);
      for (int r = 0; r < ch; r++, p += cw)
        memcpy(p, f->data[1] + r * f->linesize[1], cw);
      for (int r = 0; r < ch; r++, p += cw)
        memcpy(p, f->data[2] + r * f->linesize[2], cw);
    }
  }
  av_frame_unref(f);
  d->pool.push_back(f);
  return rc;
}

HW_API int hw_dec_discard_frame(void *handle) {
  auto *d = static_cast<HwDecoder *>(handle);
  if (d->queue.empty()) return -1;
  AVFrame *f = d->queue.front();
  d->queue.pop_front();
  av_frame_unref(f);
  d->pool.push_back(f);
  return 0;
}

// End the current decode span: drain remaining frames into the queue and
// reset codec state so the next fed packet may start at any keyframe.
// Queued frames survive the flush (parity: software_video_decoder.cpp:250-268).
HW_API int hw_dec_flush(void *handle) {
  auto *d = static_cast<HwDecoder *>(handle);
  int ret = avcodec_send_packet(d->ctx, nullptr);
  if (ret < 0 && ret != AVERROR_EOF) {
    set_err(d->err, sizeof(d->err), "flush send: %s", av_errstr(ret).c_str());
    return -1;
  }
  if (dec_drain(d) != 0) return -1;
  avcodec_flush_buffers(d->ctx);
  return 0;
}

HW_API void hw_dec_close(void *handle) {
  auto *d = static_cast<HwDecoder *>(handle);
  for (AVFrame *f : d->queue) av_frame_free(&f);
  for (AVFrame *f : d->pool) av_frame_free(&f);
  if (d->sws) sws_freeContext(d->sws);
  av_packet_free(&d->pkt);
  avcodec_free_context(&d->ctx);
  delete d;
}

// ===========================================================================
// Whole-file oracle (independent demux + decode)
// ===========================================================================

struct HwOracle {
  AVFormatContext *fmt = nullptr;
  AVCodecContext *ctx = nullptr;
  AVPacket *pkt = nullptr;
  AVFrame *frame = nullptr;
  SwsContext *sws = nullptr;
  int stream_index = -1;
  bool eof_sent = false;
  char err[512] = {0};
};

HW_API void *hw_oracle_open(const char *path, int n_threads, char *err,
                            int err_cap) {
  auto *o = new HwOracle();
  AVDictionary *demux_opts = nullptr;
  av_dict_set(&demux_opts, "ignore_editlist", "1", 0);
  int ret = avformat_open_input(&o->fmt, path, nullptr, &demux_opts);
  av_dict_free(&demux_opts);
  if (ret < 0) {
    set_err(err, err_cap, "open_input: %s", av_errstr(ret).c_str());
    delete o;
    return nullptr;
  }
  avformat_find_stream_info(o->fmt, nullptr);
  const AVCodec *codec = nullptr;
  o->stream_index =
      av_find_best_stream(o->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (o->stream_index < 0 || !codec) {
    set_err(err, err_cap, "no video stream");
    avformat_close_input(&o->fmt);
    delete o;
    return nullptr;
  }
  o->ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(o->ctx,
                                o->fmt->streams[o->stream_index]->codecpar);
  o->ctx->thread_count = n_threads > 0 ? n_threads : 1;
  o->ctx->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
  if (getenv("HWANG_ORACLE_DEBUG")) {
    // per-MB type/QP/MV dump to stderr, for diffing the host entropy
    // decoder's trace (HWANG_H264_TRACE) against libavcodec
    av_log_set_level(AV_LOG_DEBUG);
    o->ctx->debug = atoi(getenv("HWANG_ORACLE_DEBUG"));
    o->ctx->thread_count = 1;
    o->ctx->thread_type = 0;
  }
  ret = avcodec_open2(o->ctx, codec, nullptr);
  if (ret < 0) {
    set_err(err, err_cap, "avcodec_open2: %s", av_errstr(ret).c_str());
    avcodec_free_context(&o->ctx);
    avformat_close_input(&o->fmt);
    delete o;
    return nullptr;
  }
  o->pkt = av_packet_alloc();
  o->frame = av_frame_alloc();
  return o;
}

HW_API const char *hw_oracle_error(void *handle) {
  return static_cast<HwOracle *>(handle)->err;
}

HW_API int hw_oracle_dims(void *handle, int *w, int *h) {
  auto *o = static_cast<HwOracle *>(handle);
  *w = o->ctx->width;
  *h = o->ctx->height;
  return 0;
}

// Decode the next frame into `out`.  fmt as in hw_dec_get_frame.
// Returns 1 on frame, 0 on end of stream, negative on error.
HW_API int hw_oracle_next(void *handle, uint8_t *out, int fmt) {
  auto *o = static_cast<HwOracle *>(handle);
  while (true) {
    int ret = avcodec_receive_frame(o->ctx, o->frame);
    if (ret == 0) break;
    if (ret == AVERROR_EOF) return 0;
    if (ret != AVERROR(EAGAIN)) {
      set_err(o->err, sizeof(o->err), "receive_frame: %s",
              av_errstr(ret).c_str());
      return -1;
    }
    // need more input
    while (true) {
      ret = av_read_frame(o->fmt, o->pkt);
      if (ret == AVERROR_EOF) {
        if (!o->eof_sent) {
          avcodec_send_packet(o->ctx, nullptr);
          o->eof_sent = true;
        }
        break;
      }
      if (ret < 0) {
        set_err(o->err, sizeof(o->err), "read_frame: %s",
                av_errstr(ret).c_str());
        return -1;
      }
      if (o->pkt->stream_index == o->stream_index) {
        o->pkt->flags &= ~AV_PKT_FLAG_DISCARD;
        ret = avcodec_send_packet(o->ctx, o->pkt);
        av_packet_unref(o->pkt);
        if (ret < 0) {
          set_err(o->err, sizeof(o->err), "send_packet: %s",
                  av_errstr(ret).c_str());
          return -1;
        }
        break;
      }
      av_packet_unref(o->pkt);
    }
  }
  AVFrame *f = o->frame;
  int w = f->width, h = f->height;
  if (fmt == 0) {
    o->sws = sws_getCachedContext(o->sws, w, h, (AVPixelFormat)f->format, w, h,
                                  AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                                  nullptr, nullptr);
    uint8_t *dst[1] = {out};
    int dst_stride[1] = {3 * w};
    sws_scale(o->sws, f->data, f->linesize, 0, h, dst, dst_stride);
  } else {
    int cw = (w + 1) / 2, ch = (h + 1) / 2;
    uint8_t *p = out;
    for (int r = 0; r < h; r++, p += w)
      memcpy(p, f->data[0] + r * f->linesize[0], w);
    for (int r = 0; r < ch; r++, p += cw)
      memcpy(p, f->data[1] + r * f->linesize[1], cw);
    for (int r = 0; r < ch; r++, p += cw)
      memcpy(p, f->data[2] + r * f->linesize[2], cw);
  }
  av_frame_unref(f);
  return 1;
}

HW_API void hw_oracle_close(void *handle) {
  auto *o = static_cast<HwOracle *>(handle);
  if (o->sws) sws_freeContext(o->sws);
  av_packet_free(&o->pkt);
  av_frame_free(&o->frame);
  avcodec_free_context(&o->ctx);
  avformat_close_input(&o->fmt);
  delete o;
}
