// videodec — native video decode core for the lavila_tpu input pipeline.
//
// Replaces the reference's decord dependency (reference:
// lavila/data/datasets.py:15-102) with a first-party FFmpeg-backed C++
// library exposing a C ABI for ctypes:
//   * random frame access by index (seek + decode-forward, pts-based
//     indexing, presentation order)
//   * fps / frame-count probing
//   * fused scale + RGB24 conversion on the host (swscale), so Python
//     receives ready (N, H, W, 3) uint8 buffers
//   * a deterministic test-clip encoder used by the test-suite fixtures
//     (no ffmpeg CLI in the image).
//
// Build: g++ -O3 -fPIC -shared videodec.cpp -o libvideodec.so \
//        -lavformat -lavcodec -lswscale -lavutil

extern "C" {
#include <libavformat/avformat.h>
#include <libavcodec/avcodec.h>
#include <libswscale/swscale.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int stream_idx = -1;
  double fps = 0.0;
  int64_t n_frames = 0;
  int width = 0, height = 0;
  int sws_w = 0, sws_h = 0;
  // aligned scale target: sws_scale may write past unaligned/narrow rows,
  // so it always goes through this padded buffer, then rows are memcpy'd
  // into the caller's packed array
  uint8_t* scale_buf = nullptr;
  int scale_stride = 0;
  int64_t pos = -1;  // index of the next frame the decoder will emit
  std::string error;
};

int64_t pts_to_index(const Reader* r, int64_t pts) {
  AVStream* st = r->fmt->streams[r->stream_idx];
  double sec = pts * av_q2d(st->time_base);
  return (int64_t)llround(sec * r->fps);
}

int64_t index_to_ts(const Reader* r, int64_t index) {
  AVStream* st = r->fmt->streams[r->stream_idx];
  double sec = index / r->fps;
  return (int64_t)llround(sec / av_q2d(st->time_base));
}

// decode the next frame in presentation order; returns 0 on success,
// AVERROR_EOF at end, <0 on failure
int next_frame(Reader* r) {
  while (true) {
    int ret = avcodec_receive_frame(r->dec, r->frame);
    if (ret == 0) {
      int64_t ts = r->frame->best_effort_timestamp;
      if (ts != AV_NOPTS_VALUE) r->pos = pts_to_index(r, ts) + 1;
      else if (r->pos >= 0) r->pos += 1;
      return 0;
    }
    if (ret != AVERROR(EAGAIN) && ret != AVERROR_EOF) return ret;
    if (ret == AVERROR_EOF) return AVERROR_EOF;
    // feed more packets
    while (true) {
      ret = av_read_frame(r->fmt, r->pkt);
      if (ret < 0) {
        avcodec_send_packet(r->dec, nullptr);  // flush
        break;
      }
      if (r->pkt->stream_index == r->stream_idx) {
        ret = avcodec_send_packet(r->dec, r->pkt);
        av_packet_unref(r->pkt);
        if (ret < 0 && ret != AVERROR(EAGAIN)) return ret;
        break;
      }
      av_packet_unref(r->pkt);
    }
  }
}

int seek_to(Reader* r, int64_t index) {
  int64_t ts = index_to_ts(r, index);
  int ret = av_seek_frame(r->fmt, r->stream_idx, ts, AVSEEK_FLAG_BACKWARD);
  if (ret < 0) return ret;
  avcodec_flush_buffers(r->dec);
  r->pos = -1;
  return 0;
}

}  // namespace

extern "C" {

void* vdec_open(const char* path) {
  av_log_set_level(AV_LOG_ERROR);
  Reader* r = new Reader();
  if (avformat_open_input(&r->fmt, path, nullptr, nullptr) < 0) {
    delete r;
    return nullptr;
  }
  if (avformat_find_stream_info(r->fmt, nullptr) < 0) {
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  const AVCodec* codec = nullptr;
  r->stream_idx = av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                      &codec, 0);
  if (r->stream_idx < 0 || !codec) {
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  AVStream* st = r->fmt->streams[r->stream_idx];
  r->dec = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(r->dec, st->codecpar);
  r->dec->thread_count = 0;  // auto
  if (avcodec_open2(r->dec, codec, nullptr) < 0) {
    avcodec_free_context(&r->dec);
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  AVRational fr = av_guess_frame_rate(r->fmt, st, nullptr);
  r->fps = (fr.num > 0 && fr.den > 0) ? av_q2d(fr) : 30.0;
  r->width = r->dec->width;
  r->height = r->dec->height;
  if (st->nb_frames > 0) {
    r->n_frames = st->nb_frames;
  } else if (st->duration > 0) {
    r->n_frames =
        (int64_t)llround(st->duration * av_q2d(st->time_base) * r->fps);
  } else if (r->fmt->duration > 0) {
    r->n_frames =
        (int64_t)llround((double)r->fmt->duration / AV_TIME_BASE * r->fps);
  }
  r->frame = av_frame_alloc();
  r->pkt = av_packet_alloc();
  return r;
}

double vdec_fps(void* h) { return ((Reader*)h)->fps; }
long long vdec_num_frames(void* h) { return ((Reader*)h)->n_frames; }
int vdec_width(void* h) { return ((Reader*)h)->width; }
int vdec_height(void* h) { return ((Reader*)h)->height; }

// Decode the frames at `indices` (any order) into out (n, out_h, out_w, 3)
// RGB24. out_w/out_h of 0 → native size. Returns 0 on success; k>0 means
// k frames could not be decoded (their slots hold the nearest decoded
// frame or zeros).
int vdec_read_frames(void* h, const long long* indices, int n,
                     unsigned char* out, int out_w, int out_h) {
  Reader* r = (Reader*)h;
  if (out_w <= 0) out_w = r->width;
  if (out_h <= 0) out_h = r->height;
  const size_t frame_bytes = (size_t)out_w * out_h * 3;

  // process in sorted order, remembering the output slot
  std::vector<int> order(n);
  for (int i = 0; i < n; i++) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int a, int b) {
    return indices[a] < indices[b];
  });

  if (r->sws == nullptr || r->sws_w != out_w || r->sws_h != out_h) {
    if (r->sws) sws_freeContext(r->sws);
    r->sws = sws_getContext(r->width, r->height, r->dec->pix_fmt, out_w,
                            out_h, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                            nullptr, nullptr);
    r->sws_w = out_w;
    r->sws_h = out_h;
    if (r->scale_buf) av_free(r->scale_buf);
    r->scale_stride = (out_w * 3 + 63) & ~63;  // 64-byte aligned rows
    r->scale_buf = (uint8_t*)av_malloc((size_t)r->scale_stride * out_h + 64);
  }

  int failures = 0;
  int64_t last_done = -1;
  uint8_t* last_ptr = nullptr;
  for (int oi = 0; oi < n; oi++) {
    int slot = order[oi];
    int64_t want = indices[slot];
    uint8_t* dst = out + (size_t)slot * frame_bytes;
    if (want == last_done && last_ptr) {  // duplicate index
      memcpy(dst, last_ptr, frame_bytes);
      continue;
    }
    // seek when behind or far ahead
    if (r->pos < 0 || want < r->pos || want > r->pos + 64) {
      if (seek_to(r, want) < 0) {
        memset(dst, 0, frame_bytes);
        failures++;
        continue;
      }
    }
    int ret = 0;
    int guard = 0;
    // decode forward until the wanted index
    while (true) {
      ret = next_frame(r);
      if (ret < 0) break;
      if (r->pos - 1 >= want) break;
      if (++guard > 4096) { ret = -1; break; }
    }
    if (ret < 0) {
      // EOF or error: reuse the last decoded frame if any, else zeros
      if (last_ptr) memcpy(dst, last_ptr, frame_bytes);
      else memset(dst, 0, frame_bytes);
      failures++;
      continue;
    }
    uint8_t* planes[1] = {r->scale_buf};
    int strides[1] = {r->scale_stride};
    sws_scale(r->sws, r->frame->data, r->frame->linesize, 0, r->height,
              planes, strides);
    for (int row = 0; row < out_h; row++)
      memcpy(dst + (size_t)row * out_w * 3,
             r->scale_buf + (size_t)row * r->scale_stride, out_w * 3);
    last_done = want;
    last_ptr = dst;
  }
  return failures;
}

void vdec_close(void* h) {
  Reader* r = (Reader*)h;
  if (!r) return;
  if (r->scale_buf) av_free(r->scale_buf);
  if (r->sws) sws_freeContext(r->sws);
  if (r->frame) av_frame_free(&r->frame);
  if (r->pkt) av_packet_free(&r->pkt);
  if (r->dec) avcodec_free_context(&r->dec);
  if (r->fmt) avformat_close_input(&r->fmt);
  delete r;
}

// ---------------------------------------------------------------------
// Deterministic test-clip encoder (mpeg4 in mp4). Frame k is a flat
// gray image with intensity (16 + 3k) % 240 plus an 8x8 white square
// marker moving one pixel per frame — enough to verify frame-accurate
// indexing end-to-end.
int vdec_encode_test(const char* path, int w, int h, int fps, int n) {
  av_log_set_level(AV_LOG_ERROR);
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
  if (!fmt) return -1;
  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!codec) return -2;
  AVStream* st = avformat_new_stream(fmt, nullptr);
  AVCodecContext* enc = avcodec_alloc_context3(codec);
  enc->width = w;
  enc->height = h;
  enc->pix_fmt = AV_PIX_FMT_YUV420P;
  enc->time_base = {1, fps};
  enc->framerate = {fps, 1};
  enc->gop_size = 12;
  enc->bit_rate = 2000000;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(enc, codec, nullptr) < 0) return -3;
  avcodec_parameters_from_context(st->codecpar, enc);
  st->time_base = enc->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE))
    if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) return -4;
  if (avformat_write_header(fmt, nullptr) < 0) return -5;

  AVFrame* fr = av_frame_alloc();
  fr->format = enc->pix_fmt;
  fr->width = w;
  fr->height = h;
  av_frame_get_buffer(fr, 0);
  AVPacket* pkt = av_packet_alloc();

  auto flush = [&](AVFrame* f) {
    if (avcodec_send_frame(enc, f) < 0) return;
    while (avcodec_receive_packet(enc, pkt) == 0) {
      av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  for (int k = 0; k < n; k++) {
    av_frame_make_writable(fr);
    int y_val = (16 + 3 * k) % 240;
    memset(fr->data[0], y_val, (size_t)fr->linesize[0] * h);
    memset(fr->data[1], 128, (size_t)fr->linesize[1] * (h / 2));
    memset(fr->data[2], 128, (size_t)fr->linesize[2] * (h / 2));
    // moving 8x8 bright marker
    int mx = (k * 1) % (w - 8), my = (k * 1) % (h - 8);
    for (int yy = my; yy < my + 8; yy++)
      memset(fr->data[0] + (size_t)yy * fr->linesize[0] + mx, 235, 8);
    fr->pts = k;
    flush(fr);
  }
  flush(nullptr);  // drain
  av_write_trailer(fmt);
  av_frame_free(&fr);
  av_packet_free(&pkt);
  avcodec_free_context(&enc);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

}  // extern "C"
