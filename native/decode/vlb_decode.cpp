// vlb_decode — native video decode for the VLB extraction pipeline.
//
// Replaces decord (the reference's C++ decode dependency,
// videollama2_vlb_extractfeatures.py:308,338) with a libavformat/libavcodec/
// libswscale reader exposed over a C ABI for ctypes.
//
// Design: the extraction access pattern is strictly sequential TR windows
// with overlap, so the reader decodes forward-only and the Python wrapper
// keeps a small ring cache of recent frames; random backward access reopens
// (rare: only at episode start). Frame indexing is by decode order, matching
// decord's frame numbering.
//
// Also provides a tiny test-video encoder (vlb_write_test_video) so unit
// tests can round-trip without an ffmpeg binary.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>
#include <new>

namespace {

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int stream_index = -1;
  int width = 0;
  int height = 0;
  double fps = 0.0;
  int64_t next_index = 0;  // decode-order index of the next frame
  int sws_w = 0, sws_h = 0;
};

void free_reader(Reader* r) {
  if (!r) return;
  if (r->sws) sws_freeContext(r->sws);
  if (r->frame) av_frame_free(&r->frame);
  if (r->pkt) av_packet_free(&r->pkt);
  if (r->codec) avcodec_free_context(&r->codec);
  if (r->fmt) avformat_close_input(&r->fmt);
  delete r;
}

}  // namespace

extern "C" {

// Returns an opaque handle or nullptr on failure.
void* vlb_open(const char* path) {
  Reader* r = new (std::nothrow) Reader();
  if (!r) return nullptr;
  if (avformat_open_input(&r->fmt, path, nullptr, nullptr) < 0) {
    free_reader(r);
    return nullptr;
  }
  if (avformat_find_stream_info(r->fmt, nullptr) < 0) {
    free_reader(r);
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  r->stream_index =
      av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (r->stream_index < 0 || !dec) {
    free_reader(r);
    return nullptr;
  }
  AVStream* st = r->fmt->streams[r->stream_index];
  r->codec = avcodec_alloc_context3(dec);
  if (!r->codec ||
      avcodec_parameters_to_context(r->codec, st->codecpar) < 0 ||
      avcodec_open2(r->codec, dec, nullptr) < 0) {
    free_reader(r);
    return nullptr;
  }
  r->width = r->codec->width;
  r->height = r->codec->height;
  AVRational fr = st->avg_frame_rate;
  if (fr.num == 0) fr = st->r_frame_rate;
  r->fps = fr.den ? static_cast<double>(fr.num) / fr.den : 0.0;
  r->frame = av_frame_alloc();
  r->pkt = av_packet_alloc();
  if (!r->frame || !r->pkt) {
    free_reader(r);
    return nullptr;
  }
  return r;
}

void vlb_close(void* handle) { free_reader(static_cast<Reader*>(handle)); }

double vlb_fps(void* handle) { return static_cast<Reader*>(handle)->fps; }
int vlb_width(void* handle) { return static_cast<Reader*>(handle)->width; }
int vlb_height(void* handle) { return static_cast<Reader*>(handle)->height; }

// Estimated frame count from container metadata (may be 0 if unknown).
long vlb_num_frames_estimate(void* handle) {
  Reader* r = static_cast<Reader*>(handle);
  AVStream* st = r->fmt->streams[r->stream_index];
  if (st->nb_frames > 0) return static_cast<long>(st->nb_frames);
  if (st->duration > 0 && r->fps > 0) {
    double secs = st->duration * av_q2d(st->time_base);
    return static_cast<long>(secs * r->fps + 0.5);
  }
  if (r->fmt->duration > 0 && r->fps > 0) {
    double secs = static_cast<double>(r->fmt->duration) / AV_TIME_BASE;
    return static_cast<long>(secs * r->fps + 0.5);
  }
  return 0;
}

// Exact frame count via a full packet scan on a separate context (no decode).
long vlb_count_frames(const char* path) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -1;
  }
  int si = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (si < 0) {
    avformat_close_input(&fmt);
    return -1;
  }
  AVPacket* pkt = av_packet_alloc();
  long count = 0;
  while (av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == si) ++count;
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  avformat_close_input(&fmt);
  return count;
}

// Decode the next frame in stream order into out_rgb (H*W*3, RGB24).
// Returns the frame's decode-order index, or -1 at EOF / on error.
long vlb_read_next(void* handle, uint8_t* out_rgb) {
  Reader* r = static_cast<Reader*>(handle);
  while (true) {
    int ret = avcodec_receive_frame(r->codec, r->frame);
    if (ret == 0) break;
    if (ret == AVERROR_EOF) return -1;
    if (ret != AVERROR(EAGAIN)) return -1;
    // Need more input.
    ret = av_read_frame(r->fmt, r->pkt);
    if (ret < 0) {
      // Flush.
      avcodec_send_packet(r->codec, nullptr);
      ret = avcodec_receive_frame(r->codec, r->frame);
      if (ret != 0) return -1;
      break;
    }
    if (r->pkt->stream_index != r->stream_index) {
      av_packet_unref(r->pkt);
      continue;
    }
    ret = avcodec_send_packet(r->codec, r->pkt);
    av_packet_unref(r->pkt);
    if (ret < 0 && ret != AVERROR(EAGAIN)) return -1;
  }

  if (!r->sws || r->sws_w != r->frame->width || r->sws_h != r->frame->height) {
    if (r->sws) sws_freeContext(r->sws);
    r->sws = sws_getContext(r->frame->width, r->frame->height,
                            static_cast<AVPixelFormat>(r->frame->format),
                            r->frame->width, r->frame->height, AV_PIX_FMT_RGB24,
                            SWS_BILINEAR, nullptr, nullptr, nullptr);
    r->sws_w = r->frame->width;
    r->sws_h = r->frame->height;
    r->width = r->frame->width;
    r->height = r->frame->height;
  }
  uint8_t* dst[1] = {out_rgb};
  int dst_stride[1] = {3 * r->frame->width};
  sws_scale(r->sws, r->frame->data, r->frame->linesize, 0, r->frame->height,
            dst, dst_stride);
  av_frame_unref(r->frame);
  return r->next_index++;
}

// ---------------------------------------------------------------------------
// Test-video writer: n solid frames; frame i has RGB = (i % 251, 7, 11).
// Encoded with mpeg4 in an .mkv/.avi container. Returns 0 on success.
// ---------------------------------------------------------------------------
int vlb_write_test_video(const char* path, int w, int h, int n, double fps) {
  const AVCodec* enc = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!enc) return -1;
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0 || !fmt)
    return -2;
  AVStream* st = avformat_new_stream(fmt, nullptr);
  AVCodecContext* cc = avcodec_alloc_context3(enc);
  cc->width = w;
  cc->height = h;
  cc->pix_fmt = AV_PIX_FMT_YUV420P;
  cc->time_base = av_d2q(1.0 / fps, 100000);
  cc->gop_size = 12;
  cc->bit_rate = 800000;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    cc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(cc, enc, nullptr) < 0) return -3;
  avcodec_parameters_from_context(st->codecpar, cc);
  st->time_base = cc->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE))
    if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) return -4;
  if (avformat_write_header(fmt, nullptr) < 0) return -5;

  AVFrame* rgb = av_frame_alloc();
  rgb->format = AV_PIX_FMT_RGB24;
  rgb->width = w;
  rgb->height = h;
  av_frame_get_buffer(rgb, 0);
  AVFrame* yuv = av_frame_alloc();
  yuv->format = AV_PIX_FMT_YUV420P;
  yuv->width = w;
  yuv->height = h;
  av_frame_get_buffer(yuv, 0);
  SwsContext* sws =
      sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);
  AVPacket* pkt = av_packet_alloc();

  int rc = 0;
  for (int i = 0; i < n && rc == 0; ++i) {
    av_frame_make_writable(rgb);
    for (int y = 0; y < h; ++y) {
      uint8_t* row = rgb->data[0] + y * rgb->linesize[0];
      for (int x = 0; x < w; ++x) {
        row[3 * x + 0] = static_cast<uint8_t>(i % 251);
        row[3 * x + 1] = 7;
        row[3 * x + 2] = 11;
      }
    }
    sws_scale(sws, rgb->data, rgb->linesize, 0, h, yuv->data, yuv->linesize);
    yuv->pts = i;
    if (avcodec_send_frame(cc, yuv) < 0) rc = -6;
    while (rc == 0) {
      int ret = avcodec_receive_packet(cc, pkt);
      if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) break;
      if (ret < 0) {
        rc = -7;
        break;
      }
      av_packet_rescale_ts(pkt, cc->time_base, st->time_base);
      pkt->stream_index = st->index;
      if (av_interleaved_write_frame(fmt, pkt) < 0) rc = -8;
    }
  }
  // Flush encoder.
  avcodec_send_frame(cc, nullptr);
  while (rc == 0) {
    int ret = avcodec_receive_packet(cc, pkt);
    if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) break;
    if (ret < 0) {
      rc = -9;
      break;
    }
    av_packet_rescale_ts(pkt, cc->time_base, st->time_base);
    pkt->stream_index = st->index;
    av_interleaved_write_frame(fmt, pkt);
  }
  av_write_trailer(fmt);

  av_packet_free(&pkt);
  sws_freeContext(sws);
  av_frame_free(&rgb);
  av_frame_free(&yuv);
  avcodec_free_context(&cc);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return rc;
}

}  // extern "C"
