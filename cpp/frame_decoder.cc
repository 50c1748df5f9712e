// Native video frame decoder on libav — the TPU-host replacement for decord
// (reference mm_utils/video_utils.py:56-96: random-access batch frame decode).
//
// C ABI (ctypes-bound from grounded_video_llm_tpu/video/native/decoder.py):
//   gvd_probe(path, &nframes, &fps, &width, &height)     -> 0 | error
//   gvd_decode_frames(path, indices, n, out_rgb)         -> 0 | error
//     out_rgb: caller-allocated n*height*width*3 uint8, RGB24, frame-major
//
// Decode strategy: indices are processed in ascending order; the demuxer
// seeks to the nearest keyframe before a target only when the target is
// behind the current position or far ahead (> SEEK_AHEAD_FRAMES), otherwise
// it decodes forward — the same batched random-access pattern decord's
// get_batch uses, robust to sparse keyframes.
//
// Thread safety: each call opens its own demux/decode context; concurrent
// calls from the data-loader pool do not share state.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

constexpr int64_t kSeekAheadFrames = 64;

struct Video {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_index = -1;
  AVStream* stream = nullptr;

  ~Video() {
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    const AVCodec* dec = nullptr;
    stream_index =
        av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
    if (stream_index < 0 || !dec) return -3;
    stream = fmt->streams[stream_index];
    codec = avcodec_alloc_context3(dec);
    if (!codec) return -4;
    if (avcodec_parameters_to_context(codec, stream->codecpar) < 0) return -5;
    codec->thread_count = 0;  // auto
    if (avcodec_open2(codec, dec, nullptr) < 0) return -6;
    return 0;
  }

  double fps() const {
    AVRational r = stream->avg_frame_rate;
    if (r.num <= 0 || r.den <= 0) r = stream->r_frame_rate;
    if (r.num <= 0 || r.den <= 0) return 30.0;
    return av_q2d(r);
  }

  int64_t frame_count() const {
    if (stream->nb_frames > 0) return stream->nb_frames;
    // fall back to container duration * fps (decord does the same estimate)
    double dur = 0.0;
    if (stream->duration > 0) {
      dur = stream->duration * av_q2d(stream->time_base);
    } else if (fmt->duration > 0) {
      dur = static_cast<double>(fmt->duration) / AV_TIME_BASE;
    }
    int64_t est = static_cast<int64_t>(dur * fps() + 0.5);
    return est > 0 ? est : 0;
  }

  int64_t frame_to_pts(int64_t frame_idx) const {
    double seconds = frame_idx / fps();
    return static_cast<int64_t>(seconds / av_q2d(stream->time_base) + 0.5) +
           (stream->start_time == AV_NOPTS_VALUE ? 0 : stream->start_time);
  }

  int64_t pts_to_frame(int64_t pts) const {
    int64_t start =
        stream->start_time == AV_NOPTS_VALUE ? 0 : stream->start_time;
    double seconds = (pts - start) * av_q2d(stream->time_base);
    return static_cast<int64_t>(seconds * fps() + 0.5);
  }
};

}  // namespace

extern "C" {

int gvd_probe(const char* path, int64_t* nframes, double* fps, int* width,
              int* height) {
  Video v;
  int rc = v.open(path);
  if (rc != 0) return rc;
  *nframes = v.frame_count();
  *fps = v.fps();
  *width = v.codec->width;
  *height = v.codec->height;
  return *nframes > 0 ? 0 : -7;
}

// Decode the frames at `indices` (any order; internally sorted) into out_rgb,
// written in the ORIGINAL order of `indices`. Returns 0 on success.
int gvd_decode_frames(const char* path, const int64_t* indices, int n,
                      uint8_t* out_rgb) {
  if (n <= 0) return -10;
  Video v;
  int rc = v.open(path);
  if (rc != 0) return rc;

  const int w = v.codec->width;
  const int h = v.codec->height;
  const size_t frame_bytes = static_cast<size_t>(w) * h * 3;

  // sort positions by target frame index
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return indices[a] < indices[b]; });

  SwsContext* sws =
      sws_getContext(w, h, v.codec->pix_fmt, w, h, AV_PIX_FMT_RGB24,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!sws) return -11;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t cur_frame = -1;  // index of last decoded frame
  bool eof = false;
  int out_pos = 0;
  uint8_t* last_good = nullptr;  // pad with last decoded frame on EOF

  auto convert_to = [&](uint8_t* dst) {
    uint8_t* planes[1] = {dst};
    int strides[1] = {w * 3};
    sws_scale(sws, frame->data, frame->linesize, 0, h, planes, strides);
  };

  auto seek_to = [&](int64_t target) {
    int64_t pts = v.frame_to_pts(target);
    if (av_seek_frame(v.fmt, v.stream_index, pts, AVSEEK_FLAG_BACKWARD) >= 0) {
      avcodec_flush_buffers(v.codec);
      cur_frame = -2;  // unknown until next decoded frame reports pts
    }
  };

  while (out_pos < n && !eof) {
    int64_t target = indices[order[out_pos]];
    if (cur_frame >= 0 &&
        (target < cur_frame || target > cur_frame + kSeekAheadFrames)) {
      seek_to(target);
    } else if (cur_frame == -1 && target > kSeekAheadFrames) {
      seek_to(target);
    }

    // pull decoded frames until we pass/hit the target
    int rcv = avcodec_receive_frame(v.codec, frame);
    if (rcv == AVERROR(EAGAIN)) {
      int rd = av_read_frame(v.fmt, pkt);
      if (rd < 0) {
        avcodec_send_packet(v.codec, nullptr);  // flush
        rcv = avcodec_receive_frame(v.codec, frame);
        if (rcv < 0) eof = true;
      } else {
        if (pkt->stream_index == v.stream_index) {
          avcodec_send_packet(v.codec, pkt);
        }
        av_packet_unref(pkt);
        continue;
      }
    } else if (rcv < 0) {
      eof = true;
    }
    if (eof) break;

    int64_t pts = frame->best_effort_timestamp;
    cur_frame = (pts == AV_NOPTS_VALUE) ? cur_frame + 1 : v.pts_to_frame(pts);

    while (out_pos < n && indices[order[out_pos]] <= cur_frame) {
      uint8_t* dst = out_rgb + frame_bytes * order[out_pos];
      convert_to(dst);
      last_good = dst;
      ++out_pos;
    }
    av_frame_unref(frame);
  }

  // EOF before all targets (estimated frame count > real): pad with last frame
  if (out_pos < n && last_good == nullptr) {
    av_packet_free(&pkt);
    av_frame_free(&frame);
    sws_freeContext(sws);
    return -12;
  }
  while (out_pos < n) {
    std::memcpy(out_rgb + frame_bytes * order[out_pos], last_good, frame_bytes);
    ++out_pos;
  }

  av_packet_free(&pkt);
  av_frame_free(&frame);
  sws_freeContext(sws);
  return 0;
}

}  // extern "C"
