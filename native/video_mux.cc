// Native waveform-video muxer for audiocraft_tpu — C ABI over ffmpeg's
// libavformat/libavcodec/libswscale/libswresample.
//
// Role: the video half of the fork's output pipeline
// (/root/reference/modules/gradio.py:35-273 `make_waveform` — matplotlib bars
// + ffmpeg CLI mux; /root/reference/app.py:469-538 — MP4 metadata via
// mutagen).  This environment has the ffmpeg *libraries* but no ffmpeg binary
// and no mutagen, so the mux + metadata embedding run natively here.
//
// Design: Python renders ONE base image (bars, title card, overlays); this
// muxer animates playback progress over it frame-by-frame on the C side
// (a highlight sweep + cursor column), so no multi-hundred-MB frame stacks
// cross the language boundary.  Audio is AAC (ffmpeg's built-in encoder),
// video is MPEG-4 Part 2 (built-in, no external x264 dependency), container
// MP4 with standard metadata tags.
//
// Build: native/build.sh

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct MuxState {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* vctx = nullptr;
  AVCodecContext* actx = nullptr;
  AVStream* vstream = nullptr;
  AVStream* astream = nullptr;
  SwsContext* sws = nullptr;
  SwrContext* swr = nullptr;

  ~MuxState() {
    if (sws) sws_freeContext(sws);
    if (swr) swr_free(&swr);
    if (vctx) avcodec_free_context(&vctx);
    if (actx) avcodec_free_context(&actx);
    if (fmt) {
      if (fmt->pb) avio_closep(&fmt->pb);
      avformat_free_context(fmt);
    }
  }
};

int fail(char* err, int err_len, const char* msg, int code) {
  snprintf(err, err_len, "%s", msg);
  return code;
}

int send_and_mux(MuxState& st, AVCodecContext* ctx, AVStream* stream,
                 AVFrame* frame) {
  int ret = avcodec_send_frame(ctx, frame);
  if (ret < 0) return ret;
  AVPacket* pkt = av_packet_alloc();
  while (ret >= 0) {
    ret = avcodec_receive_packet(ctx, pkt);
    if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) {
      ret = 0;
      break;
    }
    if (ret < 0) break;
    av_packet_rescale_ts(pkt, ctx->time_base, stream->time_base);
    pkt->stream_index = stream->index;
    ret = av_interleaved_write_frame(st.fmt, pkt);
    if (ret < 0) break;
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  return ret;
}

// Animate playback progress over the base image: already-played columns get
// a brightened sweep, with a bright cursor column at the playhead.
void draw_progress(const uint8_t* base, uint8_t* out, int w, int h,
                   double frac) {
  std::memcpy(out, base, static_cast<size_t>(w) * h * 3);
  int played = std::min(w, static_cast<int>(frac * w + 0.5));
  for (int y = 0; y < h; ++y) {
    uint8_t* row = out + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < played; ++x) {
      uint8_t* px = row + x * 3;
      px[0] = static_cast<uint8_t>(px[0] + ((255 - px[0]) * 2) / 5);
      px[1] = static_cast<uint8_t>(px[1] + ((255 - px[1]) * 2) / 5);
      px[2] = static_cast<uint8_t>(px[2] + ((255 - px[2]) * 2) / 5);
    }
    for (int x = played; x < std::min(played + 2, w); ++x) {
      uint8_t* px = row + x * 3;
      px[0] = px[1] = px[2] = 245;
    }
  }
}

}  // namespace

extern "C" {

// Mux an animated-waveform MP4: base RGB24 image + float PCM -> <out_path>.
// meta_keys/meta_vals: metadata tags (standard MP4 names: title, artist,
// album, comment, genre, date, ...).  Returns 0 on success; on failure a
// negative code with a message in err.
int act_mux_waveform_video(const char* out_path, const uint8_t* base_rgb,
                           int width, int height, int fps, const float* pcm,
                           int64_t n_samples, int sample_rate, int channels,
                           const char** meta_keys, const char** meta_vals,
                           int n_meta, char* err, int err_len) {
  if (width % 2 || height % 2)
    return fail(err, err_len, "width/height must be even for yuv420p", -1);
  MuxState st;
  int ret = avformat_alloc_output_context2(&st.fmt, nullptr, "mp4", out_path);
  if (ret < 0 || !st.fmt) return fail(err, err_len, "alloc mp4 muxer", -2);

  for (int i = 0; i < n_meta; ++i)
    av_dict_set(&st.fmt->metadata, meta_keys[i], meta_vals[i], 0);

  // ---- video stream: built-in MPEG-4 Part 2 encoder
  const AVCodec* vcodec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!vcodec) return fail(err, err_len, "no mpeg4 encoder", -3);
  st.vstream = avformat_new_stream(st.fmt, nullptr);
  st.vctx = avcodec_alloc_context3(vcodec);
  st.vctx->width = width;
  st.vctx->height = height;
  st.vctx->pix_fmt = AV_PIX_FMT_YUV420P;
  st.vctx->time_base = {1, fps};
  st.vctx->framerate = {fps, 1};
  st.vctx->bit_rate = 1200000;
  st.vctx->gop_size = fps * 2;
  if (st.fmt->oformat->flags & AVFMT_GLOBALHEADER)
    st.vctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  ret = avcodec_open2(st.vctx, vcodec, nullptr);
  if (ret < 0) return fail(err, err_len, "open mpeg4 encoder", -4);
  avcodec_parameters_from_context(st.vstream->codecpar, st.vctx);
  st.vstream->time_base = st.vctx->time_base;

  // ---- audio stream: built-in AAC encoder (fltp)
  const AVCodec* acodec = avcodec_find_encoder(AV_CODEC_ID_AAC);
  if (!acodec) return fail(err, err_len, "no aac encoder", -5);
  st.astream = avformat_new_stream(st.fmt, nullptr);
  st.actx = avcodec_alloc_context3(acodec);
  st.actx->sample_fmt = AV_SAMPLE_FMT_FLTP;
  st.actx->sample_rate = sample_rate;
  av_channel_layout_default(&st.actx->ch_layout, channels);
  st.actx->time_base = {1, sample_rate};
  st.actx->bit_rate = 192000;
  if (st.fmt->oformat->flags & AVFMT_GLOBALHEADER)
    st.actx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  ret = avcodec_open2(st.actx, acodec, nullptr);
  if (ret < 0) return fail(err, err_len, "open aac encoder", -6);
  avcodec_parameters_from_context(st.astream->codecpar, st.actx);
  st.astream->time_base = st.actx->time_base;

  ret = avio_open(&st.fmt->pb, out_path, AVIO_FLAG_WRITE);
  if (ret < 0) return fail(err, err_len, "open output file", -7);
  ret = avformat_write_header(st.fmt, nullptr);
  if (ret < 0) return fail(err, err_len, "write header", -8);

  // ---- frames
  st.sws = sws_getContext(width, height, AV_PIX_FMT_RGB24, width, height,
                          AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr, nullptr,
                          nullptr);
  AVFrame* vframe = av_frame_alloc();
  vframe->format = AV_PIX_FMT_YUV420P;
  vframe->width = width;
  vframe->height = height;
  av_frame_get_buffer(vframe, 0);

  AVFrame* aframe = av_frame_alloc();
  aframe->format = AV_SAMPLE_FMT_FLTP;
  aframe->sample_rate = sample_rate;
  av_channel_layout_copy(&aframe->ch_layout, &st.actx->ch_layout);
  aframe->nb_samples = st.actx->frame_size > 0 ? st.actx->frame_size : 1024;
  av_frame_get_buffer(aframe, 0);

  double duration = static_cast<double>(n_samples) / sample_rate;
  int64_t n_frames =
      std::max<int64_t>(1, static_cast<int64_t>(duration * fps + 0.5));
  std::vector<uint8_t> rgb(static_cast<size_t>(width) * height * 3);
  const int rgb_stride[1] = {width * 3};

  int64_t audio_pos = 0;   // samples fed so far
  int64_t video_pos = 0;   // frames fed so far
  const int chunk = aframe->nb_samples;

  // interleave by timestamp: feed whichever stream is behind
  while (video_pos < n_frames || audio_pos < n_samples) {
    double vt = static_cast<double>(video_pos) / fps;
    double at = static_cast<double>(audio_pos) / sample_rate;
    if (video_pos < n_frames && (vt <= at || audio_pos >= n_samples)) {
      draw_progress(base_rgb, rgb.data(), width, height,
                    static_cast<double>(video_pos) / n_frames);
      const uint8_t* src[1] = {rgb.data()};
      av_frame_make_writable(vframe);
      sws_scale(st.sws, src, rgb_stride, 0, height, vframe->data,
                vframe->linesize);
      vframe->pts = video_pos++;
      ret = send_and_mux(st, st.vctx, st.vstream, vframe);
      if (ret < 0) break;
    } else {
      int64_t todo = std::min<int64_t>(chunk, n_samples - audio_pos);
      av_frame_make_writable(aframe);
      for (int c = 0; c < channels; ++c) {
        float* dst = reinterpret_cast<float*>(aframe->data[c]);
        for (int64_t i = 0; i < todo; ++i)
          dst[i] = pcm[(audio_pos + i) * channels + c];
        for (int64_t i = todo; i < chunk; ++i) dst[i] = 0.0f;
      }
      aframe->nb_samples = chunk;
      aframe->pts = audio_pos;
      audio_pos += todo;
      ret = send_and_mux(st, st.actx, st.astream, aframe);
      if (ret < 0) break;
    }
  }

  if (ret >= 0) ret = send_and_mux(st, st.vctx, st.vstream, nullptr);
  if (ret >= 0) ret = send_and_mux(st, st.actx, st.astream, nullptr);
  av_frame_free(&vframe);
  av_frame_free(&aframe);
  if (ret < 0) return fail(err, err_len, "encode/mux frames", -9);
  ret = av_write_trailer(st.fmt);
  if (ret < 0) return fail(err, err_len, "write trailer", -10);
  return 0;
}

// Read back the metadata tags of a media file (verification + history UI).
// Writes up to max_len bytes of "key=value\n" lines into out.
int act_read_metadata(const char* path, char* out, int max_len, char* err,
                      int err_len) {
  AVFormatContext* fmt = nullptr;
  int ret = avformat_open_input(&fmt, path, nullptr, nullptr);
  if (ret < 0) return fail(err, err_len, "open input", -1);
  int off = 0;
  const AVDictionaryEntry* tag = nullptr;
  while ((tag = av_dict_get(fmt->metadata, "", tag, AV_DICT_IGNORE_SUFFIX))) {
    int n = snprintf(out + off, max_len - off, "%s=%s\n", tag->key,
                     tag->value);
    if (n < 0 || off + n >= max_len) break;
    off += n;
  }
  avformat_close_input(&fmt);
  return off;
}

}  // extern "C"
