// Native audio decoder for audiocraft_tpu — C ABI over ffmpeg's libavformat/
// libavcodec/libswresample.
//
// Role: the compressed-audio half of the reference's audio_read
// (/root/reference/audiocraft/data/audio.py:117-151), which dispatches to
// soundfile/PyAV — neither exists in this environment, so the framework links
// the system ffmpeg libraries directly.  Semantics mirrored:
//  * seek lands 0.1 s BEFORE the requested time and pre-roll samples are
//    dropped, dodging mp3 frame-edge artifacts (reference audio.py:86-99).
//  * output is float32 interleaved PCM at the stream's native sample rate
//    (resampling happens in JAX, where it must match julius math).
//
// Build: see native/build.sh (g++ -shared against system ffmpeg).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Decoded {
  std::vector<float> samples;  // interleaved
  int channels = 0;
  int sample_rate = 0;
};

int decode_file(const char* path, double seek_time, double duration,
                Decoded* out, char* err, int err_len) {
  AVFormatContext* fmt = nullptr;
  int ret = avformat_open_input(&fmt, path, nullptr, nullptr);
  if (ret < 0) {
    av_strerror(ret, err, err_len);
    return -1;
  }
  ret = avformat_find_stream_info(fmt, nullptr);
  if (ret < 0) {
    av_strerror(ret, err, err_len);
    avformat_close_input(&fmt);
    return -2;
  }
  const AVCodec* codec = nullptr;
  int stream_idx =
      av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
  if (stream_idx < 0 || !codec) {
    snprintf(err, err_len, "no audio stream");
    avformat_close_input(&fmt);
    return -3;
  }
  AVStream* stream = fmt->streams[stream_idx];
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, stream->codecpar);
  ret = avcodec_open2(ctx, codec, nullptr);
  if (ret < 0) {
    av_strerror(ret, err, err_len);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -4;
  }

  const int sr = ctx->sample_rate;
  const int channels = ctx->ch_layout.nb_channels;
  out->channels = channels;
  out->sample_rate = sr;

  // seek with the reference's 0.1 s pre-roll (audio.py:92)
  double preroll_target = seek_time > 0 ? seek_time - 0.1 : 0.0;
  if (preroll_target < 0) preroll_target = 0;
  bool did_seek = false;
  int64_t start_skip = stream->codecpar->initial_padding;
  if (seek_time > 0) {
    // The demuxer's skip side-data (codec delay) trims the stream head on a
    // fresh decode but is lost after a seek, shifting seeked reads relative
    // to full decodes.  Read it off the first audio packet before seeking.
    if (start_skip == 0) {
      AVPacket* probe = av_packet_alloc();
      while (av_read_frame(fmt, probe) >= 0) {
        if (probe->stream_index == stream_idx) {
          size_t side_len = 0;
          uint8_t* side = av_packet_get_side_data(
              probe, AV_PKT_DATA_SKIP_SAMPLES, &side_len);
          if (side && side_len >= 4)
            start_skip = side[0] | (side[1] << 8) | (side[2] << 16)
                         | ((int64_t)side[3] << 24);
          av_packet_unref(probe);
          break;
        }
        av_packet_unref(probe);
      }
      av_packet_free(&probe);
    }
    int64_t ts = (int64_t)(preroll_target / av_q2d(stream->time_base));
    if (av_seek_frame(fmt, stream_idx, ts, AVSEEK_FLAG_BACKWARD) >= 0) {
      avcodec_flush_buffers(ctx);
      did_seek = true;
    }
  }
  int64_t seek_delay = did_seek ? start_skip : 0;

  // resampler to interleaved float at native rate
  SwrContext* swr = nullptr;
  AVChannelLayout out_layout;
  av_channel_layout_copy(&out_layout, &ctx->ch_layout);
  ret = swr_alloc_set_opts2(&swr, &out_layout, AV_SAMPLE_FMT_FLT, sr,
                            &ctx->ch_layout, ctx->sample_fmt, sr, 0, nullptr);
  if (ret < 0 || swr_init(swr) < 0) {
    snprintf(err, err_len, "swr init failed");
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -5;
  }

  int64_t skip_frames = 0;   // pre-roll frames to drop once stream pts known
  int64_t max_frames = duration > 0 ? (int64_t)(duration * sr) : INT64_MAX;
  bool first_frame = true;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  std::vector<float> tmp;
  bool done = false;

  auto consume_frame = [&](AVFrame* f) {
    int nb = f->nb_samples;
    tmp.resize((size_t)nb * channels);
    uint8_t* dst[1] = {(uint8_t*)tmp.data()};
    int got = swr_convert(swr, dst, nb, (const uint8_t**)f->extended_data, nb);
    if (got <= 0) return;
    if (first_frame) {
      first_frame = false;
      double frame_time = preroll_target;
      if (f->pts != AV_NOPTS_VALUE)
        frame_time = f->pts * av_q2d(stream->time_base);
      double drop_sec = seek_time - frame_time;
      skip_frames = drop_sec > 0 ? (int64_t)(drop_sec * sr + 0.5) : 0;
      skip_frames += seek_delay;
    }
    int64_t start = 0;
    if (skip_frames > 0) {
      start = skip_frames < got ? skip_frames : got;
      skip_frames -= start;
    }
    int64_t have = (int64_t)out->samples.size() / channels;
    int64_t want = max_frames - have;
    int64_t take = got - start;
    if (take > want) take = want;
    if (take > 0) {
      const float* base = tmp.data() + (size_t)start * channels;
      out->samples.insert(out->samples.end(), base,
                          base + (size_t)take * channels);
    }
    if ((int64_t)out->samples.size() / channels >= max_frames) done = true;
  };

  while (!done && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == stream_idx) {
      if (avcodec_send_packet(ctx, pkt) >= 0) {
        while (!done && avcodec_receive_frame(ctx, frame) >= 0)
          consume_frame(frame);
      }
    }
    av_packet_unref(pkt);
  }
  if (!done) {  // flush decoder
    avcodec_send_packet(ctx, nullptr);
    while (!done && avcodec_receive_frame(ctx, frame) >= 0)
      consume_frame(frame);
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  swr_free(&swr);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);
  return 0;
}

}  // namespace

extern "C" {

// Quiet ffmpeg's info-level chatter (duration estimates etc.).
__attribute__((constructor)) static void act_init_logging() {
  av_log_set_level(AV_LOG_ERROR);
}

// Decode `path` starting at seek_time (s) for up to duration (s; <=0 = all).
// On success (0), *out_data is a malloc'd interleaved float32 buffer the
// caller must release with act_free_buffer.
int act_decode_audio(const char* path, double seek_time, double duration,
                     float** out_data, int64_t* out_frames, int* out_channels,
                     int* out_sample_rate, char* err, int err_len) {
  Decoded dec;
  int ret = decode_file(path, seek_time, duration, &dec, err, err_len);
  if (ret != 0) return ret;
  *out_channels = dec.channels;
  *out_sample_rate = dec.sample_rate;
  *out_frames = (int64_t)(dec.samples.size() / (size_t)dec.channels);
  *out_data = (float*)malloc(dec.samples.size() * sizeof(float));
  if (!*out_data) {
    snprintf(err, err_len, "oom");
    return -6;
  }
  memcpy(*out_data, dec.samples.data(), dec.samples.size() * sizeof(float));
  return 0;
}

// Probe stream info without decoding samples.
int act_audio_info(const char* path, double* out_duration, int* out_channels,
                   int* out_sample_rate, char* err, int err_len) {
  AVFormatContext* fmt = nullptr;
  int ret = avformat_open_input(&fmt, path, nullptr, nullptr);
  if (ret < 0) {
    av_strerror(ret, err, err_len);
    return -1;
  }
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    snprintf(err, err_len, "no stream info");
    avformat_close_input(&fmt);
    return -2;
  }
  int idx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (idx < 0) {
    snprintf(err, err_len, "no audio stream");
    avformat_close_input(&fmt);
    return -3;
  }
  AVStream* st = fmt->streams[idx];
  *out_channels = st->codecpar->ch_layout.nb_channels;
  *out_sample_rate = st->codecpar->sample_rate;
  if (st->duration != AV_NOPTS_VALUE)
    *out_duration = st->duration * av_q2d(st->time_base);
  else if (fmt->duration != AV_NOPTS_VALUE)
    *out_duration = fmt->duration / (double)AV_TIME_BASE;
  else
    *out_duration = 0;
  avformat_close_input(&fmt);
  return 0;
}

void act_free_buffer(float* data) { free(data); }

// Encode interleaved float32 PCM to a compressed container (the write half of
// the reference's audio_write, /root/reference/audiocraft/data/audio.py:164-228,
// which pipes f32le PCM to the ffmpeg binary — absent here, so we drive
// libavformat/libavcodec directly).  `codec_name` selects the encoder
// ("libmp3lame", "libvorbis", "flac", "aac", "libopus"); the muxer is guessed
// from the output path's extension.  bitrate_kbps <= 0 lets the encoder pick
// its default (vorbis quality mode etc.).
int act_encode_audio(const char* path, const float* data, int64_t frames,
                     int channels, int sample_rate, const char* codec_name,
                     int bitrate_kbps, char* err, int err_len) {
  const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec) {
    snprintf(err, err_len, "encoder '%s' not available", codec_name);
    return -1;
  }
  AVFormatContext* fmt = nullptr;
  int ret = avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
  if (ret < 0 || !fmt) {
    av_strerror(ret, err, err_len);
    return -2;
  }
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  av_channel_layout_default(&ctx->ch_layout, channels);
  ctx->sample_rate = sample_rate;
  if (codec->supported_samplerates) {
    bool ok = false;
    for (const int* r = codec->supported_samplerates; *r; ++r)
      if (*r == sample_rate) { ok = true; break; }
    if (!ok) {
      snprintf(err, err_len, "%s does not support %d Hz", codec_name,
               sample_rate);
      avcodec_free_context(&ctx);
      avformat_free_context(fmt);
      return -3;
    }
  }
  ctx->sample_fmt = codec->sample_fmts ? codec->sample_fmts[0]
                                       : AV_SAMPLE_FMT_FLTP;
  if (bitrate_kbps > 0) ctx->bit_rate = (int64_t)bitrate_kbps * 1000;
  ctx->time_base = AVRational{1, sample_rate};
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  ret = avcodec_open2(ctx, codec, nullptr);
  if (ret < 0) {
    av_strerror(ret, err, err_len);
    avcodec_free_context(&ctx);
    avformat_free_context(fmt);
    return -4;
  }
  AVStream* stream = avformat_new_stream(fmt, nullptr);
  avcodec_parameters_from_context(stream->codecpar, ctx);
  stream->time_base = ctx->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
    ret = avio_open(&fmt->pb, path, AVIO_FLAG_WRITE);
    if (ret < 0) {
      av_strerror(ret, err, err_len);
      avcodec_free_context(&ctx);
      avformat_free_context(fmt);
      return -5;
    }
  }
  ret = avformat_write_header(fmt, nullptr);
  if (ret < 0) {
    av_strerror(ret, err, err_len);
    if (fmt->pb) avio_closep(&fmt->pb);
    avcodec_free_context(&ctx);
    avformat_free_context(fmt);
    return -6;
  }

  // interleaved float -> the encoder's planar/packed native format
  SwrContext* swr = nullptr;
  ret = swr_alloc_set_opts2(&swr, &ctx->ch_layout, ctx->sample_fmt,
                            sample_rate, &ctx->ch_layout, AV_SAMPLE_FMT_FLT,
                            sample_rate, 0, nullptr);
  if (ret < 0 || swr_init(swr) < 0) {
    snprintf(err, err_len, "swr init failed");
    if (fmt->pb) avio_closep(&fmt->pb);
    avcodec_free_context(&ctx);
    avformat_free_context(fmt);
    return -7;
  }

  const int64_t chunk = ctx->frame_size > 0 ? ctx->frame_size : 4096;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int status = 0;

  auto drain = [&](AVFrame* f) -> int {
    int r = avcodec_send_frame(ctx, f);
    if (r < 0) return r;
    for (;;) {
      r = avcodec_receive_packet(ctx, pkt);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
      if (r < 0) return r;
      av_packet_rescale_ts(pkt, ctx->time_base, stream->time_base);
      pkt->stream_index = stream->index;
      r = av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
      if (r < 0) return r;
    }
  };

  int64_t pos = 0;
  while (pos < frames && status == 0) {
    int64_t take = frames - pos < chunk ? frames - pos : chunk;
    frame->nb_samples = (int)take;
    av_channel_layout_copy(&frame->ch_layout, &ctx->ch_layout);
    frame->format = ctx->sample_fmt;
    frame->sample_rate = sample_rate;
    if ((status = av_frame_get_buffer(frame, 0)) < 0) break;
    const uint8_t* src[1] = {
        (const uint8_t*)(data + (size_t)pos * channels)};
    int got = swr_convert(swr, frame->extended_data, (int)take, src,
                          (int)take);
    if (got < 0) { status = got; break; }
    frame->nb_samples = got;
    frame->pts = pos;
    status = drain(frame);
    av_frame_unref(frame);
    pos += take;
  }
  if (status == 0) status = drain(nullptr);  // flush encoder
  if (status == 0) status = av_write_trailer(fmt);
  if (status < 0) av_strerror(status, err, err_len);

  av_frame_free(&frame);
  av_packet_free(&pkt);
  swr_free(&swr);
  if (fmt->pb) avio_closep(&fmt->pb);
  avcodec_free_context(&ctx);
  avformat_free_context(fmt);
  return status < 0 ? -8 : 0;
}

// Decode a batch of files in parallel with an internal thread pool — the
// native data-loader hot path (GIL-free, one decoder per worker).  Outputs
// are per-item malloc'd buffers; out_status[i] == 0 on success.
void act_decode_batch(const char** paths, int n, const double* seek_times,
                      const double* durations, float** out_datas,
                      int64_t* out_frames, int* out_channels,
                      int* out_sample_rates, int* out_status,
                      int num_threads) {
  if (num_threads <= 0) num_threads = 4;
  if (num_threads > n) num_threads = n;
  std::atomic<int> next{0};
  auto worker = [&]() {
    char err[256];
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      out_datas[i] = nullptr;
      out_status[i] = act_decode_audio(
          paths[i], seek_times ? seek_times[i] : 0.0,
          durations ? durations[i] : -1.0, &out_datas[i], &out_frames[i],
          &out_channels[i], &out_sample_rates[i], err, sizeof(err));
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // extern "C"
