"""Native waveform-video pipeline (video_mux.cc): MP4 with animated bars,
AAC audio, and embedded metadata (reference modules/gradio.py:35-273 +
app.py:469-538)."""

import numpy as np
import pytest

from audiocraft_tpu.io import video as vid

pytestmark = pytest.mark.skipif(not vid.available(),
                                reason="native video muxer not built")


def _tone(sr=32000, secs=2.0):
    t = np.arange(int(sr * secs)) / sr
    return (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), sr


def test_mux_and_metadata_roundtrip(tmp_path):
    wav, sr = _tone()
    meta = {'title': 'My Song', 'artist': 'tester',
            'comment': 'seed=7 | topk=50', 'genre': 'electronic'}
    out = vid.make_waveform_video(tmp_path / "song.mp4", wav, sr,
                                  metadata=meta, title="My Song",
                                  settings="model: debug | seed: 7")
    assert out.stat().st_size > 10000
    tags = vid.read_metadata(out)
    for k, v in meta.items():
        assert tags.get(k) == v, (k, tags)

    # the audio track must decode back via the native decoder at the right
    # sample rate and duration
    from audiocraft_tpu.io.native import decode_audio, probe_audio
    info_sr, dur, ch = probe_audio(out)
    assert info_sr == sr
    assert abs(dur - 2.0) < 0.15
    decoded, dec_sr = decode_audio(out)
    assert dec_sr == sr
    assert decoded.shape[-1] > sr  # at least a second survived


def test_stereo_and_frame_shapes(tmp_path):
    wav, sr = _tone(secs=1.0)
    stereo = np.stack([wav, -wav])
    base = vid.render_base_frame(stereo, width=320, height=240,
                                 title="t", settings="s")
    assert base.shape == (240, 320, 3)
    out = vid.mux_waveform_video(tmp_path / "st.mp4", stereo, sr, base,
                                 metadata={'title': 'st'})
    assert out.stat().st_size > 5000


def test_odd_dims_rounded(tmp_path):
    wav, sr = _tone(secs=0.5)
    base = vid.render_base_frame(wav, width=321, height=241)
    assert base.shape[0] % 2 == 0 and base.shape[1] % 2 == 0


def test_serve_return_video(tmp_path):
    import json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from audiocraft_tpu.apps.serve import GenerationService, make_handler

    service = GenerationService('debug', cache_dir=str(tmp_path))
    server = ThreadingHTTPServer(('127.0.0.1', 0), make_handler(service))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/generate',
            data=json.dumps({'text': 'beep', 'duration': 1.0, 'seed': 3,
                             'title': 'Beep Song',
                             'return_video': True}).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=300) as r:
            body = r.read()
            assert r.headers['Content-Type'] == 'video/mp4'
            assert len(body) > 5000
        # metadata embedded in the served mp4
        p = tmp_path / 'served.mp4'
        p.write_bytes(body)
        tags = vid.read_metadata(p)
        assert tags.get('title') == 'Beep Song'
        assert 'Seed: 3' in tags.get('comment', '')
    finally:
        server.shutdown()
        from audiocraft_tpu.ckpt.loaders import clear_model_cache
        clear_model_cache()
