"""Apps (REST server), spectrograms, info dataset."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax


def test_serve_health_and_generate(tmp_path):
    import base64
    import numpy as np
    from http.server import ThreadingHTTPServer
    from audiocraft_tpu.apps.serve import (GenerationService, _wav_bytes,
                                           make_handler)

    service = GenerationService('debug', cache_dir=str(tmp_path))
    server = ThreadingHTTPServer(('127.0.0.1', 0), make_handler(service))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
                f'http://127.0.0.1:{port}/health', timeout=30) as r:
            assert json.loads(r.read())['status'] == 'ok'

        with urllib.request.urlopen(
                f'http://127.0.0.1:{port}/models', timeout=30) as r:
            models = json.loads(r.read())
            assert models['models'] == ['debug']
            assert models['current'] == 'debug'

        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/generate',
            data=json.dumps({'text': 'beep', 'duration': 1.0,
                             'seed': 7}).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=300) as r:
            body = r.read()
            assert r.headers['Content-Type'] == 'audio/wav'
            assert r.headers['X-Seed'] == '7'
            assert body[:4] == b'RIFF'
            assert len(body) > 44

        # continuation + history-json mode: feed the previous output back
        req2 = urllib.request.Request(
            f'http://127.0.0.1:{port}/generate',
            data=json.dumps({
                'text': 'continue it', 'duration': 1.5, 'seed': 8,
                'prompt_wav': base64.b64encode(body).decode(),
                'return_history_json': True,
            }).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req2, timeout=300) as r:
            doc = json.loads(r.read())
            assert doc['seed'] == 8
            assert doc['metadata']['continuation'] is True
            assert base64.b64decode(doc['audio_b64'])[:4] == b'RIFF'

        # compressed response (reference audio_write mp3 path)
        from audiocraft_tpu.io.native import available as native_available
        if native_available():
            req3 = urllib.request.Request(
                f'http://127.0.0.1:{port}/generate',
                data=json.dumps({'text': 'beep', 'duration': 1.0, 'seed': 7,
                                 'return_format': 'mp3'}).encode(),
                headers={'Content-Type': 'application/json'})
            with urllib.request.urlopen(req3, timeout=300) as r:
                mp3 = r.read()
                assert r.headers['Content-Type'] == 'audio/mpeg'
                assert len(mp3) > 0 and mp3[:4] != b'RIFF'
            # unknown format -> 400
            bad_fmt = urllib.request.Request(
                f'http://127.0.0.1:{port}/generate',
                data=json.dumps({'text': 'x', 'duration': 1.0,
                                 'return_format': 'xm'}).encode())
            try:
                urllib.request.urlopen(bad_fmt, timeout=300)
                assert False, "should have errored"
            except urllib.error.HTTPError as e:
                assert e.code == 400

        # probe: bad requests get clean errors
        for bad_body in ({'duration': 1.0}, {'text': 'x', 'duration': -3}):
            bad = urllib.request.Request(
                f'http://127.0.0.1:{port}/generate',
                data=json.dumps(bad_body).encode())
            try:
                urllib.request.urlopen(bad, timeout=30)
                assert False, "should have errored"
            except urllib.error.HTTPError as e:
                assert e.code == 400

        # unknown model -> 404
        bad3 = urllib.request.Request(
            f'http://127.0.0.1:{port}/generate',
            data=json.dumps({'text': 'x', 'model': 'melody-large'}).encode())
        try:
            urllib.request.urlopen(bad3, timeout=30)
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
        from audiocraft_tpu.ckpt.loaders import clear_model_cache
        clear_model_cache()


def test_spectrogram(tmp_path):
    from audiocraft_tpu.io.spectrogram import mel_spectrogram, save_spectrogram
    sr = 16000
    t = np.arange(sr) / sr
    wav = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    mel = mel_spectrogram(wav, sr)
    assert mel.shape[0] == 80
    # energy concentrated near the 1 kHz mel bin
    peak_bin = mel.mean(axis=1).argmax()
    assert 10 < peak_bin < 50
    out = save_spectrogram(tmp_path / "spec.png", wav, sr, title="test")
    assert out.exists() and out.stat().st_size > 1000


def test_info_audio_dataset(tmp_path):
    from audiocraft_tpu.data.audio_dataset import AudioMeta
    from audiocraft_tpu.data.info_audio_dataset import InfoAudioDataset
    from audiocraft_tpu.io.wav import wav_write
    sr = 16000
    wav = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
           ).astype(np.float32)[None]
    p = tmp_path / "a.wav"
    wav_write(wav, p, sr)
    ds = InfoAudioDataset([AudioMeta(str(p), 1.0, sr)],
                          segment_duration=0.5, num_samples=2,
                          sample_rate=sr, channels=1, return_info=True)
    ds.start_epoch(0)
    out, info = ds[0]
    assert out.shape == (1, 8000)
    attrs = info.to_condition_attributes()
    assert attrs.text == {}


def test_waveform_image(tmp_path):
    from audiocraft_tpu.io.waveform import make_waveform_image, waveform_bars
    wav = np.sin(np.linspace(0, 100, 32000)).astype(np.float32)
    bars = waveform_bars(wav, 40)
    assert bars.shape == (40,) and bars.max() <= 1.0
    out = make_waveform_image(tmp_path / "wave.png", wav)
    assert out.exists() and out.stat().st_size > 1000


def test_generation_history(tmp_path):
    from audiocraft_tpu.apps.history import GenerationHistory
    from audiocraft_tpu.io.wav import wav_write
    wav = np.zeros((1, 1000), np.float32)
    src = tmp_path / "src.wav"
    wav_write(wav, src, 16000)
    hist = GenerationHistory(tmp_path / "hist", user="tester")
    e1 = hist.save(src, label="first", metadata={"text": "hello"})
    e2 = hist.save(src, label="second")
    assert len(hist.list()) == 2
    assert (tmp_path / "hist" / "tester" / e1["audio"]).exists()
    hist.delete(e1["audio"])
    remaining = hist.list()
    assert len(remaining) == 1 and remaining[0]["label"] == "second"
    archive = hist.export_zip(tmp_path / "export")
    assert archive.exists()


def test_ui_predict_headless(tmp_path):
    """The UI's predict core works without gradio (text + melody paths)."""
    from audiocraft_tpu.apps.history import GenerationHistory
    from audiocraft_tpu.apps.ui import predict
    from audiocraft_tpu.gen.musicgen import get_debug_musicgen

    model = get_debug_musicgen(jax.random.PRNGKey(0))
    hist = GenerationHistory(tmp_path / "h")
    path, seed = predict(model, "test tune", duration=1.0, seed=7,
                         history=hist)
    assert path.exists() and seed == 7
    assert len(hist.list()) == 1

    # melody on a non-melody model raises the documented error
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        predict(model, "x", melody=(32000, np.zeros(32000, np.float32)),
                duration=1.0, seed=1)


def test_ui_predict_video_surface(tmp_path):
    """The reference predict's full surface (app.py:244-330): title card,
    background, settings text, portrait orientation -> an MP4 with embedded
    metadata, returned as the reference triple (video, wav, seed)."""
    from audiocraft_tpu.apps.ui import predict
    from audiocraft_tpu.gen.musicgen import get_debug_musicgen
    from audiocraft_tpu.io import video as vid

    if not vid.available():
        pytest.skip("native video muxer not built")
    model = get_debug_musicgen(jax.random.PRNGKey(0))
    # background image for the card
    from PIL import Image
    bg = tmp_path / "bg.png"
    Image.new("RGB", (64, 64), (10, 60, 90)).save(bg)

    video_path, wav_path, seed = predict(
        model, "test tune", duration=1.0, seed=11, return_video=True,
        title="My Song", background=str(bg), video_orientation="Portrait",
        settings_font_color="#ffcc00", settings_font_size=20)
    assert wav_path.exists() and seed == 11
    assert video_path.exists() and video_path.suffix == ".mp4"
    tags = vid.read_metadata(video_path)
    joined = " ".join(f"{k}={v}" for k, v in tags.items())
    assert "My Song" in joined


def test_history_delete_all_and_admin(tmp_path):
    from audiocraft_tpu.apps.history import (GenerationHistory, admin_stats,
                                             render_admin_html)
    from audiocraft_tpu.io.wav import wav_write

    root = tmp_path / "hist"
    for user in ("alice", "bob"):
        hist = GenerationHistory(root, user=user)
        wav = np.zeros((1, 1600), np.float32)
        p = tmp_path / f"{user}.wav"
        wav_write(wav, p, 16000)
        hist.save(p, label=f"{user} tune", metadata={"seed": 1})

    stats = admin_stats(root)
    assert stats["users"] == 2
    assert stats["entries"] == 2
    assert stats["audio_files"] == 2
    assert stats["disk_total_gb"] > 0
    html = render_admin_html(root)
    assert "History admin" in html and "users" in html

    # delete_all archives first (reference user_history.py:453-480)
    alice = GenerationHistory(root, user="alice")
    archive = alice.delete_all(archive_dir=tmp_path / "archives")
    assert archive is not None and archive.exists()
    assert alice.list() == []
    assert admin_stats(root)["entries"] == 1  # bob untouched


def test_ui_build_requires_gradio():
    from audiocraft_tpu.apps.ui import build_ui
    try:
        import gradio  # noqa: F401
        pytest.skip("gradio installed; UI would build")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="gradio is not installed"):
        build_ui(model=None)


def test_titlecard_render(tmp_path):
    from audiocraft_tpu.io.titlecard import (parse_color, render_title_card,
                                             settings_text)
    assert parse_color('#ff0000') == (255, 0, 0, 255)
    assert parse_color('#00ff0080') == (0, 255, 0, 128)
    assert parse_color('rgb(1, 2, 3)') == (1, 2, 3, 255)
    assert parse_color('rgba(1, 2, 3, 0.5)') == (1, 2, 3, 128)
    assert parse_color((10, 20, 30)) == (10, 20, 30, 255)
    assert parse_color('garbage!!') == (255, 255, 0, 255)

    img = render_title_card(title="A Long Generated Song Title That Wraps",
                            description="model: small | seed: 42",
                            width=320, height=200, font_color='#c87f05')
    assert img.size == (320, 200)
    arr = np.asarray(img.convert('RGB'))
    assert (arr != arr[0, 0]).any()  # text actually drawn

    text = settings_text({'prompt': 'p', 'Seed': 7, 'topk': 250, 'x': 'y'})
    assert text.startswith('prompt: p')
    assert 'Seed: 7' in text and 'x: y' in text


def test_batch_generate_cli(tmp_path):
    """Batched demo pipeline (reference app_batched.py): prompts file ->
    wavs + manifest (+videos when the native muxer exists)."""
    from audiocraft_tpu.apps.batch_generate import main as batch_main
    from audiocraft_tpu.io import video as vid

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a calm piano piece\n# comment\nupbeat drums\n")
    out = tmp_path / "out"
    args = [str(prompts), '--out', str(out), '--model', 'debug',
            '--duration', '0.5', '--batch-size', '2',
            '--cache-dir', str(tmp_path / 'cache')]
    if vid.available():
        args.append('--video')
    batch_main(args)

    wavs = sorted(out.glob('*.wav'))
    assert len(wavs) == 2
    manifest = json.loads((out / 'manifest.json').read_text())
    assert len(manifest) == 2
    assert manifest[0]['prompt'] == 'a calm piano piece'
    if vid.available():
        assert len(sorted(out.glob('*.mp4'))) == 2
    from audiocraft_tpu.ckpt.loaders import clear_model_cache
    clear_model_cache()


def test_ui_predict_by_model_name(tmp_path):
    """predict() resolves model names through the cached loader (the UI's
    model dropdown semantics, reference app.py:300-315)."""
    from audiocraft_tpu.apps.ui import predict
    path, seed = predict('debug', "tiny tune", duration=0.5, seed=3,
                         cache_dir=str(tmp_path))
    assert path.exists() and seed == 3
    from audiocraft_tpu.ckpt.loaders import clear_model_cache
    clear_model_cache()


def test_hpss_separates_components():
    """Median-filter HPSS: a steady tone is mostly harmonic, clicks mostly
    percussive (io/hpss.py, the reference's librosa.effects.hpss role)."""
    from audiocraft_tpu.io.hpss import hpss
    sr = 16000
    t = np.arange(2 * sr) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    clicks = np.zeros_like(tone)
    clicks[::2000] = 1.0
    mix = tone + clicks
    h, p = hpss(mix[None])
    assert h.shape == p.shape == (1, len(t))
    # energy routing: harmonic keeps the tone, percussive keeps the clicks
    tone_corr_h = np.corrcoef(h[0], tone)[0, 1]
    tone_corr_p = np.corrcoef(p[0], tone)[0, 1]
    assert tone_corr_h > 0.9 and tone_corr_h > tone_corr_p
    click_energy_p = (p[0][::2000] ** 2).sum()
    click_energy_h = (h[0][::2000] ** 2).sum()
    assert click_energy_p > click_energy_h


def test_storage_publish_and_shortener(tmp_path):
    """Artifact store + URL shortener (reference modules/storage.py role,
    local backend)."""
    from audiocraft_tpu.apps.storage import (LocalStore, publish,
                                             resolve_url, shorten_url)
    store = LocalStore(tmp_path / "repo", base_url="https://store.local")
    wav = tmp_path / "a.wav"
    wav.write_bytes(b"RIFF....WAVE")
    mp4 = tmp_path / "a.mp4"
    mp4.write_bytes(b"mp4!")

    result = publish(store, [wav, mp4], "user/track/42")
    assert len(result['files']) == 2
    assert (tmp_path / "repo" / "user/track/42" / "a.wav").exists()
    assert 'audio=' in result['permalink'] and 'video=' in result['permalink']
    assert resolve_url(store, result['short_url']) == result['permalink']

    # idempotent shortening: same url -> same id
    again = shorten_url(store, result['permalink'])
    assert again == result['short_url']
    assert resolve_url(store, 'nope') is None


def test_history_gallery_html(tmp_path):
    from audiocraft_tpu.apps.history import GenerationHistory, write_gallery
    from audiocraft_tpu.io.wav import wav_write
    wav = np.zeros((1, 800), np.float32)
    src = tmp_path / "s.wav"
    wav_write(wav, src, 16000)
    hist = GenerationHistory(tmp_path / "h", user="u")
    hist.save(src, label="first tune", metadata={"seed": 1, "model": "debug"})
    hist.save(src, label="second tune", metadata={"seed": 2})
    page = write_gallery(hist)
    html = page.read_text()
    assert page.name == "index.html"
    assert "first tune" in html and "second tune" in html
    assert html.count("<audio") == 2
    assert "seed: 2" in html


def test_train_lm_cli(tmp_path):
    """LM training driver: CE decreases over synthetic steps and the
    checkpoint bundle round-trips (the stripped musicgen solver's role)."""
    import io as _io
    import contextlib
    from audiocraft_tpu.apps.train_lm import main as train_main
    from audiocraft_tpu.ckpt.io import load_checkpoint

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        train_main(['--synthetic', '--debug', '--steps', '6', '--batch', '8',
                    '--segment', '1.0', '--log-every', '1',
                    '--ckpt', str(tmp_path / 'lm_ckpt')])
    lines = [ln for ln in buf.getvalue().splitlines() if ln.startswith('step')]
    first = float(lines[0].split()[3])
    last = float(lines[-1].split()[3])
    assert last < first, (first, last)
    bundle, params, _ = load_checkpoint(tmp_path / 'lm_ckpt')
    assert bundle['lm'].card == 400
    assert 'lm' in params and 'condition_provider' in params


def test_tokenize_cli(tmp_path, capsys):
    """Batch tokenizer CLI: wav files -> npz token archive with obs stats."""
    from audiocraft_tpu.apps.tokenize import main as tok_main
    from audiocraft_tpu.builders import get_debug_compression_model
    from audiocraft_tpu.ckpt.io import save_checkpoint
    from audiocraft_tpu.io.wav import wav_write

    model = get_debug_compression_model(32000)
    params = model.init(jax.random.PRNGKey(0))
    ckpt = save_checkpoint(tmp_path / 'codec', model, params)

    sr = 32000
    wav = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
           ).astype(np.float32)[None]
    for name in ('a.wav', 'b.wav'):
        wav_write(wav, tmp_path / name, sr)

    out = tmp_path / 'tok.npz'
    tok_main([str(tmp_path / 'a.wav'), str(tmp_path / 'b.wav'),
              '--out', str(out), '--checkpoint', str(ckpt),
              '--batch-seconds', '1.0', '--batch-rows', '2', '--stats'])
    with np.load(out) as z:
        codes = z['codes']
    assert codes.shape[0] == 2 and codes.shape[1] == 4
    err = capsys.readouterr().err
    assert 'tokenize pipeline:' in err and 'audio-sec' in err


def test_tokenize_cli_pod(tmp_path, capsys):
    """--pod: whole-file time-parallel tokenization over the 8-device mesh,
    token-exact vs the whole-signal encode."""
    from audiocraft_tpu.apps.tokenize import main as tok_main
    from audiocraft_tpu.builders import get_debug_compression_model
    from audiocraft_tpu.ckpt.io import save_checkpoint
    from audiocraft_tpu.io.wav import wav_write

    model = get_debug_compression_model(32000)
    params = model.init(jax.random.PRNGKey(0))
    ckpt = save_checkpoint(tmp_path / 'codec', model, params)

    sr = 32000
    t = np.arange(4 * sr) / sr
    wav = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    wav_write(wav, tmp_path / 'long.wav', sr)

    out = tmp_path / 'pod.npz'
    tok_main([str(tmp_path / 'long.wav'), '--out', str(out),
              '--checkpoint', str(ckpt), '--pod', '--stats'])
    with np.load(out) as z:
        codes = z['codes_0']
    hop = model.encoder.hop_length
    frames = -(-wav.shape[-1] // hop)
    assert codes.shape == (4, frames)
    err = capsys.readouterr().err
    assert 'pod tokenize:' in err and 'device(s)' in err

    # token-exact vs the whole-signal padded encode (the pod contract)
    import jax.numpy as jnp
    S = len(jax.devices())
    pad = -(-wav.shape[-1] // (hop * S)) * (hop * S) - wav.shape[-1]
    x = jnp.asarray(np.pad(wav, ((0, 0), (0, pad)))[None])
    ref, _ = model.encode(params, x)
    np.testing.assert_array_equal(codes, np.asarray(ref)[0, :, :frames])


def test_tokenize_cli_chunk(tmp_path, capsys):
    """--chunk: whole-file single-chip windowed tokenization, token-exact
    vs the whole-signal encode."""
    from audiocraft_tpu.apps.tokenize import main as tok_main
    from audiocraft_tpu.builders import get_debug_compression_model
    from audiocraft_tpu.ckpt.io import save_checkpoint
    from audiocraft_tpu.io.wav import wav_write

    model = get_debug_compression_model(32000)
    params = model.init(jax.random.PRNGKey(0))
    ckpt = save_checkpoint(tmp_path / 'codec', model, params)

    sr = 32000
    t = np.arange(4 * sr) / sr
    wav = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    wav_write(wav, tmp_path / 'long.wav', sr)

    out = tmp_path / 'chunk.npz'
    tok_main([str(tmp_path / 'long.wav'), '--out', str(out),
              '--checkpoint', str(ckpt), '--chunk', '--chunk-frames', '24',
              '--stats'])
    with np.load(out) as z:
        codes = z['codes_0']
    hop = model.encoder.hop_length
    frames = -(-wav.shape[-1] // hop)
    assert codes.shape == (4, frames)
    assert 'chunked tokenize:' in capsys.readouterr().err

    import jax.numpy as jnp
    ref, _ = model.encode(params, jnp.asarray(wav[None]))
    np.testing.assert_array_equal(codes, np.asarray(ref)[0, :, :frames])


def test_serve_quantized_service(tmp_path):
    from audiocraft_tpu.apps.serve import GenerationService
    service = GenerationService('debug', cache_dir=str(tmp_path),
                                quantize=True)
    result = service.generate({'text': 'q tune', 'duration': 0.5, 'seed': 4})
    assert np.isfinite(result['wav']).all()
    from audiocraft_tpu.ckpt.loaders import _MODEL_CACHE, clear_model_cache
    model = _MODEL_CACHE['debug']
    w = model.lm_params['transformer']['layer0']['self_attn']['in_proj_weight']
    assert isinstance(w, dict) and 'q' in w
    clear_model_cache()


def test_serve_kv_int8_service(tmp_path):
    """--kv-int8 path: the served model decodes with quantized KV caches
    (kv_dtype threaded through GenerationService._get_model) and the
    optimize_for_serving facade recipe applies weights+KV in one call."""
    from audiocraft_tpu.apps.serve import GenerationService
    service = GenerationService('debug', cache_dir=str(tmp_path),
                                quantize=True, kv_dtype='int8')
    result = service.generate({'text': 'kv tune', 'duration': 0.5, 'seed': 4})
    assert np.isfinite(result['wav']).all()
    from audiocraft_tpu.ckpt.loaders import _MODEL_CACHE, clear_model_cache
    model = _MODEL_CACHE['debug']
    assert model.kv_dtype == 'int8'
    clear_model_cache()

    from audiocraft_tpu.gen.musicgen import get_debug_musicgen
    mg = get_debug_musicgen()
    mg.optimize_for_serving()
    assert mg.kv_dtype == 'int8'
    w = mg.lm_params['transformer']['layer0']['self_attn']['in_proj_weight']
    assert isinstance(w, dict) and 'q' in w
    mg.set_generation_params(duration=0.5, use_sampling=False)
    wav = mg.generate(['kv tune'])
    assert np.isfinite(np.asarray(wav)).all()


def test_serve_continuous_batching(tmp_path, monkeypatch):
    """Concurrent compatible requests coalesce into ONE facade generate
    call; incompatible params split batches; errors surface per request."""
    import threading as th
    from audiocraft_tpu.apps.serve import GenerationService
    from audiocraft_tpu.ckpt import loaders

    service = GenerationService('debug', cache_dir=str(tmp_path),
                                batch_window_ms=400, max_batch=4)
    model = loaders.load_model('debug', str(tmp_path))
    calls = []
    orig = type(model).generate

    def spying(self, texts, key=None, progress=False):
        calls.append(list(texts))
        return orig(self, texts, key=key, progress=progress)
    monkeypatch.setattr(type(model), 'generate', spying)

    results = {}

    def fire(name, text, duration):
        results[name] = service.generate(
            {'text': text, 'duration': duration, 'seed': 3})

    threads = [th.Thread(target=fire, args=(f'r{i}', f'tune {i}', 0.5))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert len(results) == 3
    for name, res in results.items():
        assert np.isfinite(res['wav']).all()
        assert res['metadata']['batch_size'] == 3
    # one facade call, padded to the power-of-two bucket (4) by repeating
    # the first prompt (avoids a fresh XLA compile per coalesced size)
    assert len(calls) == 1 and len(calls[0]) == 4
    assert sorted(set(calls[0])) == ['tune 0', 'tune 1', 'tune 2']
    assert calls[0][3] == calls[0][0]

    # incompatible durations -> separate generate calls
    calls.clear()
    threads = [th.Thread(target=fire, args=('a', 'one', 0.5)),
               th.Thread(target=fire, args=('b', 'two', 0.25))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert len(calls) == 2

    # validation errors raise on the caller thread, untouched by batching
    try:
        service.generate({'text': '', 'duration': 0.5})
        raise AssertionError('expected ValueError')
    except ValueError:
        pass
    loaders.clear_model_cache()
