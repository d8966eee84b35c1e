"""IO + dataset tests: wav roundtrip, resample parity with torch baseline,
manifests, dataset sampling/collation (reference tests/data/*)."""

import numpy as np
import pytest

import jax.numpy as jnp

from audiocraft_tpu.io.wav import (audio_info, audio_read, audio_write,
                                   wav_read, wav_write)
from audiocraft_tpu.io.resample import resample_frac
from audiocraft_tpu.io.audio_utils import (apply_fade, apply_tafade,
                                           convert_audio_channels, f32_pcm,
                                           i16_pcm, normalize_audio)
from audiocraft_tpu.data.audio_dataset import (AudioDataset, AudioMeta,
                                               find_audio_files,
                                               load_audio_meta,
                                               save_audio_meta)


def _sine(sr=32000, secs=1.0, ch=1, freq=440.0):
    t = np.arange(int(sr * secs)) / sr
    wav = 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32)
    return np.tile(wav, (ch, 1))


def test_wav_roundtrip_int16(tmp_path):
    wav = _sine(ch=2)
    p = tmp_path / "test.wav"
    wav_write(wav, p, 32000)
    back, sr = wav_read(p)
    assert sr == 32000
    assert back.shape == wav.shape
    np.testing.assert_allclose(back, wav, atol=1 / (2 ** 15) + 1e-6)


def test_wav_roundtrip_float32(tmp_path):
    wav = _sine()
    p = tmp_path / "test.wav"
    wav_write(wav, p, 16000, dtype='float32')
    back, sr = wav_read(p)
    np.testing.assert_allclose(back, wav, atol=0)


def test_wav_seek_duration(tmp_path):
    wav = _sine(secs=2.0)
    p = tmp_path / "t.wav"
    wav_write(wav, p, 32000, dtype='float32')
    seg, sr = wav_read(p, seek_time=0.5, duration=1.0)
    assert seg.shape[-1] == 32000
    np.testing.assert_allclose(seg, wav[:, 16000:48000], atol=0)
    sr2, dur, ch = audio_info(p)
    assert sr2 == 32000 and ch == 1 and abs(dur - 2.0) < 1e-6


def test_resample_vs_scipy_quality():
    """Downsample a band-limited sine: must stay a clean sine (SNR check)."""
    sr1, sr2 = 32000, 16000
    wav = _sine(sr=sr1, secs=1.0, freq=440.0)
    out = np.asarray(resample_frac(jnp.asarray(wav), sr1, sr2))
    assert out.shape[-1] == 16000
    t = np.arange(out.shape[-1]) / sr2
    ref = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    err = out[0, 200:-200] - ref[200:-200]
    snr = 10 * np.log10(np.mean(ref ** 2) / np.mean(err ** 2))
    assert snr > 40, f"resample SNR too low: {snr:.1f} dB"


def test_resample_matches_julius_shapes():
    for old, new, n in [(44100, 32000, 44100), (16000, 24000, 8000),
                        (32000, 32000, 100)]:
        wav = np.random.RandomState(0).randn(2, n).astype(np.float32)
        out = np.asarray(resample_frac(jnp.asarray(wav), old, new))
        import math
        expected = int(math.ceil(new // math.gcd(old, new) * n
                                 / (old // math.gcd(old, new))))
        assert out.shape == (2, expected)


def test_convert_audio_channels():
    wav = jnp.asarray(np.random.randn(2, 100).astype(np.float32))
    mono = convert_audio_channels(wav, 1)
    assert mono.shape == (1, 100)
    stereo = convert_audio_channels(mono, 2)
    assert stereo.shape == (2, 100)
    np.testing.assert_allclose(np.asarray(stereo[0]), np.asarray(stereo[1]))


def test_pcm_roundtrip():
    wav = _sine()[0]
    i16 = i16_pcm(wav)
    assert i16.dtype == np.int16
    back = f32_pcm(i16)
    np.testing.assert_allclose(back, wav, atol=1 / (2 ** 15) + 1e-6)


@pytest.mark.parametrize("strategy", ["peak", "clip", "rms", "loudness"])
def test_normalize_strategies(strategy):
    wav = jnp.asarray(_sine() * 3.0)
    out = normalize_audio(wav, strategy=strategy, sample_rate=32000)
    assert np.isfinite(np.asarray(out)).all()
    if strategy in ("clip", "rms", "loudness"):
        assert float(jnp.abs(out).max()) <= 1.0 + 1e-6


def test_fades():
    wav = jnp.ones((1, 32000))
    faded = apply_tafade(wav, 32000, duration=0.5, out=True, start=False)
    arr = np.asarray(faded)
    assert arr[0, 0] == 1.0
    assert arr[0, -1] < 1e-6
    faded2 = apply_fade(wav, 32000, duration=0.5, out=False, start=True,
                        curve_start=0.0, curve_end=1.0)
    assert np.asarray(faded2)[0, 0] == 0.0


def test_audio_write_normalizes(tmp_path):
    wav = _sine() * 2.5
    p = audio_write(tmp_path / "loud", wav, 32000, strategy='peak')
    back, _ = wav_read(p)
    assert np.abs(back).max() <= 1.0


@pytest.mark.parametrize("fmt", ["mp3", "ogg", "flac", "m4a"])
def test_audio_write_compressed_roundtrip(tmp_path, fmt):
    """Compressed audio_write (reference audio.py:164-228 / audio_write2:
    wav+mp3/ogg/flac; m4a is a bonus) roundtrips through our own reader
    sample-aligned: correlation of the decoded wave against the normalized
    input stays ~1 over the interior."""
    from audiocraft_tpu.io.native import available
    if not available():
        pytest.skip("native codec library not built")
    sr = 32000
    t = np.arange(sr, dtype=np.float32) / sr
    wav = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                    0.5 * np.sin(2 * np.pi * 660 * t)])
    p = audio_write(tmp_path / f"rt_{fmt}", wav, sr, format=fmt,
                    strategy='peak')
    assert p.suffix == f'.{fmt}'
    back, sr2 = audio_read(p)
    assert sr2 == sr and back.shape[0] == 2
    n = min(back.shape[1], wav.shape[1])
    assert n > sr * 0.95  # length preserved within codec padding
    for ch in range(2):
        corr = np.corrcoef(back[ch, 1000:n - 1000],
                           wav[ch, 1000:n - 1000])[0, 1]
        assert corr > 0.995, (fmt, ch, corr)


def test_audio_write_compressed_no_half_files(tmp_path):
    """A failed encode must not leave a half-written file behind
    (reference audio.py:221-227)."""
    from audiocraft_tpu.io.native import available
    if not available():
        pytest.skip("native codec library not built")
    wav = _sine()
    # libmp3lame does not support 7000 Hz -> native encoder errors out
    with pytest.raises(Exception):
        audio_write(tmp_path / "bad", wav, 7000, format='mp3')
    assert not (tmp_path / "bad.mp3").exists()


def test_audio_write_unknown_format(tmp_path):
    with pytest.raises(ValueError):
        audio_write(tmp_path / "x", _sine(), 32000, format='xm')


# ------------------------------------------------------------------ dataset

def _make_corpus(tmp_path, n=5, sr=16000):
    metas = []
    for i in range(n):
        secs = 0.5 + 0.25 * i
        wav = _sine(sr=sr, secs=secs, freq=200 + 50 * i)
        p = tmp_path / f"clip{i}.wav"
        wav_write(wav, p, sr)
        metas.append(AudioMeta(str(p), secs, sr))
    return metas


def test_meta_save_load(tmp_path):
    metas = _make_corpus(tmp_path)
    mp = tmp_path / "data.jsonl"
    save_audio_meta(mp, metas)
    back = load_audio_meta(mp)
    assert [m.path for m in back] == [m.path for m in metas]
    gz = tmp_path / "data.jsonl.gz"
    save_audio_meta(gz, metas)
    assert [m.duration for m in load_audio_meta(gz)] == \
           [m.duration for m in metas]


def test_find_audio_files(tmp_path):
    _make_corpus(tmp_path)
    metas = find_audio_files(tmp_path, workers=2)
    assert len(metas) == 5
    assert all(m.sample_rate == 16000 for m in metas)


def test_dataset_segment_sampling(tmp_path):
    metas = _make_corpus(tmp_path)
    ds = AudioDataset(metas, segment_duration=0.4, num_samples=8,
                      sample_rate=16000, channels=1, return_info=True,
                      shuffle=True)
    ds.start_epoch(0)
    wav, info = ds[0]
    assert wav.shape == (1, 6400)
    assert info.total_frames == 6400
    # deterministic for a fixed epoch
    wav2, _ = ds[0]
    np.testing.assert_array_equal(wav, wav2)
    ds.start_epoch(1)
    wav3, _ = ds[0]
    assert not np.array_equal(wav, wav3)


def test_dataset_batching_and_sharding(tmp_path):
    metas = _make_corpus(tmp_path)
    ds = AudioDataset(metas, segment_duration=0.25, num_samples=8,
                      sample_rate=16000, channels=1, shuffle=False)
    batches = list(ds.iter_batches(batch_size=4))
    assert len(batches) == 2 and batches[0].shape == (4, 1, 4000)
    # two-process sharding covers disjoint halves of each global batch
    b0 = list(ds.iter_batches(batch_size=4, process_index=0, process_count=2))
    b1 = list(ds.iter_batches(batch_size=4, process_index=1, process_count=2))
    assert b0[0].shape == (2, 1, 4000)
    np.testing.assert_array_equal(np.concatenate([b0[0], b1[0]]), batches[0])


def test_dataset_duration_filters(tmp_path):
    metas = _make_corpus(tmp_path)
    ds = AudioDataset(metas, segment_duration=0.2, min_audio_duration=0.8,
                      sample_rate=16000, channels=1)
    assert all(m.duration >= 0.8 for m in ds.meta)


def test_dataset_full_file_mode(tmp_path):
    metas = _make_corpus(tmp_path, n=3)
    ds = AudioDataset(metas, segment_duration=None, sample_rate=16000,
                      channels=1, return_info=True)
    assert len(ds) == 3
    wav, info = ds[1]
    assert info.n_frames == wav.shape[-1]


def test_native_decoder_assets():
    from audiocraft_tpu.io.native import (available, decode_audio,
                                          decode_audio_batch, probe_audio)
    if not available():
        pytest.skip("native decoder not built")
    bach = "/root/reference/assets/bach.mp3"
    sr, dur, ch = probe_audio(bach)
    assert sr == 44100 and ch == 2 and 9 < dur < 11
    wav, sr2 = decode_audio(bach)
    assert sr2 == sr and wav.shape[0] == 2 and wav.shape[1] > 400000
    # seeked read aligns sample-exactly with the full decode
    seg, _ = decode_audio(bach, seek_time=1.0, duration=2.0)
    np.testing.assert_array_equal(seg, wav[:, sr:sr + seg.shape[1]])
    # parallel batch decode returns identical results
    outs = decode_audio_batch([bach, bach], num_threads=2)
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][0], wav)


def test_audio_read_mp3_dispatch():
    from audiocraft_tpu.io.wav import audio_read
    wav, sr = audio_read("/root/reference/assets/bach.mp3", seek_time=0.5,
                         duration=1.0)
    assert sr == 44100 and wav.shape == (2, 44100)


def test_environment_dataset_mappers(tmp_path, monkeypatch):
    """Cluster dataset-path mapping (reference environment.py:112-176):
    regex mappers from the team yaml rewrite manifest paths, //reference
    resolves against the configured reference_dir, env vars override."""
    from audiocraft_tpu.utils.misc import AudioCraftEnvironment
    from audiocraft_tpu.data.info_audio_dataset import clusterify_all_meta
    from audiocraft_tpu.data.zip import PathInZip

    cfg = tmp_path / 'team.yaml'
    cfg.write_text(
        'mycluster:\n'
        '  reference_dir: /mnt/shared/ref\n'
        '  dora_dir: /mnt/shared/xps\n'
        '  dataset_mappers:\n'
        '    "^/old_cluster/data": "/new_cluster/data"\n'
        '    "\\\\.flac$": ".wav"\n')
    monkeypatch.setenv('AUDIOCRAFT_CONFIG', str(cfg))
    monkeypatch.setenv('AUDIOCRAFT_CLUSTER', 'mycluster')
    monkeypatch.delenv('AUDIOCRAFT_REFERENCE_DIR', raising=False)
    AudioCraftEnvironment.reset()
    try:
        assert AudioCraftEnvironment.get_cluster() == 'mycluster'
        assert AudioCraftEnvironment.apply_dataset_mappers(
            '/old_cluster/data/song.flac') == '/new_cluster/data/song.wav'
        # untouched when no rule matches
        assert AudioCraftEnvironment.apply_dataset_mappers(
            '/elsewhere/x.mp3') == '/elsewhere/x.mp3'
        assert AudioCraftEnvironment.resolve_reference_path(
            '//reference/manifests/train.jsonl') == \
            '/mnt/shared/ref/manifests/train.jsonl'
        assert AudioCraftEnvironment.get_dora_dir() == '/mnt/shared/xps'
        # the dataset hook applies mappers to path AND zip info path
        metas = [AudioMeta(path='/old_cluster/data/a.flac', duration=1.0,
                           sample_rate=16000,
                           info_path=PathInZip('/old_cluster/data/a.zip:a.json'))]
        out = clusterify_all_meta(metas)
        assert out[0].path == '/new_cluster/data/a.wav'
        assert out[0].info_path.zip_path == '/new_cluster/data/a.zip'
        # env var beats the config
        monkeypatch.setenv('AUDIOCRAFT_REFERENCE_DIR', '/override')
        assert AudioCraftEnvironment.resolve_reference_path(
            '//reference/x') == '/override/x'
    finally:
        AudioCraftEnvironment.reset()


def test_environment_defaults_without_config(monkeypatch):
    from audiocraft_tpu.utils.misc import AudioCraftEnvironment
    monkeypatch.delenv('AUDIOCRAFT_CONFIG', raising=False)
    monkeypatch.delenv('AUDIOCRAFT_CLUSTER', raising=False)
    monkeypatch.delenv('SLURM_JOB_ID', raising=False)
    monkeypatch.delenv('SLURM_NODELIST', raising=False)
    monkeypatch.delenv('TPU_WORKER_HOSTNAMES', raising=False)
    monkeypatch.delenv('JAX_COORDINATOR_ADDRESS', raising=False)
    AudioCraftEnvironment.reset()
    try:
        assert AudioCraftEnvironment.get_cluster() == 'local'
        assert AudioCraftEnvironment.get_team() == 'default'
        p = '/plain/path.wav'
        assert AudioCraftEnvironment.apply_dataset_mappers(p) == p
    finally:
        AudioCraftEnvironment.reset()
