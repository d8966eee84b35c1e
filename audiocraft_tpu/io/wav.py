"""WAV (RIFF) read/write in pure numpy — no external audio libraries.

Covers the roles of ``audio_read`` / ``audio_write``
(/root/reference/audiocraft/data/audio.py:117-228) for the formats this
environment can decode natively.  PCM 16/24/32-bit and float32 WAVs are
supported, with seek/duration semantics matching ``audio_read(filepath,
seek_time, duration)``.  (The reference shells out to ffmpeg/soundfile/PyAV;
none exist here — compressed formats are handled by the optional native
decoder in later rounds.)
"""

from __future__ import annotations

import struct
import typing as tp
from pathlib import Path

import numpy as np

from .audio_utils import f32_pcm, i16_pcm, normalize_audio


def _parse_wav_header(data: bytes):
    assert data[:4] == b'RIFF' and data[8:12] == b'WAVE', "not a RIFF/WAVE file"
    pos = 12
    fmt = None
    while pos + 8 <= len(data):
        chunk_id = data[pos:pos + 4]
        size = struct.unpack('<I', data[pos + 4:pos + 8])[0]
        body = pos + 8
        if chunk_id == b'fmt ':
            (audio_format, channels, sample_rate, _, block_align,
             bits) = struct.unpack('<HHIIHH', data[body:body + 16])
            fmt = dict(format=audio_format, channels=channels,
                       sample_rate=sample_rate, block_align=block_align,
                       bits=bits)
        elif chunk_id == b'data':
            assert fmt is not None, "data chunk before fmt chunk"
            return fmt, body, size
        pos = body + size + (size & 1)
    raise ValueError("no data chunk found")


def wav_read(filepath: tp.Union[str, Path], seek_time: float = 0.0,
             duration: float = -1.0) -> tp.Tuple[np.ndarray, int]:
    """Read a wav file -> (wav [C, T] float32 in [-1, 1], sample_rate)."""
    data = Path(filepath).read_bytes()
    fmt, body, size = _parse_wav_header(data)
    sr = fmt['sample_rate']
    ch = fmt['channels']
    bits = fmt['bits']
    frame_bytes = fmt['block_align']
    n_frames = size // frame_bytes

    start = int(seek_time * sr) if seek_time else 0
    start = min(start, n_frames)
    count = n_frames - start
    if duration > 0:
        count = min(count, int(duration * sr))
    raw = data[body + start * frame_bytes: body + (start + count) * frame_bytes]

    if fmt['format'] == 3:  # IEEE float
        arr = np.frombuffer(raw, dtype='<f4').astype(np.float32)
    elif bits == 16:
        arr = f32_pcm(np.frombuffer(raw, dtype='<i2'))
    elif bits == 32:
        arr = f32_pcm(np.frombuffer(raw, dtype='<i4'))
    elif bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        i32 = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
               | (b[:, 2].astype(np.int32) << 16))
        i32 = np.where(i32 >= 1 << 23, i32 - (1 << 24), i32)
        arr = (i32.astype(np.float32) / (1 << 23))
    else:
        raise ValueError(f"unsupported wav: format={fmt['format']} bits={bits}")
    return arr.reshape(-1, ch).T.copy(), sr


def wav_write(wav: np.ndarray, filepath: tp.Union[str, Path], sample_rate: int,
              dtype: str = 'int16') -> None:
    """Write [C, T] float32 audio as PCM wav."""
    assert wav.ndim == 2, "expected [C, T]"
    C, T = wav.shape
    if dtype == 'int16':
        data = i16_pcm(np.asarray(wav)).T.reshape(-1)
        byte_data = data.astype('<i2').tobytes()
        bits, fmt_code = 16, 1
    elif dtype == 'float32':
        byte_data = np.asarray(wav, np.float32).T.reshape(-1).astype('<f4').tobytes()
        bits, fmt_code = 32, 3
    else:
        raise ValueError(dtype)
    block_align = C * bits // 8
    byte_rate = sample_rate * block_align
    header = b'RIFF' + struct.pack('<I', 36 + len(byte_data)) + b'WAVE'
    header += b'fmt ' + struct.pack('<IHHIIHH', 16, fmt_code, C, sample_rate,
                                    byte_rate, block_align, bits)
    header += b'data' + struct.pack('<I', len(byte_data))
    path = Path(filepath)
    tmp = path.with_suffix(path.suffix + '.tmp')
    try:
        tmp.write_bytes(header + byte_data)
        tmp.rename(path)
    except Exception:
        # half-written file cleanup (reference audio.py:221-227)
        if tmp.exists():
            tmp.unlink()
        raise


def audio_info(filepath: tp.Union[str, Path]) -> tp.Tuple[int, float, int]:
    """(sample_rate, duration_seconds, channels) without reading samples."""
    path = Path(filepath)
    if path.suffix.lower() == '.wav':
        data = path.read_bytes()
        fmt, _, size = _parse_wav_header(data)
        n_frames = size // fmt['block_align']
        return fmt['sample_rate'], n_frames / fmt['sample_rate'], fmt['channels']
    from .native import probe_audio
    return probe_audio(path)


def audio_read(filepath: tp.Union[str, Path], seek_time: float = 0.0,
               duration: float = -1.0, pad: bool = False
               ) -> tp.Tuple[np.ndarray, int]:
    """Dispatching reader (reference audio.py:117-151).  WAV natively; other
    containers via the optional native decoder when present."""
    path = Path(filepath)
    suffix = path.suffix.lower()
    if suffix == '.wav':
        wav, sr = wav_read(path, seek_time, duration)
    else:
        # compressed formats via the native C++ decoder (mp3/ogg/flac/m4a...)
        from .native import decode_audio
        wav, sr = decode_audio(path, seek_time, duration)
    if pad and duration > 0:
        expected = int(duration * sr)
        if wav.shape[-1] < expected:
            wav = np.pad(wav, ((0, 0), (0, expected - wav.shape[-1])))
    return wav, sr


def audio_write(stem_name: tp.Union[str, Path], wav: np.ndarray,
                sample_rate: int, format: str = 'wav',
                mp3_rate: int = 320, ogg_rate: tp.Optional[int] = None,
                normalize: bool = True, strategy: str = 'peak',
                peak_clip_headroom_db: float = 1.0,
                rms_headroom_db: float = 18.0,
                loudness_headroom_db: float = 14.0,
                loudness_compressor: bool = False,
                make_parent_dir: bool = True,
                add_suffix: bool = True) -> Path:
    """Normalize-and-write (reference audio.py:164-228 / audio_write2).

    ``format``: 'wav' (pure-numpy PCM writer) or 'mp3'/'ogg'/'flac'/'m4a'/
    'opus' through the native libavcodec encoder.  ``mp3_rate``/``ogg_rate``
    are kbps (ogg None = encoder default, matching audio_write2)."""
    import jax.numpy as jnp
    assert wav.dtype.kind == 'f', "wav is not a floating point array"
    assert wav.ndim in (1, 2), "wav should be [C, T] or [T]"
    if wav.ndim == 1:
        wav = wav[None]
    wav = np.asarray(normalize_audio(
        jnp.asarray(wav), normalize=normalize, strategy=strategy,
        peak_clip_headroom_db=peak_clip_headroom_db,
        rms_headroom_db=rms_headroom_db,
        loudness_headroom_db=loudness_headroom_db,
        loudness_compressor=loudness_compressor, sample_rate=sample_rate))
    path = Path(str(stem_name) + (f'.{format}' if add_suffix else ''))
    if make_parent_dir:
        path.parent.mkdir(exist_ok=True, parents=True)
    if format == 'wav':
        wav_write(wav, path, sample_rate)
        return path
    from .native import encode_audio
    bitrate = {'mp3': mp3_rate, 'ogg': ogg_rate}.get(format)
    try:
        encode_audio(path, wav, sample_rate, format=format,
                     bitrate_kbps=bitrate)
    except Exception:
        # no half-written files (reference audio.py:221-227)
        if path.exists():
            path.unlink()
        raise
    return path
