"""ctypes bindings to the native C++ audio decoder (native/audio_decode.cc).

Covers the compressed-format half of the reference's ``audio_read``
(audio.py:117-151): mp3/ogg/flac/m4a decode with the reference's 0.1 s
seek pre-roll semantics.  The library is built by ``native/build.sh``
(g++ against the system ffmpeg libs); import fails gracefully when absent.
"""

from __future__ import annotations

import ctypes
import typing as tp
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).resolve().parent.parent.parent / "native" / \
    "libaudiocraft_audio.so"

_lib: tp.Optional[ctypes.CDLL] = None


class NativeDecoderUnavailable(RuntimeError):
    pass


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        raise NativeDecoderUnavailable(
            f"native decoder not built — run {_LIB_PATH.parent}/build.sh")
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.act_decode_audio.restype = ctypes.c_int
    lib.act_decode_audio.argtypes = [
        ctypes.c_char_p, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int]
    lib.act_audio_info.restype = ctypes.c_int
    lib.act_audio_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p, ctypes.c_int]
    lib.act_free_buffer.restype = None
    lib.act_free_buffer.argtypes = [ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeDecoderUnavailable:
        return False


def decode_audio(path: tp.Union[str, Path], seek_time: float = 0.0,
                 duration: float = -1.0) -> tp.Tuple[np.ndarray, int]:
    """Decode any ffmpeg-supported file -> ([C, T] float32, sample_rate)."""
    lib = _load()
    data = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_int64()
    channels = ctypes.c_int()
    sr = ctypes.c_int()
    err = ctypes.create_string_buffer(256)
    ret = lib.act_decode_audio(str(path).encode(), float(seek_time),
                               float(duration), ctypes.byref(data),
                               ctypes.byref(frames), ctypes.byref(channels),
                               ctypes.byref(sr), err, len(err))
    if ret != 0:
        raise RuntimeError(
            f"native decode failed ({ret}) for {path}: "
            f"{err.value.decode(errors='replace')}")
    try:
        n = frames.value * channels.value
        arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
    finally:
        lib.act_free_buffer(data)
    return arr.reshape(frames.value, channels.value).T.copy(), sr.value


#: format -> (encoder name, default bitrate kbps; <=0 = encoder default).
#: mp3 default mirrors the reference audio_write's mp3_rate=320
#: (audio.py:167); ogg follows its audio_write2 "let ffmpeg decide".
#: opus requires 48 kHz input and roundtrips with a ~200-sample head offset
#: (pre-skip bookkeeping) — mp3/ogg/flac/m4a are sample-aligned.
ENCODERS = {
    'mp3': ('libmp3lame', 320),
    'ogg': ('libvorbis', 0),
    'flac': ('flac', 0),
    'm4a': ('aac', 0),
    'opus': ('libopus', 0),
}

#: format -> MIME type, kept next to ENCODERS so the two stay in sync
#: (apps/serve.py response headers use this table).
MIME_TYPES = {
    'wav': 'audio/wav',
    'mp3': 'audio/mpeg',
    'ogg': 'audio/ogg',
    'flac': 'audio/flac',
    'm4a': 'audio/mp4',
    'opus': 'audio/opus',
}


def encode_audio(path: tp.Union[str, Path], wav: np.ndarray, sample_rate: int,
                 format: tp.Optional[str] = None,
                 bitrate_kbps: tp.Optional[int] = None) -> None:
    """Encode [C, T] float32 audio to a compressed file (mp3/ogg/flac/m4a/
    opus).  The write half of the reference's audio_write
    (audio.py:164-228), driven through libavcodec instead of an ffmpeg
    subprocess."""
    lib = _load()
    if not hasattr(lib, "_encode_ready"):
        lib.act_encode_audio.restype = ctypes.c_int
        lib.act_encode_audio.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int]
        lib._encode_ready = True
    assert wav.ndim == 2, "expected [C, T]"
    fmt = format or Path(path).suffix.lstrip('.').lower()
    if fmt not in ENCODERS:
        raise ValueError(f"unsupported encode format {fmt!r} "
                         f"(have {sorted(ENCODERS)})")
    codec_name, default_rate = ENCODERS[fmt]
    rate = default_rate if bitrate_kbps is None else bitrate_kbps
    interleaved = np.ascontiguousarray(wav.T, dtype=np.float32)
    err = ctypes.create_string_buffer(256)
    ret = lib.act_encode_audio(
        str(path).encode(),
        interleaved.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wav.shape[1], wav.shape[0], int(sample_rate), codec_name.encode(),
        int(rate), err, len(err))
    if ret == -3:
        # codec rejected the sample rate (e.g. opus requires 48 kHz): a
        # caller-input error, so raise the same type as an unknown format —
        # apps/serve.py maps ValueError to HTTP 400 rather than 500.
        raise ValueError(
            f"{fmt!r} cannot encode sample_rate={sample_rate}: "
            f"{err.value.decode(errors='replace')}")
    if ret != 0:
        raise RuntimeError(
            f"native encode failed ({ret}) for {path}: "
            f"{err.value.decode(errors='replace')}")


def probe_audio(path: tp.Union[str, Path]) -> tp.Tuple[int, float, int]:
    """(sample_rate, duration_seconds, channels) without decoding."""
    lib = _load()
    dur = ctypes.c_double()
    channels = ctypes.c_int()
    sr = ctypes.c_int()
    err = ctypes.create_string_buffer(256)
    ret = lib.act_audio_info(str(path).encode(), ctypes.byref(dur),
                             ctypes.byref(channels), ctypes.byref(sr),
                             err, len(err))
    if ret != 0:
        raise RuntimeError(
            f"native probe failed ({ret}) for {path}: "
            f"{err.value.decode(errors='replace')}")
    return sr.value, dur.value, channels.value


def decode_audio_batch(paths: tp.Sequence[tp.Union[str, Path]],
                       seek_times: tp.Optional[tp.Sequence[float]] = None,
                       durations: tp.Optional[tp.Sequence[float]] = None,
                       num_threads: int = 8
                       ) -> tp.List[tp.Tuple[np.ndarray, int]]:
    """Parallel batch decode (GIL-free C++ thread pool).

    Returns a list of ([C, T] float32, sample_rate); raises on the first
    failed item.
    """
    lib = _load()
    if not hasattr(lib, "_batch_ready"):
        lib.act_decode_batch.restype = None
        lib.act_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int]
        lib._batch_ready = True
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    c_seeks = (ctypes.c_double * n)(*(seek_times or [0.0] * n))
    c_durs = (ctypes.c_double * n)(*(durations or [-1.0] * n))
    datas = (ctypes.POINTER(ctypes.c_float) * n)()
    frames = (ctypes.c_int64 * n)()
    channels = (ctypes.c_int * n)()
    srs = (ctypes.c_int * n)()
    status = (ctypes.c_int * n)()
    lib.act_decode_batch(c_paths, n, c_seeks, c_durs, datas, frames, channels,
                         srs, status, num_threads)
    out = []
    error = None
    for i in range(n):
        if status[i] != 0:
            error = error or RuntimeError(
                f"native batch decode failed ({status[i]}) for {paths[i]}")
            continue
        count = frames[i] * channels[i]
        arr = np.ctypeslib.as_array(datas[i], shape=(count,)).copy()
        lib.act_free_buffer(datas[i])
        out.append((arr.reshape(frames[i], channels[i]).T.copy(), srs[i]))
    if error is not None:
        raise error
    return out
