"""REST generation server — headless counterpart of the fork's Gradio
`predict`/`predict_simple` API (/root/reference/app.py:244-675), stdlib-only.

    python -m audiocraft_tpu.apps.serve [--port 8000] [--model debug]
        [--cache-dir DIR]

GET  /health    -> {"status": "ok", "model": "<name>"}
GET  /models    -> {"models": [...], "current": "<name>"}
POST /generate  -> audio/wav bytes, or a history-JSON document

POST body (all optional except "text"):
    {"text": "...", "model": "debug", "duration": 5, "seed": -1,
     "topk": 250, "topp": 0.0, "temperature": 1.0, "cfg_coef": 3.0,
     "melody_wav": "<base64 WAV>",     # melody conditioning
     "prompt_wav": "<base64 WAV>",     # continuation from this audio
     "title": "...",                    # embedded in history metadata
     "return_history_json": false}

Mirrors the reference `predict_simple` parameter surface (app.py:593-675):
model choice, sampling params, seed (-1 = random), melody/continuation, and
the `return_history_json` response mode ({audio_b64, seed, metadata}).
"""

from __future__ import annotations

import argparse
import base64
import json
import struct
import tempfile
import threading
import typing as tp
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _wav_bytes(wav, sample_rate: int) -> bytes:
    import numpy as np
    from ..io.audio_utils import i16_pcm
    data = i16_pcm(np.asarray(wav)).T.reshape(-1).astype('<i2').tobytes()
    C = wav.shape[0]
    block_align = C * 2
    header = b'RIFF' + struct.pack('<I', 36 + len(data)) + b'WAVE'
    header += b'fmt ' + struct.pack('<IHHIIHH', 16, 1, C, sample_rate,
                                    sample_rate * block_align, block_align, 16)
    header += b'data' + struct.pack('<I', len(data))
    return header + data


def _decode_wav_b64(b64: str):
    """base64 WAV -> (np.ndarray [C, T] float32, sample_rate)."""
    from ..io.wav import wav_read
    raw = base64.b64decode(b64)
    with tempfile.NamedTemporaryFile(suffix='.wav') as tmp:
        tmp.write(raw)
        tmp.flush()
        return wav_read(tmp.name)


class _Slot:
    """One submitted request awaiting its batched result."""

    def __init__(self, req: dict, group: tp.Any):
        self.req = req
        self.group = group
        self.event = threading.Event()
        self.result: tp.Optional[dict] = None
        self.error: tp.Optional[Exception] = None


class _Batcher:
    """Continuous batching: coalesce concurrent compatible requests into one
    batched facade ``generate`` call.

    Decode throughput is batch-friendly (PERF.md: 26× aggregate realtime at
    2 streams vs 39.5× at 8 on one chip), so a serving window of a few tens
    of ms multiplies throughput under concurrency without hurting the empty
    -queue latency by more than the window.  Requests are compatible when
    their (model, duration, sampling params) match — the per-call facade
    state; melody/continuation requests run as singleton batches through
    the same worker (keeps one generation in flight per device).
    """

    def __init__(self, service: 'GenerationService', window_s: float,
                 max_batch: int):
        import queue
        self.service = service
        self.window_s = window_s
        self.max_batch = max_batch
        self.queue: 'queue.Queue[_Slot]' = queue.Queue()
        self._carry: tp.Optional[_Slot] = None
        self.worker = threading.Thread(target=self._run, daemon=True)
        self.worker.start()

    def submit(self, req: dict, group: tp.Any) -> dict:
        slot = _Slot(req, group)
        self.queue.put(slot)
        slot.event.wait()
        if slot.error is not None:
            raise slot.error
        assert slot.result is not None
        return slot.result

    def _collect(self) -> tp.List[_Slot]:
        import queue as queue_mod
        import time as time_mod
        first = self._carry or self.queue.get()
        self._carry = None
        batch = [first]
        # singleton groups (melody/continuation) never coalesce
        if first.group is None:
            return batch
        deadline = time_mod.monotonic() + self.window_s
        while len(batch) < self.max_batch:
            remaining = deadline - time_mod.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self.queue.get(timeout=remaining)
            except queue_mod.Empty:
                break
            if nxt.group == first.group:
                batch.append(nxt)
            else:
                # incompatible: becomes the seed of the next batch
                self._carry = nxt
                break
        return batch

    def _run(self):
        while True:
            batch = self._collect()
            try:
                results = self.service.generate_batch(
                    [s.req for s in batch])
                for slot, res in zip(batch, results):
                    slot.result = res
            except Exception as exc:  # surface to every waiter
                for slot in batch:
                    slot.error = exc
            finally:
                for slot in batch:
                    slot.event.set()


class GenerationService:
    """Model cache + request execution, separately testable from HTTP."""

    def __init__(self, default_model: str = 'debug',
                 cache_dir: tp.Optional[str] = None,
                 quantize: tp.Union[bool, str] = False,
                 batch_window_ms: float = 0.0, max_batch: int = 8,
                 kv_dtype: tp.Optional[str] = None):
        self.default_model = default_model
        self.cache_dir = cache_dir
        # False | 'int8' | 'int4' (True kept as an alias for 'int8')
        self.quantize = 'int8' if quantize is True else quantize
        # 'int8' stores decode KV caches quantized (PERF.md: +14 % e2e
        # generate at B=2 on top of int8 weights); None = float caches
        self.kv_dtype = kv_dtype
        self.lock = threading.Lock()
        self.current_name = default_model
        self.batcher = (_Batcher(self, batch_window_ms / 1e3, max_batch)
                        if batch_window_ms > 0 else None)

    def models(self) -> tp.List[str]:
        from ..ckpt.loaders import list_local_models
        return list_local_models(self.cache_dir)

    @staticmethod
    def _lm_is_quantized(model) -> bool:
        """True if any LM weight leaf is already in a quantized format.
        Inspecting the params (not a name set) stays correct when the
        loader's LRU cache evicts and rebuilds a model."""
        def walk(node):
            if isinstance(node, dict):
                if 'q' in node or 'q4p' in node:
                    return True
                return any(walk(v) for v in node.values())
            return False
        return walk(model.lm_params)

    def _get_model(self, name: tp.Optional[str]):
        from ..ckpt.loaders import load_model
        name = name or self.current_name
        model = load_model(name, self.cache_dir)
        if self.quantize and not self._lm_is_quantized(model):
            # weight-only int8/int4 decode (PERF.md: int8 is 1.38x over bf16)
            model.quantize_lm_weights(mode=self.quantize)
        if self.kv_dtype and model.kv_dtype != self.kv_dtype:
            model.kv_dtype = self.kv_dtype
            # bucketed KV growth rides along with the quantized-cache serving
            # recipe (token-exact; see MusicGen.optimize_for_serving)
            model.kv_buckets = 'auto'
            model.__dict__.pop('_gen_jit_cache', None)
        self.current_name = name
        return model

    @staticmethod
    def _parse(req: dict) -> dict:
        """Validate a request; returns the parsed fields.  Raises ValueError
        on bad input."""
        import numpy as np
        text = req.get('text', '')
        if not text:
            raise ValueError('missing "text"')
        duration = float(req.get('duration', 5.0))
        if not 0 < duration <= 720:
            raise ValueError('duration must be in (0, 720]')
        seed = int(req.get('seed', -1))
        if seed < 0:
            seed = int(np.random.randint(0, 2 ** 31 - 1))
        return {
            'text': text, 'duration': duration, 'seed': seed,
            'topk': int(req.get('topk', req.get('top_k', 250))),
            'topp': float(req.get('topp', req.get('top_p', 0.0))),
            'temperature': float(req.get('temperature', 1.0)),
            'cfg_coef': float(req.get('cfg_coef', 3.0)),
            'melody': req.get('melody_wav'),
            'prompt': req.get('prompt_wav'),
            'title': req.get('title', ''),
            'model': req.get('model'),
        }

    @staticmethod
    def _group_key(p: dict) -> tp.Optional[tuple]:
        """Batching compatibility key; None = must run alone."""
        if p['melody'] is not None or p['prompt'] is not None:
            return None
        return (p['model'], p['duration'], p['topk'], p['topp'],
                p['temperature'], p['cfg_coef'])

    def generate(self, req: dict) -> dict:
        """Validated request dict -> {"wav": np[C,T], "sample_rate", "seed",
        "metadata"}.  Raises ValueError on bad input.

        With ``batch_window_ms > 0``, concurrent compatible requests
        coalesce into one batched facade call (continuous batching)."""
        if self.batcher is not None:
            parsed = self._parse(req)     # validate on the caller thread
            return self.batcher.submit(req, self._group_key(parsed))
        return self.generate_batch([req])[0]

    def generate_batch(self, reqs: tp.List[dict]) -> tp.List[dict]:
        """Run a list of compatible requests as ONE facade generate call.
        When batched (len > 1) the sampling key derives from the first
        request's seed; each response's metadata records the shared seed,
        its batch index, and the batch size.

        The batch is padded to the next power-of-two bucket (repeating the
        first prompt) so only log2(max_batch)+1 distinct generate programs
        ever compile — coalesced batches arrive at arbitrary sizes, and an
        unpadded size triggers a fresh multi-second XLA compile per size
        (measured: 8 mixed-size batches took 15.8 s vs 0.2 s warm)."""
        import jax
        import numpy as np

        ps = [self._parse(r) for r in reqs]
        lead = ps[0]
        texts = [p['text'] for p in ps]
        n_real = len(texts)
        bucket = 1
        while bucket < n_real:
            bucket *= 2
        texts = texts + [texts[0]] * (bucket - n_real)
        with self.lock:  # one generation at a time per device
            model = self._get_model(lead['model'])
            model.set_generation_params(
                duration=lead['duration'], top_k=lead['topk'],
                top_p=lead['topp'], temperature=lead['temperature'],
                cfg_coef=lead['cfg_coef'],
                extend_stride=min(10.0, model.max_duration / 2))
            key = jax.random.PRNGKey(lead['seed'])
            if lead['prompt'] is not None:
                assert len(ps) == 1  # singleton group
                p_wav, p_sr = _decode_wav_b64(lead['prompt'])
                m_wavs, m_sr = None, None
                if lead['melody'] is not None:
                    m_wav, m_sr = _decode_wav_b64(lead['melody'])
                    m_wavs = [m_wav]
                wavs = model.generate_continuation(
                    p_wav[None], p_sr, texts, melody_wavs=m_wavs,
                    melody_sample_rate=m_sr, key=key)
            elif lead['melody'] is not None:
                assert len(ps) == 1
                m_wav, m_sr = _decode_wav_b64(lead['melody'])
                wavs = model.generate_with_chroma(texts, [m_wav], m_sr,
                                                  key=key)
            else:
                wavs = model.generate(texts, key=key)
            sample_rate = model.sample_rate
            name = model.name

        out = []
        for i, p in enumerate(ps):
            metadata = {
                'prompt': p['text'], 'model': name, 'Seed': lead['seed'],
                'duration': p['duration'], 'topk': p['topk'],
                'topp': p['topp'], 'temperature': p['temperature'],
                'cfg_coef': p['cfg_coef'], 'title': p['title'],
                'melody_condition': p['melody'] is not None,
                'continuation': p['prompt'] is not None,
            }
            if len(ps) > 1:
                metadata['batch_index'] = i
                metadata['batch_size'] = len(ps)
            out.append({'wav': np.asarray(wavs[i]),
                        'sample_rate': sample_rate,
                        'seed': lead['seed'], 'metadata': metadata})
        return out


def make_handler(service: GenerationService):
    from ..utils.misc import enable_compilation_cache
    enable_compilation_cache()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/health':
                self._json(200, {'status': 'ok',
                                 'model': service.current_name})
            elif self.path == '/models':
                self._json(200, {'models': service.models(),
                                 'current': service.current_name})
            else:
                self._json(404, {'error': 'not found'})

        def do_POST(self):
            if self.path != '/generate':
                self._json(404, {'error': 'not found'})
                return
            try:
                length = int(self.headers.get('Content-Length', 0))
                req = json.loads(self.rfile.read(length) or b'{}')
                result = service.generate(req)
            except (ValueError, json.JSONDecodeError) as exc:
                self._json(400, {'error': str(exc)})
                return
            except FileNotFoundError as exc:
                self._json(404, {'error': str(exc)})
                return
            fmt = str(req.get('return_format', 'wav')).lower()
            if fmt == 'wav':
                body = _wav_bytes(result['wav'], result['sample_rate'])
                mime = 'audio/wav'
            else:
                # compressed response via the native libavcodec encoder
                # (reference audio_write mp3/ogg/flac, audio.py:164-228)
                try:
                    from ..io.native import MIME_TYPES, encode_audio
                    with tempfile.NamedTemporaryFile(
                            suffix=f'.{fmt}') as tmp:
                        encode_audio(tmp.name, result['wav'],
                                     result['sample_rate'], format=fmt)
                        body = open(tmp.name, 'rb').read()
                except ValueError as exc:
                    # unknown format OR codec/sample-rate mismatch (e.g.
                    # opus at 32 kHz): client error, not a server fault
                    self._json(400, {'error': str(exc)})
                    return
                except Exception as exc:
                    self._json(500, {'error': f'encode failed: {exc}'})
                    return
                mime = MIME_TYPES.get(fmt, 'application/octet-stream')
            if req.get('return_video'):
                # animated-waveform MP4 with embedded metadata (reference
                # make_waveform + mutagen path, modules/gradio.py:35-273)
                try:
                    from ..io.titlecard import settings_text
                    from ..io.video import make_waveform_video
                    with tempfile.NamedTemporaryFile(suffix='.mp4') as tmp:
                        make_waveform_video(
                            tmp.name, result['wav'], result['sample_rate'],
                            metadata={'title': req.get('title', ''),
                                      'comment': settings_text(
                                          result['metadata'])},
                            title=req.get('title', ''),
                            settings=settings_text(result['metadata']),
                            background=req.get('background'))
                        video = open(tmp.name, 'rb').read()
                except Exception as exc:
                    self._json(500, {'error': f'video mux failed: {exc}'})
                    return
                self.send_response(200)
                self.send_header('Content-Type', 'video/mp4')
                self.send_header('X-Seed', str(result['seed']))
                self.send_header('Content-Length', str(len(video)))
                self.end_headers()
                self.wfile.write(video)
                return
            if req.get('return_history_json'):
                self._json(200, {
                    'audio_b64': base64.b64encode(body).decode(),
                    'seed': result['seed'],
                    'metadata': result['metadata'],
                })
                return
            self.send_response(200)
            self.send_header('Content-Type', mime)
            self.send_header('X-Seed', str(result['seed']))
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--port', type=int, default=8000)
    parser.add_argument('--host', default='127.0.0.1')
    parser.add_argument('--model', default='debug')
    parser.add_argument('--cache-dir', default=None)
    parser.add_argument('--quantize', nargs='?', const='int8', default=False,
                        choices=['int8', 'int4'],
                        help='weight-only quantized LM decode (faster; '
                             'bare flag means int8; see PERF.md)')
    parser.add_argument('--batch-window', type=float, default=0.0,
                        metavar='MS',
                        help='continuous batching: coalesce concurrent '
                             'compatible requests for up to MS milliseconds '
                             'into one batched generate (0 = off)')
    parser.add_argument('--max-batch', type=int, default=8,
                        help='max requests per coalesced batch')
    parser.add_argument('--kv-int8', action='store_true',
                        help='int8 KV-cache decode (+14%% e2e generate at '
                             'B=2 on top of --quantize int8; see PERF.md)')
    args = parser.parse_args(argv)

    service = GenerationService(args.model, args.cache_dir,
                                quantize=args.quantize,
                                batch_window_ms=args.batch_window,
                                max_batch=args.max_batch,
                                kv_dtype='int8' if args.kv_int8 else None)
    service._get_model(args.model)  # fail fast + warm the cache
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(service))
    print(f"serving on http://{args.host}:{args.port} "
          f"(model: {service.current_name})")
    server.serve_forever()


if __name__ == '__main__':
    main()
