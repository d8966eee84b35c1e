"""Minimal REST generation server — the headless counterpart of the fork's
Gradio `predict_simple` API (/root/reference/app.py:244-675), stdlib-only.

    python -m audiocraft_tpu.apps.serve [--port 8000] [--seed 0]

POST /generate  {"text": "...", "duration": 5, "seed": 42, "top_k": 250}
    -> audio/wav bytes
GET /health     -> {"status": "ok", "model": "<name>"}
"""

from __future__ import annotations

import argparse
import io
import json
import struct
import threading
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


def make_handler(model, lock: threading.Lock):
    import jax
    from ..utils.misc import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np

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
                self._json(200, {'status': 'ok', 'model': model.name})
            else:
                self._json(404, {'error': 'not found'})

        def do_POST(self):
            if self.path != '/generate':
                self._json(404, {'error': 'not found'})
                return
            try:
                length = int(self.headers.get('Content-Length', 0))
                req = json.loads(self.rfile.read(length) or b'{}')
                text = req.get('text', '')
                duration = float(req.get('duration', 5.0))
                seed = int(req.get('seed', 0))
                top_k = int(req.get('top_k', 250))
            except (ValueError, json.JSONDecodeError) as exc:
                self._json(400, {'error': f'bad request: {exc}'})
                return
            if not text:
                self._json(400, {'error': 'missing "text"'})
                return
            if duration <= 0 or duration > 720:
                self._json(400, {'error': 'duration must be in (0, 720]'})
                return
            with lock:  # one generation at a time per device
                model.set_generation_params(
                    duration=min(duration, model.max_duration), top_k=top_k)
                model.duration = duration
                wav = model.generate([text], key=jax.random.PRNGKey(seed))
            body = _wav_bytes(np.asarray(wav[0]), model.sample_rate)
            self.send_response(200)
            self.send_header('Content-Type', 'audio/wav')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--port', type=int, default=8000)
    parser.add_argument('--host', default='127.0.0.1')
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    from ..gen.musicgen import get_debug_musicgen
    model = get_debug_musicgen(jax.random.PRNGKey(args.seed))

    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(model, threading.Lock()))
    print(f"serving on http://{args.host}:{args.port} (model: {model.name})")
    server.serve_forever()


if __name__ == '__main__':
    main()
