"""End-to-end REST serving throughput on the real chip: concurrent clients
against the continuous-batching server (apps/serve.py), debug model.

Measures wall-clock for N concurrent /generate requests with and without
request coalescing — the serving-layer counterpart of the e2e generate
numbers in PERF.md (decode throughput is batch-friendly; the window turns
concurrency into batch size).
"""
import json
import threading
import time
import urllib.request

from http.server import ThreadingHTTPServer

from audiocraft_tpu.apps.serve import GenerationService, make_handler
from audiocraft_tpu.ckpt import loaders


def run_round(service, n_clients, duration, port):
    server = ThreadingHTTPServer(('127.0.0.1', port), make_handler(service))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    results = []

    def fire(i):
        body = json.dumps({'text': f'melody {i}', 'duration': duration,
                           'seed': 11, 'return_history_json': True}).encode()
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/generate', data=body,
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=600) as resp:
            results.append(json.loads(resp.read())['metadata'])

    # warm (compile) with one request, then one full volley (compiles the
    # batched program + first-executions overhead, PERF.md)
    fire(0)
    for _ in range(2):
        results.clear()
        t0 = time.perf_counter()
        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
    server.shutdown()
    assert len(results) == n_clients
    batched = sum(1 for m in results if 'batch_size' in m)
    agg = n_clients * duration / wall
    return wall, agg, batched


def main():
    duration, n = 4.0, 8
    for window, port in ((0.0, 8099), (300.0, 8098)):
        service = GenerationService('debug', batch_window_ms=window,
                                    max_batch=n)
        service._get_model('debug')
        wall, agg, batched = run_round(service, n, duration, port)
        mode = f'batch-window {window:.0f} ms' if window else 'serial'
        print(f"{n} concurrent x {duration:.0f}s [{mode}]: {wall:.2f}s wall "
              f"-> {agg:.1f}x aggregate realtime served "
              f"({batched}/{n} coalesced)", flush=True)
        loaders.clear_model_cache()


if __name__ == '__main__':
    main()
