"""Observability: perf counters, chained-dependency timing, profiler hooks.

SURVEY §7 calls for first-class bytes/s and token-match counters plus
`jax.profiler` tracing; round 1 kept those ad hoc in bench.py/PERF.md.  This
module makes them library surface:

* ``chained_throughput`` — the measurement methodology this hardware
  requires: the axon tunnel's ``block_until_ready`` does not guarantee
  completion and each host fetch costs ~25 ms, so iterations are chained
  through a scalar data dependency and fetched once.
* ``Meter`` — running counters (audio seconds, tokens, bytes) with /s rates.
* ``token_match`` — the BASELINE conformance metric (exact-match fraction).
* ``roofline`` — % of peak MXU / HBM for a measured interval.
* ``profile_trace`` — context manager around ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
import typing as tp

import numpy as np

# dense v5e peaks used for roofline reporting (PERF.md)
TPU_V5E_PEAK_BF16_TFLOPS = 197.0
TPU_V5E_PEAK_HBM_GBS = 819.0
# measured on this chip with trivial elementwise ops (scripts/perf_hbm_floor
# .py; PERF.md "Effective HBM bandwidth"): what real programs can reach
TPU_V5E_EFFECTIVE_COPY_GBS = 330.0     # read+write streaming
TPU_V5E_EFFECTIVE_WRITE_GBS = 193.0    # write-dominated


def effective_bandwidth_probe(size_mb: int = 1024, iters: int = 8
                              ) -> tp.Dict[str, float]:
    """Measure THIS chip's effective HBM bandwidth (GB/s) with a chained
    elementwise copy and a full reduce.  Spec sheets overstate what XLA
    programs reach (819 vs 190-330 measured on v5e behind the axon tunnel,
    depending on array shape: this probe's tall [N,128] measures ~193 copy,
    the encoder-shaped [32,64,320000] ~329 — see scripts/perf_hbm_floor.py);
    memory-floor estimates must use numbers like these, not the spec."""
    import jax
    import jax.numpy as jnp
    n = size_mb * 1024 * 1024 // 2
    xs = [jnp.arange(n, dtype=jnp.bfloat16).reshape(n // 128, 128) * (i + 1)
          for i in range(2)]

    def copy_step(c, x):
        y = x + c.astype(x.dtype) + jnp.bfloat16(1.0)
        return y, jnp.sum(y[:8, :].astype(jnp.float32))

    def reduce_step(c, x):
        return None, jnp.sum(x.astype(jnp.float32)) + c

    dt_c, _ = chained_throughput(copy_step, xs, iters=iters)
    dt_r, _ = chained_throughput(reduce_step, xs, iters=iters)
    nbytes = n * 2
    return {'copy_gbs': 2 * nbytes / dt_c / 1e9,
            'reduce_gbs': nbytes / dt_r / 1e9}


def chained_throughput(step_fn: tp.Callable, inputs: tp.Sequence,
                       iters: int = 8,
                       units_per_iter: float = 1.0
                       ) -> tp.Tuple[float, float]:
    """Measure `step_fn(carry, x) -> (out, scalar_carry)` with chained
    dependencies.  Returns (seconds_per_iter, units_per_second)."""
    import jax
    import jax.numpy as jnp
    fn = jax.jit(step_fn)
    carry = jnp.zeros(())
    # compile + >=4 warmup executions: the first few runs after a compile
    # carry 0.6-5 s of one-time overhead on axon (PERF.md measurement
    # correction) — a single warmup still leaves ~2x inflation behind
    for i in range(4):
        _, carry = fn(carry, inputs[i % len(inputs)])
    float(carry)
    t0 = time.perf_counter()
    carry = jnp.zeros(())
    for i in range(iters):
        _, carry = fn(carry, inputs[i % len(inputs)])
    float(carry)
    dt = (time.perf_counter() - t0) / iters
    return dt, units_per_iter / dt


@dataclasses.dataclass
class Meter:
    """Running throughput counters for a pipeline (tokenizer driver, server)."""
    started: float = dataclasses.field(default_factory=time.perf_counter)
    audio_seconds: float = 0.0
    tokens: int = 0
    bytes_in: int = 0
    items: int = 0

    def add(self, *, audio_seconds: float = 0.0, tokens: int = 0,
            bytes_in: int = 0, items: int = 1) -> None:
        self.audio_seconds += audio_seconds
        self.tokens += tokens
        self.bytes_in += bytes_in
        self.items += items

    @property
    def elapsed(self) -> float:
        return max(time.perf_counter() - self.started, 1e-9)

    def rates(self) -> tp.Dict[str, float]:
        e = self.elapsed
        return {
            'audio_sec_per_s': self.audio_seconds / e,
            'tokens_per_s': self.tokens / e,
            'bytes_per_s': self.bytes_in / e,
            'items_per_s': self.items / e,
            'elapsed_s': e,
        }

    def report(self) -> str:
        r = self.rates()
        return (f"{self.items} items | {self.audio_seconds:.1f} audio-sec "
                f"({r['audio_sec_per_s']:.1f}/s) | {self.tokens} tokens "
                f"({r['tokens_per_s']:.0f}/s) | "
                f"{self.bytes_in / 1e6:.1f} MB ({r['bytes_per_s'] / 1e6:.1f} MB/s)")


def token_match(codes_a, codes_b) -> float:
    """Exact-match fraction between two token tensors (BASELINE conformance
    metric: 1.0 = bit-parity)."""
    a = np.asarray(codes_a)
    b = np.asarray(codes_b)
    if a.shape != b.shape:
        return 0.0
    return float((a == b).mean())


def roofline(seconds: float, flops: float = 0.0, bytes_moved: float = 0.0,
             peak_tflops: float = TPU_V5E_PEAK_BF16_TFLOPS,
             peak_gbs: float = TPU_V5E_PEAK_HBM_GBS) -> tp.Dict[str, float]:
    """% of peak compute/bandwidth achieved over a measured interval."""
    out = {'seconds': seconds}
    if flops:
        out['tflops'] = flops / seconds / 1e12
        out['pct_mxu'] = 100.0 * out['tflops'] / peak_tflops
    if bytes_moved:
        out['gbs'] = bytes_moved / seconds / 1e9
        out['pct_hbm'] = 100.0 * out['gbs'] / peak_gbs
    if flops and bytes_moved:
        out['arithmetic_intensity'] = flops / bytes_moved
    return out


@contextlib.contextmanager
def profile_trace(log_dir: str, host_tracer_level: int = 2):
    """jax.profiler trace around a block (view with tensorboard/xprof)."""
    import jax
    jax.profiler.start_trace(log_dir, create_perfetto_trace=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
