"""Fused-kernel encode benchmark + TPU parity check vs the XLA bf16 path.

PYTHONPATH=/root/repo python scripts/perf_fused_encode.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiocraft_tpu.builders import get_encodec_32khz
from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()


def chain_time(fn, args_list, iters=8, label=""):
    f = jax.jit(fn)
    carry = jnp.zeros(())
    out, carry = f(carry, *args_list[0])
    float(carry)
    t0 = time.perf_counter()
    carry = jnp.zeros(())
    for i in range(iters):
        out, carry = f(carry, *args_list[i % len(args_list)])
    float(carry)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.2f} ms")
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    model = get_encodec_32khz()
    params = model.init(jax.random.PRNGKey(0))
    sr, S = 32000, 10
    wavs = [jnp.asarray(np.random.RandomState(i).randn(B, 1, sr * S)
                        .astype(np.float32) * 0.1) for i in range(2)]

    # parity first: fused vs XLA (both bf16) token agreement
    cf = jax.jit(lambda x: model.encode(params, x, fused=True)[0])
    cx = jax.jit(lambda x: model.encode(params, x, fused=False)[0])
    a, b = np.asarray(cf(wavs[0])), np.asarray(cx(wavs[0]))
    match = (a == b).mean()
    print(f"token match fused-vs-xla bf16: {match:.6f}")

    def enc(fused):
        def f(carry, x):
            codes, _ = model.encode(params, x + carry * 1e-20, fused=fused)
            return codes, jnp.sum(codes).astype(jnp.float32)
        return f

    dt_x = chain_time(enc(False), [(w,) for w in wavs],
                      label=f"encode bf16 XLA   b{B}")
    dt_f = chain_time(enc(True), [(w,) for w in wavs],
                      label=f"encode bf16 fused b{B}")
    aud = B * S
    print(f"throughput XLA  : {aud / dt_x:.0f} audio-sec/s")
    print(f"throughput fused: {aud / dt_f:.0f} audio-sec/s")


if __name__ == '__main__':
    main()
