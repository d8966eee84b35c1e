"""In-graph A/B: full EnCodec 32k encode, native conv0 vs banded Pallas
conv0 (bf16 default path), b32 + b128.  Standalone conv probes showed the
kernel at ~9.4 ms vs native ~14 ms once the un-fusable consumer read is
accounted out; this measures what actually matters.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from audiocraft_tpu.builders import get_encodec_32khz
from audiocraft_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()


def chain(fn, params, wavs, iters, label, units):
    # params as jit ARGUMENTS, never closures (CLAUDE.md)
    f = jax.jit(fn)
    carry = jnp.zeros(())
    codes, carry = f(params, carry, wavs[0])
    float(carry)
    t0 = time.perf_counter()
    carry = jnp.zeros(())
    for i in range(iters):
        codes, carry = f(params, carry, wavs[i % len(wavs)])
    float(carry)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.1f} ms -> {units / dt:.0f} audio-sec/s",
          flush=True)


def main():
    model = get_encodec_32khz()
    params = model.init(jax.random.PRNGKey(0))
    sr, sec = model.sample_rate, 10
    for B, iters in ((32, 8), (128, 8)):
        wavs = [jnp.asarray(np.random.RandomState(i).randn(
            B, 1, sr * sec).astype(np.float32) * 0.1) for i in range(2)]

        def enc_native(p, c, x):
            codes, _ = model.encode(p, x + c * 1e-20)
            return codes, jnp.sum(codes).astype(jnp.float32)

        def enc_kernel(p, c, x):
            codes, _ = model.encode(p, x + c * 1e-20, conv0_kernel=True)
            return codes, jnp.sum(codes).astype(jnp.float32)

        ca = jax.jit(enc_native)(params, jnp.zeros(()), wavs[0])[0]
        cb = jax.jit(enc_kernel)(params, jnp.zeros(()), wavs[0])[0]
        match = float(jnp.mean((ca == cb).astype(jnp.float32)))
        print(f"b{B} token match native-vs-kernel: {match:.6f}", flush=True)
        chain(enc_native, params, wavs, iters, f"b{B} native", B * sec)
        chain(enc_kernel, params, wavs, iters, f"b{B} conv0_kernel", B * sec)


if __name__ == "__main__":
    main()
