"""Pipelined (skewed single-scan) 2-layer LSTM vs sequential two-scan, plus
full-encode impact, b32 + b128 bf16.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from audiocraft_tpu.nn.lstm import StreamableLSTM
from audiocraft_tpu.builders import get_encodec_32khz
from audiocraft_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()


def chain(fn, xs, iters, label, units=None):
    f = jax.jit(fn)
    carry = jnp.zeros(())
    out, carry = f(carry, xs[0])
    float(carry)
    t0 = time.perf_counter()
    carry = jnp.zeros(())
    for i in range(iters):
        out, carry = f(carry, xs[i % len(xs)])
    float(carry)
    dt = (time.perf_counter() - t0) / iters
    extra = f" -> {units / dt:.0f} audio-sec/s" if units else ""
    print(f"{label}: {dt * 1e3:.2f} ms{extra}", flush=True)


def main():
    # standalone LSTM at the encoder bottleneck shape: dim 1024, T=500
    for B in (32, 128):
        mod_p = StreamableLSTM(1024, 2, pipelined=True)
        mod_s = StreamableLSTM(1024, 2, pipelined=False)
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                              mod_p.init(jax.random.PRNGKey(0)))
        xs = [jnp.asarray(np.random.RandomState(i).randn(B, 1024, 500)
                          .astype(np.float32) * 0.1).astype(jnp.bfloat16)
              for i in range(2)]
        ya = jax.jit(lambda x: mod_s(params, x))(xs[0])
        yb = jax.jit(lambda x: mod_p(params, x))(xs[0])
        err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                    - yb.astype(jnp.float32))))
        print(f"b{B} pipelined max|diff| = {err:.3e} "
              f"exact={bool((ya == yb).all())}", flush=True)

        def f_seq(c, x):
            y = mod_s(params, x + c.astype(x.dtype) * 1e-8)
            return y, jnp.sum(y[:, :, ::97].astype(jnp.float32))

        def f_pipe(c, x):
            y = mod_p(params, x + c.astype(x.dtype) * 1e-8)
            return y, jnp.sum(y[:, :, ::97].astype(jnp.float32))

        chain(f_seq, xs, 8, f"b{B} LSTM sequential")
        chain(f_pipe, xs, 8, f"b{B} LSTM pipelined")

    # full encode with the model DEFAULT (sequential) LSTM path
    model = get_encodec_32khz()
    params = model.init(jax.random.PRNGKey(0))
    sr, sec = model.sample_rate, 10
    for B in (32, 128):
        wavs = [jnp.asarray(np.random.RandomState(i).randn(
            B, 1, sr * sec).astype(np.float32) * 0.1) for i in range(2)]

        def enc(p, c, x):
            codes, _ = model.encode(p, x + c * 1e-20)
            return codes, jnp.sum(codes).astype(jnp.float32)
        # params as jit ARGUMENTS, never closures (CLAUDE.md)
        f = jax.jit(enc)
        carry = jnp.zeros(())
        _, carry = f(params, carry, wavs[0])
        float(carry)
        t0 = time.perf_counter()
        carry = jnp.zeros(())
        for i in range(8):
            _, carry = f(params, carry, wavs[i % 2])
        float(carry)
        dt = (time.perf_counter() - t0) / 8
        print(f"b{B} encode (sequential-LSTM default): {dt*1e3:.2f} ms "
              f"-> {B * sec / dt:.0f} audio-sec/s", flush=True)


if __name__ == "__main__":
    main()
