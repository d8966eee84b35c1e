"""Round-2 perf data: batch scaling, per-stage XLA breakdown (bf16), and an
NWC-vs-NCW stage experiment.  Detached-run friendly (prints as it goes).
"""
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
    print(f"{label}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def main():
    model = get_encodec_32khz()
    params = model.init(jax.random.PRNGKey(0))
    sr, S = 32000, 10

    def wavs_for(B):
        return [jnp.asarray(np.random.RandomState(i).randn(B, 1, sr * S)
                            .astype(np.float32) * 0.1) for i in range(2)]

    def enc(fused):
        def f(carry, x):
            codes, _ = model.encode(params, x + carry * 1e-20, fused=fused)
            return codes, jnp.sum(codes).astype(jnp.float32)
        return f

    # batch scaling, XLA bf16
    for B in (64, 128):
        ws = wavs_for(B)
        dt = chain_time(enc(False), [(w,) for w in ws],
                        label=f"encode bf16 XLA b{B}")
        print(f"  -> {B * S / dt:.0f} audio-sec/s", flush=True)

    # per-stage prefix breakdown (bf16, batch 32)
    enc_cfg = model.encoder
    layers = enc_cfg._layers()
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    eparams = cast(params['encoder'])
    ws = wavs_for(32)

    def run_prefix(n_layers):
        def f(carry, x):
            y = (x + carry * 1e-20).astype(jnp.bfloat16)
            for i, (kind, mod) in enumerate(layers[:n_layers]):
                if kind == 'act':
                    y = jax.nn.elu(y)
                else:
                    y = mod(eparams[f'layer{i}'], y)
            return y, jnp.sum(y.astype(jnp.float32))
        return f

    prev = 0.0
    for nb in [1, 4, 7, 10, 13, 14, 16]:  # conv0 | stages A-D | lstm | final
        dt = chain_time(run_prefix(nb), [(w,) for w in ws],
                        label=f"prefix thru layer {nb - 1} ({layers[nb-1][0]})")
        print(f"   stage delta: {(dt - prev) * 1e3:.2f} ms", flush=True)
        prev = dt


if __name__ == '__main__':
    main()
