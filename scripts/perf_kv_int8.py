"""int8 KV-cache A/B at serving batch: end-to-end generate (int8 LM weights
+ bf16 codec decode), float-KV vs int8-KV.

Motivation (PERF.md round-2f): at B=32 the CFG-doubled KV reads average
~1.5 GB/step — ~5x the int8 weight bytes — so halving cache storage is the
dominant remaining bandwidth lever.  At B=2 KV is <6 % of traffic and the
quantize/dequant overhead should make int8 KV neutral-to-slower.

Launch detached:
    setsid bash -c 'PYTHONPATH=/root/repo:$PYTHONPATH timeout 3400 \
        python scripts/perf_kv_int8.py > /tmp/perf_kv_int8.log 2>&1' &
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from audiocraft_tpu.builders import get_musicgen_lm, get_encodec_32khz
from audiocraft_tpu.lm.quantize import quantize_lm_params
from audiocraft_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()

STEPS = 503   # 10 s at 50 Hz + delay-pattern tail
SEC = 10


def main():
    lm, _provider = get_musicgen_lm('small')
    lm_params = quantize_lm_params(lm.init(jax.random.PRNGKey(0)))
    codec = get_encodec_32khz()
    codec_params = codec.init(jax.random.PRNGKey(1))

    for B in (2, 32):
        rng = np.random.RandomState(0)
        cond = jnp.asarray(rng.randn(2 * B, 6, lm.dim).astype(np.float32))
        mask = jnp.ones((2 * B, 6), jnp.int32)
        tensors = {'description': (cond, mask)}

        for kv in (None, 'int8'):
            def pipeline(lp, cp, key, tens):
                tokens = lm.generate(lp, key, condition_tensors=tens,
                                     num_samples=B, max_gen_len=STEPS,
                                     use_sampling=True, top_k=250,
                                     compute_dtype=jnp.bfloat16,
                                     kv_dtype=kv)
                return codec.decode(cp, tokens)

            f = jax.jit(pipeline)
            # >=4 warmup executions (CLAUDE.md: first executions carry
            # one-time overhead)
            for i in range(4):
                np.asarray(f(lm_params, codec_params,
                             jax.random.PRNGKey(i), tensors))
            best = float('inf')
            for i in range(3):
                t0 = time.perf_counter()
                wav = f(lm_params, codec_params, jax.random.PRNGKey(9 + i),
                        tensors)
                np.asarray(wav)
                best = min(best, time.perf_counter() - t0)
            agg = B * SEC / best
            print(f"B={B} kv={kv or 'bf16'}: {best * 1e3:.0f} ms "
                  f"-> {agg:.1f}x aggregate realtime/chip "
                  f"({agg / B:.1f}x per stream)", flush=True)


if __name__ == "__main__":
    main()
