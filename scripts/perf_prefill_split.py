"""Split a long-form stride window's wall time into prefill vs decode.

VERDICT r2 next-step #2 asks whether carrying the KV cache across stride
windows (instead of re-prefilling the ~500 carried prompt frames each
window) is worth building.  Exact carry is impossible under the published
weights' absolute sinusoidal positions (the prompt tokens occupy positions
[stride..window) in window k-1 but [0..window-stride) in window k, and the
position embedding enters the residual stream before every K/V projection),
so the question is purely economic: how much of a window's wall time IS the
prefill?

Measures, at the production serving config (MusicGen-small, int8 weights +
int8 KV + bf16, kv_buckets auto):
  * full window: prompt 500 frames, max_gen_len 1500 (1000 decode steps)
  * prefill-ish:  prompt 500 frames, max_gen_len 508 (8 decode steps)
  * decode-only: no prompt, max_gen_len 1000
Chained-dependency timing per CLAUDE.md (block_until_ready unreliable on
axon): feed a scalar of the previous output into the next call's key.

Launch detached:
    setsid bash -c 'PYTHONPATH=/root/repo:$PYTHONPATH timeout 3000 \
        python scripts/perf_prefill_split.py > /tmp/perf_prefill.log 2>&1' &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

from audiocraft_tpu.builders import get_encodec_32khz, get_musicgen_lm  # noqa: E402
from audiocraft_tpu.cond.conditioners import (ConditioningProvider,  # noqa: E402
                                              LUTConditioner)
from audiocraft_tpu.gen.musicgen import MusicGen  # noqa: E402
from audiocraft_tpu.cond.attributes import ConditioningAttributes  # noqa: E402


def build():
    lm, _ = get_musicgen_lm('small')
    provider = ConditioningProvider.from_dict({
        'description': LUTConditioner(n_bins=1024, dim=lm.dim,
                                      output_dim=lm.dim,
                                      tokenizer='whitespace'),
    })
    codec = get_encodec_32khz()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    model = MusicGen(name='perf-small', compression_model=codec,
                     codec_params=codec.init(k1), lm=lm,
                     lm_params=lm.init(k2), condition_provider=provider,
                     cond_params=provider.init(k3), max_duration=30.0)
    model.optimize_for_serving()
    return model


def time_case(model, B, prompt_len, max_gen_len, reps=4):
    attrs = [ConditioningAttributes(text={'description': 'epic orchestral'})
             for _ in range(B)]
    prompt = None
    if prompt_len:
        prompt = jnp.asarray(
            np.random.RandomState(0).randint(0, 2048, (B, 4, prompt_len)))
    # warmup (>=4 executions per CLAUDE.md: first 1-3 post-compile runs carry
    # 0.6-5 s one-time overhead)
    out = None
    for i in range(4):
        key = jax.random.PRNGKey(i)
        out = model._lm_generate(attrs, prompt, key, max_gen_len)
    _ = np.asarray(out[:, 0, -1])
    t0 = time.perf_counter()
    carry = 0
    for i in range(reps):
        key = jax.random.fold_in(jax.random.PRNGKey(100 + i), carry)
        out = model._lm_generate(attrs, prompt, key, max_gen_len)
        carry = int(np.asarray(out[0, 0, -1]))  # chain dependency + fetch
    dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    model = build()
    for B in (1, 8):
        full = time_case(model, B, 500, 1500)
        pre = time_case(model, B, 500, 508)
        dec = time_case(model, B, 0, 1000)
        print(f"B={B}: full window (500p+1000d) {full*1e3:8.1f} ms | "
              f"prefill+8 steps {pre*1e3:8.1f} ms | "
              f"decode-only 1000 steps {dec*1e3:8.1f} ms | "
              f"prefill share ~{pre/full*100:4.1f}%", flush=True)


if __name__ == '__main__':
    main()
