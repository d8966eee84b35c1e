"""Localize the with-prompt decode slowdown (round-3 follow-up to
scripts/perf_prefill_split.py, VERDICT r2 #2).

Observed there (B=1, serving config): 1000 decode steps cost 1216 ms with no
prompt but 4244 ms with a 500-frame prompt, while the prefill itself is only
~53 ms.  At B=8 the gap is 7%.  This probe isolates the factors:

  A  p=0,   L=1000            baseline               (~1.2 ms/step)
  B  p=0,   L=1500            capacity/S effect only
  C  p=500, L=1500            the anomaly            (~4.2 ms/step)
  D  p=500, L=1000            shorter decode with prompt
  E  p=500, L=1500, buckets=None  single full-capacity segment
  F  p=4,   L=1004            tiny prompt, same decode count as A

Launch detached (multiple fresh programs -> long compile budget):
    setsid bash -c 'PYTHONPATH=/root/repo:$PYTHONPATH timeout 3400 \
        python scripts/perf_prompt_anomaly.py > /tmp/perf_anomaly.log 2>&1' &
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
    out = None
    for i in range(4):  # warmup >=4 (CLAUDE.md: post-compile overhead)
        key = jax.random.PRNGKey(i)
        out = model._lm_generate(attrs, prompt, key, max_gen_len)
    _ = np.asarray(out[:, 0, -1])
    t0 = time.perf_counter()
    carry = 0
    for i in range(reps):
        key = jax.random.fold_in(jax.random.PRNGKey(100 + i), carry)
        out = model._lm_generate(attrs, prompt, key, max_gen_len)
        carry = int(np.asarray(out[0, 0, -1]))
    return (time.perf_counter() - t0) / reps


def main():
    model = build()
    cases = [
        ('A p=0    L=1000', 0, 1000, 'auto'),
        ('B p=0    L=1500', 0, 1500, 'auto'),
        ('C p=500  L=1500', 500, 1500, 'auto'),
        ('D p=500  L=1000', 500, 1000, 'auto'),
        ('E p=500  L=1500 nobuckets', 500, 1500, None),
        ('F p=4    L=1004', 4, 1004, 'auto'),
    ]
    for name, p, L, buckets in cases:
        saved = model.kv_buckets
        model.kv_buckets = buckets
        try:
            dt = time_case(model, 1, p, L)
        finally:
            model.kv_buckets = saved
        steps = L - p
        print(f"{name}: {dt*1e3:8.1f} ms total | {dt*1e3/steps:6.3f} ms/step "
              f"({steps} steps)", flush=True)


if __name__ == '__main__':
    main()
