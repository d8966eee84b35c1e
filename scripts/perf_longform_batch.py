"""Batched long-form generation — the serving-farm configuration.

perf_longform.py measured the fork's flagship 720 s request single-stream
(B=1, 11.5x realtime with `optimize_for_serving`).  A serving farm batches
long requests: this drives the SAME facade path (int8 LM weights + int8 KV
cache + bf16 chunked codec decode, stride-20 extension windows,
reference app.py:318-319 / musicgen.py:469-515) with B concurrent streams
and reports aggregate realtime per chip.

Launch detached:
    setsid bash -c 'PYTHONPATH=/root/repo:$PYTHONPATH timeout 3000 \
        python scripts/perf_longform_batch.py > /tmp/perf_lfb.log 2>&1' &
"""
import time

import jax
import numpy as np

from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

from audiocraft_tpu.builders import get_encodec_32khz, get_musicgen_lm  # noqa: E402
from audiocraft_tpu.cond.conditioners import (ConditioningProvider,  # noqa: E402
                                              LUTConditioner)
from audiocraft_tpu.gen.musicgen import MusicGen  # noqa: E402

PROMPTS = [
    "epic orchestral crescendo, cinematic",
    "lofi hip hop beat, mellow rhodes",
    "driving techno, acid bassline",
    "solo acoustic guitar ballad",
    "80s synthwave with gated drums",
    "smoky jazz trio late at night",
    "celtic folk reel with fiddle",
    "ambient drone, slowly evolving pads",
]


def build():
    lm, _t5_provider = get_musicgen_lm('small')
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
    model.optimize_for_serving()   # int8 weights + int8 KV + bf16 decode
    return model


def run(model, batch, duration, stride, warm=False):
    model.set_generation_params(duration=duration, extend_stride=stride,
                                use_sampling=True, top_k=250, cfg_coef=3.0)
    prompts = PROMPTS[:batch]
    t0 = time.perf_counter()
    wav = model.generate(prompts, key=jax.random.PRNGKey(7 + duration + batch))
    wav_np = np.asarray(wav)
    dt = time.perf_counter() - t0
    agg = batch * duration / dt
    tag = " (warmup/compile)" if warm else ""
    print(f"B={batch} duration {duration:4d}s stride {stride}s: {dt:7.1f} s "
          f"wall -> {agg:6.1f}x aggregate realtime/chip "
          f"({duration / dt:5.2f}x/stream){tag}  wav {wav_np.shape} "
          f"rms {np.sqrt((wav_np ** 2).mean()):.3f}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    model = build()
    # compile pass: the no-prompt window, full continuation windows, a
    # partial final window, and the B=8 chunked-decode tail program
    run(model, 8, 70, 20, warm=True)
    run(model, 8, 120, 20, warm=True)
    run(model, 8, 120, 20)            # clean: every program cached
    run(model, 8, 720, 20)            # the fork's per-request cap, batched
    run(model, 4, 720, 20, warm=True)  # B=4 point (new programs compile)
    run(model, 4, 720, 20)


if __name__ == "__main__":
    main()
