"""Long-form generation wall time — the fork's flagship capability
(unlimited-length requests up to 720 s via stride extension,
reference app.py:318-319 / musicgen.py:469-515).

Drives the real facade path end-to-end on the chip: MusicGen-small shape,
int8 LM weights + bf16 codec decode (the production serving config), text
conditioning through a LUT conditioner at the real dim (no hub access for
the T5 tokenizer here; the conditioner is <0.1 %% of the compute either
way).  Stride extension re-prompts each 30 s window with the last
(30 - stride) s of tokens, so the whole piece is musically continuous —
this measures the real serving cost of "one long request", including every
host-side window hop.

Launch detached:
    setsid bash -c 'PYTHONPATH=/root/repo:$PYTHONPATH timeout 3000 \
        python scripts/perf_longform.py > /tmp/perf_longform.log 2>&1' &
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


def run(model, duration, stride, warm=False):
    model.set_generation_params(duration=duration, extend_stride=stride,
                                use_sampling=True, top_k=250, cfg_coef=3.0)
    t0 = time.perf_counter()
    wav = model.generate(["epic orchestral crescendo, cinematic"],
                         key=jax.random.PRNGKey(7 + duration))
    wav_np = np.asarray(wav)
    dt = time.perf_counter() - t0
    tag = " (warmup/compile)" if warm else ""
    print(f"duration {duration:4d}s stride {stride}s: {dt:7.1f} s wall "
          f"-> {duration / dt:5.1f}x realtime single-stream{tag}  "
          f"wav {wav_np.shape} rms {np.sqrt((wav_np**2).mean()):.3f}",
          flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    model = build()
    # compile pass: covers the no-prompt window, the full continuation
    # window, and a partial final window
    run(model, 70, 20, warm=True)
    run(model, 120, 20, warm=True)  # compiles the chunked-decode programs
    run(model, 120, 20)             # clean: every program cached
    run(model, 720, 20)   # the fork's per-request cap (BASELINE config 4);
    #                       decode is chunked (codec/chunked.py) — one
    #                       monolithic 720 s decode program needs ~33 GB HBM


if __name__ == "__main__":
    main()
