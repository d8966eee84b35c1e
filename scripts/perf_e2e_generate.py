"""End-to-end generation throughput at MusicGen-small scale: text-conditioned
tokens -> waveform, through the LM decode scan + bf16 codec decode, with
int8 LM weights (the production serving config).

The reference's own headline is "50 AR steps per second of audio" (i.e. 1x
realtime is the bar); this measures our aggregate realtime factor per chip.
10 s of audio = 500 pattern steps.
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

    for B in (2, 8, 16, 32):
        rng = np.random.RandomState(0)
        cond = jnp.asarray(rng.randn(2 * B, 6, lm.dim).astype(np.float32))
        mask = jnp.ones((2 * B, 6), jnp.int32)
        tensors = {'description': (cond, mask)}

        def pipeline(lp, cp, key, tens):
            tokens = lm.generate(lp, key, condition_tensors=tens,
                                 num_samples=B, max_gen_len=STEPS,
                                 use_sampling=True, top_k=250,
                                 compute_dtype=jnp.bfloat16)
            wav = codec.decode(cp, tokens)
            return wav

        f = jax.jit(pipeline)
        wav = f(lm_params, codec_params, jax.random.PRNGKey(0), tensors)
        np.asarray(wav)
        best = float('inf')
        for i in range(3):
            t0 = time.perf_counter()
            wav = f(lm_params, codec_params, jax.random.PRNGKey(1 + i),
                    tensors)
            np.asarray(wav)
            best = min(best, time.perf_counter() - t0)
        agg = B * SEC / best
        print(f"B={B}: {best * 1e3:.0f} ms for {B}x{SEC}s "
              f"-> {agg:.1f}x aggregate realtime/chip "
              f"({B * SEC / best / B:.1f}x per stream), wav {wav.shape}",
              flush=True)


if __name__ == "__main__":
    main()
