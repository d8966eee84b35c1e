"""Single-chip training-step throughput: real-shape EnCodec 32k (fwd+bwd+EMA)
and MusicGen-small LM CE step, bf16 activations where applicable.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
import optax
from audiocraft_tpu.builders import get_encodec_32khz, get_musicgen_lm
from audiocraft_tpu.dist.train import (make_encodec_train_step,
                                       make_lm_train_step)
from audiocraft_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()


def main():
    # ---- EnCodec train step (1 s segments, the reference's training shape) --
    model = get_encodec_32khz(compute_dtype=None)   # fp32 training parity
    params = model.init(jax.random.PRNGKey(0))
    grad_params = {k: v for k, v in params.items() if k != 'quantizer'}
    ema_state = params['quantizer']
    opt = optax.adam(3e-4)
    opt_state = opt.init(grad_params)
    step = jax.jit(make_encodec_train_step(model, opt),
                   donate_argnums=(0, 1, 2))
    B, T = 16, 32000
    xs = [jnp.asarray(np.random.RandomState(i).randn(B, 1, T)
                      .astype(np.float32) * 0.1) for i in range(2)]
    gp, es, os_ = grad_params, ema_state, opt_state
    # >=4 warmup executions: the first runs after a compile carry 0.6-5 s of
    # one-time overhead on axon (PERF.md measurement correction)
    for i in range(4):
        gp, es, os_, m = step(gp, es, os_, xs[i % 2], jax.random.PRNGKey(1))
    float(m['loss'])
    t0 = time.perf_counter()
    iters = 8
    for i in range(iters):
        gp, es, os_, m = step(gp, es, os_, xs[i % 2], jax.random.PRNGKey(i))
    float(m['loss'])
    dt = (time.perf_counter() - t0) / iters
    print(f"encodec train step b{B}x1s: {dt*1e3:.1f} ms "
          f"-> {B * 1.0 / dt:.0f} audio-sec/s trained, loss finite: "
          f"{bool(np.isfinite(float(m['loss'])))}", flush=True)

    # ---- MusicGen-small LM CE train step (tokens, S=250 = 5 s) -------------
    lm, _ = get_musicgen_lm('small')
    lp = lm.init(jax.random.PRNGKey(2))
    lopt = optax.adamw(1e-4)
    lstate = lopt.init(lp)
    lstep = jax.jit(make_lm_train_step(lm, lopt), donate_argnums=(0, 1))
    Bl, S = 8, 250
    codes = [jnp.asarray(np.random.RandomState(i).randint(
        0, 2048, (Bl, 4, S))) for i in range(2)]
    cond = jnp.asarray(np.random.RandomState(9).randn(Bl, 6, lm.dim)
                       .astype(np.float32))
    cmask = jnp.ones((Bl, 6), jnp.int32)
    for i in range(4):
        lp, lstate, lm_m = lstep(lp, lstate, codes[i % 2],
                                 {'description': (cond, cmask)})
    float(lm_m['loss'])
    t0 = time.perf_counter()
    for i in range(iters):
        lp, lstate, lm_m = lstep(lp, lstate, codes[i % 2],
                                 {'description': (cond, cmask)})
    float(lm_m['loss'])
    dt = (time.perf_counter() - t0) / iters
    toks = Bl * 4 * S
    print(f"lm-small train step b{Bl}xS{S}: {dt*1e3:.1f} ms "
          f"-> {toks / dt / 1e3:.1f}k tokens/s, loss finite: "
          f"{bool(np.isfinite(float(lm_m['loss'])))}", flush=True)


if __name__ == "__main__":
    main()
