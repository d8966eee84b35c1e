"""Mixed-precision training-step throughput: fp32 vs bf16-compute on the
real chip, for the EnCodec 32k full step and the MusicGen-small CE step.

Chained-dependency timing (each iteration's params feed the next step; one
scalar fetch at the end) — see PERF.md for why naive timing lies on axon.
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

ITERS = 8


def time_encodec(compute_dtype):
    model = get_encodec_32khz(compute_dtype=None)
    params = model.init(jax.random.PRNGKey(0))
    grad_params = {k: v for k, v in params.items() if k != 'quantizer'}
    ema_state = params['quantizer']
    opt = optax.adam(3e-4)
    opt_state = opt.init(grad_params)
    step = jax.jit(make_encodec_train_step(model, opt,
                                           compute_dtype=compute_dtype),
                   donate_argnums=(0, 1, 2))
    B, T = 16, 32000
    xs = [jnp.asarray(np.random.RandomState(i).randn(B, 1, T)
                      .astype(np.float32) * 0.1) for i in range(2)]
    gp, es, os_ = grad_params, ema_state, opt_state
    # several warmup executions: on axon the first runs after a compile are
    # dominated by one-time executable/transfer overhead (measured 0.6-5 s
    # for a 42 ms program) — one warmup step is NOT enough
    for i in range(4):
        gp, es, os_, m = step(gp, es, os_, xs[i % 2], jax.random.PRNGKey(1))
    float(m['loss'])
    t0 = time.perf_counter()
    for i in range(ITERS):
        gp, es, os_, m = step(gp, es, os_, xs[i % 2], jax.random.PRNGKey(i))
    loss = float(m['loss'])
    dt = (time.perf_counter() - t0) / ITERS
    name = compute_dtype or 'fp32'
    print(f"encodec train step b{B}x1s [{name}]: {dt*1e3:.1f} ms -> "
          f"{B * 1.0 / dt:.0f} audio-sec/s trained "
          f"(loss {loss:.4f})", flush=True)
    return dt


def time_lm(compute_dtype, batch=8):
    lm, _ = get_musicgen_lm('small')
    lp = lm.init(jax.random.PRNGKey(2))
    lopt = optax.adamw(1e-4)
    lstate = lopt.init(lp)
    lstep = jax.jit(make_lm_train_step(lm, lopt,
                                       compute_dtype=compute_dtype),
                    donate_argnums=(0, 1))
    Bl, S = batch, 250
    codes = [jnp.asarray(np.random.RandomState(i).randint(
        0, 2048, (Bl, 4, S))) for i in range(2)]
    cond = jnp.asarray(np.random.RandomState(9).randn(Bl, 6, lm.dim)
                       .astype(np.float32))
    cmask = jnp.ones((Bl, 6), jnp.int32)
    ct = {'description': (cond, cmask)}
    for i in range(4):
        lp, lstate, m = lstep(lp, lstate, codes[i % 2], ct)
    float(m['loss'])
    t0 = time.perf_counter()
    for i in range(ITERS):
        lp, lstate, m = lstep(lp, lstate, codes[i % 2], ct)
    loss = float(m['loss'])
    dt = (time.perf_counter() - t0) / ITERS
    toks = Bl * 4 * S          # codes consumed (the data-rate metric)
    positions = Bl * S         # transformer positions (the FLOP metric:
    #                            K codebooks share one sequence position)
    name = compute_dtype or 'fp32'
    flops = 6 * 420e6 * positions  # ~420M non-embedding params
    print(f"lm-small train step b{Bl}xS{S} [{name}]: {dt*1e3:.1f} ms -> "
          f"{toks / dt / 1e3:.1f}k codes/s, {flops/dt/1e12:.0f} TFLOP/s "
          f"model FLOPs (loss {loss:.4f})", flush=True)
    return dt


def main():
    for dtype in (None, 'bfloat16'):
        time_encodec(dtype)
    for dtype in (None, 'bfloat16'):
        time_lm(dtype)
    for dtype in (None, 'bfloat16'):
        time_lm(dtype, batch=16)


if __name__ == "__main__":
    main()
