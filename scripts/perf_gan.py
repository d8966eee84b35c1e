"""Full adversarial EnCodec training-step throughput on the real chip:
real-shape generator (32 kHz, n_filters=64, lstm=2) against the default
MS-STFT discriminator, balancer-combined losses.  fp32 vs bf16 compute.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
import optax
from audiocraft_tpu.adversarial import MultiScaleSTFTDiscriminator
from audiocraft_tpu.builders import get_encodec_32khz
from audiocraft_tpu.dist.train import make_encodec_gan_train_step
from audiocraft_tpu.losses import Balancer
from audiocraft_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()

ITERS = 8


def time_gan(compute_dtype, B=16, T=32000):
    model = get_encodec_32khz(compute_dtype=None)
    params = model.init(jax.random.PRNGKey(0))
    grad_params = {k: v for k, v in params.items() if k != 'quantizer'}
    ema = params['quantizer']
    disc = MultiScaleSTFTDiscriminator()
    d_params = disc.init(jax.random.PRNGKey(1))
    g_opt, d_opt = optax.adam(3e-4), optax.adam(3e-4)
    bal = Balancer(weights={'l1': 0.1, 'l2': 1.0, 'msspec': 3.0,
                            'adv': 4.0, 'feat': 4.0})
    step = jax.jit(make_encodec_gan_train_step(
        model, disc, g_opt, d_opt, balancer=bal,
        compute_dtype=compute_dtype), donate_argnums=(0, 1, 2, 3, 4, 5))
    xs = [jnp.asarray(np.random.RandomState(i).randn(B, 1, T)
                      .astype(np.float32) * 0.1) for i in range(2)]
    st = (grad_params, ema, g_opt.init(grad_params), d_params,
          d_opt.init(d_params), bal.init_state())
    for i in range(4):  # warmup (PERF.md first-executions overhead)
        *st, m = step(*st, xs[i % 2], jax.random.PRNGKey(i))
        st = tuple(st)
    float(m['l1'])
    t0 = time.perf_counter()
    for i in range(ITERS):
        *st, m = step(*st, xs[i % 2], jax.random.PRNGKey(i))
        st = tuple(st)
    l1 = float(m['l1'])
    dt = (time.perf_counter() - t0) / ITERS
    name = compute_dtype or 'fp32'
    print(f"encodec GAN step b{B}x1s [{name}]: {dt*1e3:.1f} ms -> "
          f"{B * 1.0 / dt:.0f} audio-sec/s trained (l1 {l1:.4f})",
          flush=True)
    return dt


def main():
    for dtype in (None, 'bfloat16'):
        time_gan(dtype)


if __name__ == "__main__":
    main()
