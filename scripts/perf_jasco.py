"""JASCO flow-matching generation on TPU: Euler-64 vs dopri5 latency,
published ~400M scale (dim 1024, 16 layers, flow_dim 128, 10 s latents).
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from audiocraft_tpu.cond.fuser import ConditionFuser
from audiocraft_tpu.lm.flow_matching import FlowMatchingModel
from audiocraft_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()

T, DIM = 500, 1024


def main():
    fuser = ConditionFuser.from_dict({'cross': ('description',)})
    model = FlowMatchingModel(
        fuser=fuser, flow_dim=128, dim=DIM, num_heads=16, num_layers=16,
        chords_dim=16, drums_dim=16, melody_dim=53)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        model.init(jax.random.PRNGKey(0)))
    B = 1
    rng = np.random.RandomState(0)
    # 3-term CFG like the reference jasco inference (text, full, null)
    cond = jnp.asarray(rng.randn(3 * B, 6, DIM).astype(np.float32)
                       ).astype(jnp.bfloat16)
    mask = jnp.ones((3 * B, 6), jnp.int32)

    def loc(d, seed):
        e = jnp.asarray(rng.randn(3 * B, T, d).astype(np.float32) * 0.1
                        ).astype(jnp.bfloat16)
        return (e, jnp.ones((3 * B, T), jnp.int32))

    tensors = {'description': (cond, mask), 'chords': loc(16, 1),
               'melody': loc(53, 2), 'self_wav': loc(16, 3)}
    weights = (-0.5, 2.0, -0.5)

    for method, kw in (('euler', dict(euler_steps=64)),
                       ('dopri5', dict(ode_atol=1e-4, ode_rtol=1e-4))):
        fn = jax.jit(lambda p, key, tens, m=method, kw=kw: model.generate(
            p, key, tens, cfg_weights=weights, num_samples=B,
            max_gen_len=T, method=m, **kw))
        out = fn(params, jax.random.PRNGKey(0), tensors)
        np.asarray(out)
        best = float('inf')
        for i in range(3):
            t0 = time.perf_counter()
            out = fn(params, jax.random.PRNGKey(1 + i), tensors)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{method}: {best * 1e3:.0f} ms for 10s latents "
              f"({10 / best:.1f}x realtime), shape {out.shape}, "
              f"finite={bool(np.isfinite(np.asarray(out)).all())}",
              flush=True)


if __name__ == "__main__":
    main()
