"""Flash-attention kernel vs XLA einsum attention on the real chip.

Sections (pass as argv, default all):
  parity  — on-chip numerical check of ops/attention_pallas.fused_attention
            vs the einsum path at MusicGen shapes (bf16 + fp32)
  train   — MusicGen-small CE train step (fwd+bwd through the flash VJP)
            at S=250 (10 s) and S=1500 (30 s, the reference's training
            segment length) — the einsum path materializes fp32 [B,H,S,S]
            scores for the backward, the flash path never does
  magnet  — MAGNeT-small full-sequence forward (the inner op of its 50
            decoding steps), CFG-doubled B=2, S=500

Launch detached (several Mosaic compiles through the remote tunnel):
    setsid bash -c 'PYTHONPATH=/root/repo:$PYTHONPATH timeout 5000 \
        python scripts/perf_attention.py > /tmp/perf_attn.log 2>&1' &
"""

import sys
import time

import numpy as np
import jax
from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from audiocraft_tpu.obs import chained_throughput  # noqa: E402

ITERS = 8


def parity():
    from audiocraft_tpu.ops.attention_pallas import (_xla_attention,
                                                     fused_attention)
    for dtype, tol_label in ((jnp.float32, 'fp32'), (jnp.bfloat16, 'bf16')):
        B, T, H, D = 8, 501, 16, 64
        rng = np.random.RandomState(0)
        q, k, v = (jnp.asarray(rng.randn(B, T, H, D).astype(np.float32),
                               dtype=dtype) for _ in range(3))
        f = jax.jit(lambda q, k, v: fused_attention(q, k, v, causal=True))
        x = jax.jit(lambda q, k, v: _xla_attention(
            q, k, v, causal=True, sm_scale=float(1 / np.sqrt(D))))
        a = np.asarray(f(q, k, v), np.float32)
        b = np.asarray(x(q, k, v), np.float32)
        err = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        print(f"parity[{tol_label}] causal S={T}: max rel err {err:.2e}",
              flush=True)

        # throughput of the attention op alone
        def run(fn):
            def step(carry, ops):
                o = fn(ops[0] + (carry * 1e-20).astype(dtype), ops[1], ops[2])
                return (), o.astype(jnp.float32).mean()
            opsets = [(q + i * jnp.asarray(1e-3, dtype), k, v)
                      for i in range(2)]
            dt, _ = chained_throughput(step, opsets, iters=12)
            return dt
        tf, tx = run(f), run(x)
        print(f"  op time [{tol_label}]: flash {tf*1e3:.3f} ms vs xla "
              f"{tx*1e3:.3f} ms ({tx/tf:.2f}x)", flush=True)


def train(S, batch, checkpointing=False, kernels=(False, True)):
    import dataclasses
    from audiocraft_tpu.builders import get_musicgen_lm
    from audiocraft_tpu.dist.train import make_lm_train_step

    lm, _ = get_musicgen_lm('small')
    results = {}
    for kernel in kernels:
        m = dataclasses.replace(lm, attn_kernel=kernel,
                                checkpointing=checkpointing)
        try:
            lp = m.init(jax.random.PRNGKey(2))
            lopt = optax.adamw(1e-4)
            lstate = lopt.init(lp)
            lstep = jax.jit(make_lm_train_step(m, lopt,
                                               compute_dtype='bfloat16'),
                            donate_argnums=(0, 1))
            codes = [jnp.asarray(np.random.RandomState(i).randint(
                0, 2048, (batch, 4, S))) for i in range(2)]
            cond = jnp.asarray(np.random.RandomState(9)
                               .randn(batch, 6, lm.dim).astype(np.float32))
            ct = {'description': (cond, jnp.ones((batch, 6), jnp.int32))}
            for i in range(4):
                lp, lstate, mtr = lstep(lp, lstate, codes[i % 2], ct)
            float(mtr['loss'])
            t0 = time.perf_counter()
            for i in range(ITERS):
                lp, lstate, mtr = lstep(lp, lstate, codes[i % 2], ct)
            loss = float(mtr['loss'])
            dt = (time.perf_counter() - t0) / ITERS
            results[kernel] = dt
            flops = 6 * 420e6 * batch * S
            ck = ' remat' if checkpointing else ''
            print(f"train b{batch}xS{S}{ck} attn_kernel={kernel}: "
                  f"{dt*1e3:.1f} ms  {batch*4*S/dt/1e3:.1f}k codes/s  "
                  f"{flops/dt/1e12:.0f} TFLOP/s (loss {loss:.3f})",
                  flush=True)
            del lp, lstate, lstep
        except Exception as e:
            print(f"train b{batch}xS{S} attn_kernel={kernel}: FAILED "
                  f"({type(e).__name__}: {str(e)[:160]})", flush=True)
    if len(results) == 2:
        print(f"  -> flash speedup {results[False]/results[True]:.3f}x",
              flush=True)


def magnet():
    import dataclasses
    from audiocraft_tpu.builders import get_magnet_lm

    lm, _ = get_magnet_lm('small')
    B, K, S = 2, 4, 500
    seq = jnp.asarray(np.random.RandomState(0).randint(0, 2048, (B, K, S)))
    cond = jnp.asarray(np.random.RandomState(1).randn(B, 6, lm.dim)
                       .astype(np.float32), dtype=jnp.bfloat16)
    ct = {'description': (cond, jnp.ones((B, 6), jnp.int32))}
    for kernel in (False, True):
        m = dataclasses.replace(lm, attn_kernel=kernel)
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, m.init(jax.random.PRNGKey(0)))

        fwd = jax.jit(lambda p, s, c: m.forward(p, s, c)[0])

        # params ride through the input tuple: closed-over params become
        # jaxpr constants (huge program uploads through the remote tunnel)
        def step(carry, inp):
            s, p = inp
            lg = fwd(p, s + (carry * 1e-20).astype(jnp.int32), ct)
            return (), lg.astype(jnp.float32).mean()

        dt, _ = chained_throughput(step, [(seq, params), (seq + 1, params)],
                                   iters=12)
        print(f"magnet fwd B{B}xS{S} attn_kernel={kernel}: {dt*1e3:.2f} ms "
              f"(x50 steps = {dt*50*1e3:.0f} ms / 10 s clip)", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    sections = sys.argv[1:] or ['parity', 'train', 'magnet']
    if 'parity' in sections:
        parity()
    if 'train' in sections:
        train(250, 16)
        train(1500, 4)
    if 'train750' in sections:   # crossover probe
        train(750, 8)
    if 'train1500b8' in sections:
        train(1500, 8)
    if 'train1500remat' in sections:   # remat + flash: batch back up at 30 s
        train(1500, 16, checkpointing=True, kernels=(True,))
        train(1500, 8, checkpointing=True, kernels=(True,))
    if 'magnet' in sections:
        magnet()


if __name__ == "__main__":
    main()
