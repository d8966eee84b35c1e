"""MusicGen-medium (1.5B-class) training point on one chip (VERDICT r3 #3).

The reference trains medium/large with FSDP on GPU clusters
(/root/reference/audiocraft/models/lm.py:176-177,310); on a single v5e
chip the question is what fits and what it costs.  Memory math first
(params ~1.77e9 for dim=1536 x 48 layers incl. cross-attn + heads):

  fp32 masters + adamw: 7.1 + 14.2 GB moments = 21.3 GB  -> cannot fit
  bf16 masters + adamw: 3.5 + 7.1 GB           = 10.6 GB -> headroom ~5 GB
                                                   for grads + activations

Cases (run one per invocation: `python perf_train_medium.py CASE`):
  oom_fp32    allocate fp32 masters + adam moments only (no compile) —
              records the OOM boundary fast
  bf16_b4     bf16 masters + adamw, B=4 x S=250 (5 s tokens)
  bf16_b8     same, B=8
  bf16_b8_remat  B=8 with per-layer jax.checkpoint
  bf16_b8_ga2    B=8 with grad_accum=2 (activation memory of B=4)
  bf16_s1500_b1  B=1 x S=1500 — the reference's REAL 30 s training
                 segment (dataset.segment_duration=30 -> 1500 tokens);
                 attn_kernel='auto' routes the Pallas flash kernel here
                 (the einsum backward's fp32 [B,H,S,S] scores cannot fit).
                 Measured: OOMs by 489 MB without remat (16.22/15.75 G)
  bf16_s1500_b1_remat  B=1 x S=1500 with per-layer jax.checkpoint
  bf16_s1500_b2  same, B=2 (expected OOM without remat)
  bf16_s1500_b2_remat  B=2 x S=1500 with per-layer jax.checkpoint
  bf16_s1500_b2_ga2    B=2 x S=1500 via grad_accum=2 (B=1 activations)

Launch detached (fresh 48-layer fwd+bwd programs -> long compile budget;
S=1500 cases add a Mosaic flash-kernel compile, 10-20 min):
    setsid bash -c 'PYTHONPATH=/root/repo:$PYTHONPATH timeout 3400 \
        python scripts/perf_train_medium.py bf16_b4 \
        > /tmp/perf_medium_bf16_b4.log 2>&1' &
or the whole battery: scripts/run_perf_medium_all.sh
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

import optax  # noqa: E402

from audiocraft_tpu.builders import get_musicgen_lm  # noqa: E402
from audiocraft_tpu.dist.train import make_lm_train_step  # noqa: E402

S = 250  # 5 s at 50 Hz for the short cases; *_s1500_* cases override to
         # the reference's real 30 s segment length (1500 tokens at 50 Hz)


def param_count(tree) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree.leaves(tree)
               if hasattr(a, 'shape'))


def build(checkpointing: bool = False):
    lm, _ = get_musicgen_lm('medium')
    if checkpointing:
        lm = dataclasses.replace(lm, checkpointing=True)
    return lm


def bf16_params(lm):
    params = lm.init(jax.random.PRNGKey(0))
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)


def run_case(case: str):
    if case == 'oom_fp32':
        lm = build()
        params = lm.init(jax.random.PRNGKey(0))
        n = param_count(params)
        print(f"params: {n/1e9:.2f}B, fp32 masters {n*4/2**30:.1f} GiB",
              flush=True)
        opt = optax.adamw(1e-4)
        try:
            state = opt.init(params)
            # block_until_ready does NOT materialize on axon (CLAUDE.md);
            # force every master + moment buffer live simultaneously by
            # summing them all in one jitted program and fetching a scalar.
            touch = jax.jit(lambda p, s: sum(
                jnp.sum(l).astype(jnp.float32)
                for l in jax.tree.leaves((p, s))
                if hasattr(l, 'dtype') and jnp.issubdtype(l.dtype, jnp.floating)))
            print(f"touch scalar: {float(touch(params, state)):.3f} — "
                  "fp32 masters + adamw moments fit (NO OOM)", flush=True)
        except Exception as exc:  # RESOURCE_EXHAUSTED
            print(f"fp32 adamw OOM as predicted: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
        return

    B = {'bf16_b4': 4, 'bf16_b8': 8, 'bf16_b8_remat': 8, 'bf16_b8_ga2': 8,
         'bf16_s1500_b1': 1, 'bf16_s1500_b1_remat': 1,
         'bf16_s1500_b2': 2, 'bf16_s1500_b2_remat': 2,
         'bf16_s1500_b2_ga2': 2}[case]
    seq = 1500 if '_s1500_' in case else S
    ga = 2 if case.endswith('ga2') else 1
    lm = build(checkpointing=case.endswith('remat'))
    params = bf16_params(lm)
    n = param_count(params)
    print(f"params: {n/1e9:.2f}B bf16 ({n*2/2**30:.1f} GiB) | B={B} S={seq} "
          f"grad_accum={ga} remat={case.endswith('remat')}", flush=True)
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)
    step = jax.jit(make_lm_train_step(lm, opt, grad_accum=ga),
                   donate_argnums=(0, 1))
    codes = [jnp.asarray(np.random.RandomState(i).randint(0, 2048,
                                                          (B, 4, seq)))
             for i in range(2)]
    cond = jnp.asarray(np.random.RandomState(9).randn(B, 6, lm.dim)
                       .astype(np.float32))
    cmask = jnp.ones((B, 6), jnp.int32)
    t0 = time.perf_counter()
    for i in range(4):  # >=4 warmups (axon post-compile overhead)
        params, opt_state, m = step(params, opt_state, codes[i % 2],
                                    {'description': (cond, cmask)})
    print(f"compile+warmup: {time.perf_counter()-t0:.0f} s, "
          f"loss {float(m['loss']):.3f}", flush=True)
    iters = 6
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, m = step(params, opt_state, codes[i % 2],
                                    {'description': (cond, cmask)})
    float(m['loss'])
    dt = (time.perf_counter() - t0) / iters
    flops = 6.0 * n * B * seq
    print(f"{case}: {dt*1e3:.1f} ms/step | {B*4*seq/dt/1e3:.1f} k codes/s | "
          f"{flops/dt/1e12:.1f} TFLOP/s model", flush=True)


if __name__ == '__main__':
    run_case(sys.argv[1])
