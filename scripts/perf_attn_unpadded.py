"""Does the flash kernel accept un-padded head_dim=64, and does it win?

The wrapper pads D 64->128 (exact, 2x attention FLOPs).  If Mosaic handles
64-lane blocks efficiently, dropping the pad halves the kernel's work.

    setsid bash -c 'PYTHONPATH=/root/repo:$PYTHONPATH timeout 3000 \
        python scripts/perf_attn_unpadded.py > /tmp/perf_attn_unpad.log 2>&1' &
"""

import numpy as np
import jax
from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp  # noqa: E402

from audiocraft_tpu.ops import attention_pallas  # noqa: E402
from audiocraft_tpu.obs import chained_throughput  # noqa: E402


def run_op(tag, B, T, H, D, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(B, T, H, D).astype(np.float32),
                           dtype=dtype) for _ in range(3))
    f = jax.jit(lambda q, k, v: attention_pallas.fused_attention(
        q, k, v, causal=True))
    try:
        a = np.asarray(f(q, k, v), np.float32)
    except Exception as e:
        print(f"{tag}: FAILED ({type(e).__name__}: {str(e)[:160]})",
              flush=True)
        return
    ref = np.asarray(attention_pallas._xla_attention(
        q, k, v, causal=True, sm_scale=float(1 / np.sqrt(D))), np.float32)
    err = np.abs(a - ref).max() / (np.abs(ref).max() + 1e-9)

    def step(carry, ops):
        o = f(ops[0] + (carry * 1e-20).astype(dtype), ops[1], ops[2])
        return (), o.astype(jnp.float32).mean()

    opsets = [(q + i * jnp.asarray(1e-3, dtype), k, v) for i in range(2)]
    dt, _ = chained_throughput(step, opsets, iters=12)
    print(f"{tag}: {dt*1e3:.3f} ms  (rel err {err:.1e})", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    for pad in (True, False):
        attention_pallas.PAD_HEAD_DIM = pad
        run_op(f"pad={pad} B8 S750 H16 D64", 8, 750, 16, 64)
        run_op(f"pad={pad} B4 S1500 H16 D64", 4, 1500, 16, 64)


if __name__ == "__main__":
    main()
