"""MusicGen-large (3.3B) int8 decode on ONE v5e chip.

fp32 init (13.5 GB) + an int8 copy would overflow 16 GB HBM, so the int8
param tree is synthesized directly from jax.eval_shape with the same
structure quantize_lm_params produces (random weights are fine for a
throughput point — decode cost is data-independent).  Roofline: ~3.3 GB of
int8 weights/step over ~330 GB/s effective = ~10 ms/step (~100 steps/s).
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from audiocraft_tpu.builders import get_musicgen_lm
from audiocraft_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()

STEPS, B = 100, 2


def synth_quantized(shapes) -> dict:
    """Random param tree in quantize_lm_params' int8 layout, built leaf by
    leaf on device (bf16 for non-matrix floats)."""
    rng = np.random.RandomState(0)

    def rand_int8(shape):
        return jnp.asarray(rng.randint(-127, 128, shape, dtype=np.int8))

    def rand_f(shape, dt=jnp.bfloat16, scale=0.02):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale
                           ).astype(dt)

    def q_leaf(sd):  # {'q','s'} for [out, in]
        return {'q': rand_int8(sd.shape),
                's': jnp.full(sd.shape[:-1], 1e-2, jnp.float32)}

    def walk(node, path=()):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                out[k] = walk(v, path + (k,))
            return out
        # quantize the same leaves quantize_lm_params does
        inside_tf = len(path) >= 2 and path[0] == 'transformer'
        key = path[-1]
        parent = path[-2] if len(path) >= 2 else ''
        if inside_tf and (key == 'in_proj_weight' or (
                key == 'weight' and parent in ('out_proj', 'linear1',
                                               'linear2'))):
            return q_leaf(node)
        if path[0] == 'linears' and key == 'weight':
            return q_leaf(node)
        if jnp.issubdtype(node.dtype, jnp.floating):
            return rand_f(node.shape)
        return jnp.zeros(node.shape, node.dtype)

    return walk(shapes)


def main():
    lm, _ = get_musicgen_lm('large')
    shapes = jax.eval_shape(lm.init, jax.random.PRNGKey(0))
    n = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(shapes))
    print(f"large params: {n/1e9:.2f}B", flush=True)
    params = synth_quantized(shapes)
    qbytes = sum(a.nbytes for a in jax.tree.leaves(params))
    print(f"quantized tree: {qbytes/1e9:.2f} GB on device", flush=True)

    rng = np.random.RandomState(1)
    cond = jnp.asarray(rng.randn(2 * B, 6, lm.dim).astype(np.float32))
    mask = jnp.ones((2 * B, 6), jnp.int32)
    tensors = {'description': (cond, mask)}
    fn = jax.jit(lambda p, key, tens: lm.generate(
        p, key, condition_tensors=tens, num_samples=B, max_gen_len=STEPS,
        use_sampling=True, top_k=250, compute_dtype=jnp.bfloat16))
    out = fn(params, jax.random.PRNGKey(0), tensors)
    np.asarray(out)
    best = float('inf')
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(params, jax.random.PRNGKey(1 + i), tensors)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    print(f"int8 decode: {best * 1e3:.0f} ms / {STEPS} steps "
          f"-> {STEPS / best:.0f} steps/s "
          f"({STEPS / best / 50:.1f}x realtime/stream at B={B})", flush=True)


if __name__ == "__main__":
    main()
