"""Compile + parity-check JUST the fused encode program (one Mosaic compile),
so the compilation cache carries it for every later run.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiocraft_tpu.builders import get_encodec_32khz
from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

model = get_encodec_32khz()
params = model.init(jax.random.PRNGKey(0))
sr, S, B = 32000, 10, 32
wav = jnp.asarray(np.random.RandomState(0).randn(B, 1, sr * S)
                  .astype(np.float32) * 0.1)
t0 = time.perf_counter()
cf = jax.jit(lambda x: model.encode(params, x, fused=True)[0])
codes = np.asarray(cf(wav))
print(f"fused compile+run: {time.perf_counter() - t0:.1f}s, "
      f"codes {codes.shape}, finite {np.isfinite(codes).all()}", flush=True)
t0 = time.perf_counter()
codes2 = np.asarray(cf(wav))
print(f"second call: {time.perf_counter() - t0:.2f}s, "
      f"stable {(codes == codes2).all()}", flush=True)
