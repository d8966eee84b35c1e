"""Session verify driver: int4 LM decode + banded/merged conv formulations,
driven at the package surface on the real TPU chip (see .claude/skills/verify).
"""
import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

# 1. encode -> decode e2e (package surface unchanged by this session's edits)
from audiocraft_tpu.builders import get_debug_compression_model
model = get_debug_compression_model(32000)
params = model.init(jax.random.PRNGKey(0))
wav = jnp.asarray(np.random.randn(1, 1, 64000).astype(np.float32) * 0.2)
codes, scale = model.encode(params, wav)
out = model.decode(params, codes)
print("encode/decode ok:", codes.shape, out.shape, flush=True)

# 2. debug MusicGen generate with int4 weight-only decode (the facade path)
from audiocraft_tpu.gen.musicgen import get_debug_musicgen
mg = get_debug_musicgen(jax.random.PRNGKey(1))
mg.set_generation_params(duration=0.4, use_sampling=True, top_k=8)
ref_wav = mg.generate(['a test prompt'])
mg.quantize_lm_weights(mode='int4', group_size=64)
q4_wav = mg.generate(['a test prompt'])
assert q4_wav.shape == ref_wav.shape, (q4_wav.shape, ref_wav.shape)
assert np.isfinite(np.asarray(q4_wav)).all()
print("int4 facade generate ok:", q4_wav.shape, flush=True)

# 3. banded / merged conv formulations vs the native conv, on TPU
from audiocraft_tpu.nn.conv import (StreamableConv1d, conv1d_banded_mono,
                                    conv1d_merged_rows, pad1d)
rs = np.random.RandomState(0)
# conv0 shape (mono, k7, stride 1)
m0 = StreamableConv1d(1, 64, 7, pad_mode='reflect')
p0 = m0.init(jax.random.PRNGKey(2))
x0 = jnp.asarray(rs.randn(2, 1, 4001).astype(np.float32) * 0.1)
ya = m0(p0, x0)
xp = pad1d(x0, (3, 3), mode='reflect')
yb = conv1d_banded_mono(xp, p0['weight'], p0['bias'])
d0 = float(jnp.max(jnp.abs(ya - yb)))
print(f"banded conv0 max|diff|={d0:.3e} exact={bool((ya == yb).all())}",
      flush=True)
assert d0 < 1e-5

# downsample shape (k=2s)
md = StreamableConv1d(16, 32, 8, stride=4, pad_mode='reflect')
pd = md.init(jax.random.PRNGKey(3))
xd = jnp.asarray(rs.randn(2, 16, 2000).astype(np.float32) * 0.1)
ya = md(pd, xd)
xq = pad1d(xd, (2, 2), mode='reflect')
yb = conv1d_merged_rows(xq, pd['weight'], pd['bias'], 4)
dd = float(jnp.max(jnp.abs(ya - yb)))
print(f"merged down max|diff|={dd:.3e} exact={bool((ya == yb).all())}",
      flush=True)
assert dd < 1e-5

print("VERIFY OK", flush=True)
