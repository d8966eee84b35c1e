"""bf16 encoder path: token agreement with the fp32 parity path."""

import numpy as np
import jax
import jax.numpy as jnp

from audiocraft_tpu.builders import get_debug_compression_model
from audiocraft_tpu.builders import init_debug_compression_model


def test_bf16_encode_token_agreement():
    model = get_debug_compression_model(32000)
    params = init_debug_compression_model(model, jax.random.PRNGKey(0))
    wav = jnp.asarray(
        np.random.RandomState(1).randn(2, 1, 64000).astype(np.float32) * 0.2)
    codes32, _ = model.encode(params, wav)
    codes16, _ = model.encode(params, wav, compute_dtype=jnp.bfloat16)
    match = float((np.asarray(codes16) == np.asarray(codes32)).mean())
    # bf16 conv activations perturb near-tie argmins only; agreement should
    # stay very high (the fp32 path remains the parity reference)
    assert match > 0.95, f"bf16/fp32 token agreement too low: {match:.4f}"
