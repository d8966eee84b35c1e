

def test_pipelined_two_layer_exact():
    """The skewed single-scan 2-layer path matches sequential to matmul
    rounding (bit-exact on TPU; on CPU the hoisted vs per-step input
    projection block differently).  Opt-in, measured slower on v5e."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from audiocraft_tpu.nn.lstm import StreamableLSTM
    seq = StreamableLSTM(32, 2, pipelined=False)
    pipe = StreamableLSTM(32, 2, pipelined=True)
    params = seq.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(1).randn(3, 32, 17)
                    .astype(np.float32))
    ya = seq(params, x)
    yb = pipe(params, x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-6, atol=1e-6)
