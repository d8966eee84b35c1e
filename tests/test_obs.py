"""obs/ module: counters, conformance metric, roofline math, bandwidth probe."""
import numpy as np

from audiocraft_tpu import obs


def test_meter_rates_and_report():
    m = obs.Meter()
    m.add(audio_seconds=10.0, tokens=2000, bytes_in=1_000_000)
    m.add(audio_seconds=5.0, tokens=1000, bytes_in=500_000, items=2)
    r = m.rates()
    assert m.items == 3 and m.audio_seconds == 15.0 and m.tokens == 3000
    assert r['audio_sec_per_s'] > 0 and r['tokens_per_s'] > 0
    assert '3 items' in m.report()


def test_token_match():
    a = np.array([[1, 2, 3], [4, 5, 6]])
    assert obs.token_match(a, a.copy()) == 1.0
    b = a.copy()
    b[0, 0] = 9
    assert abs(obs.token_match(a, b) - 5 / 6) < 1e-9
    assert obs.token_match(a, a[:1]) == 0.0  # shape mismatch


def test_roofline_math():
    r = obs.roofline(seconds=1.0, flops=197e12 / 2, bytes_moved=819e9 / 4)
    assert abs(r['pct_mxu'] - 50.0) < 1e-6
    assert abs(r['pct_hbm'] - 25.0) < 1e-6
    assert r['arithmetic_intensity'] > 0
    # effective-bandwidth constants exist and are below spec (PERF.md)
    assert obs.TPU_V5E_EFFECTIVE_COPY_GBS < obs.TPU_V5E_PEAK_HBM_GBS


def test_effective_bandwidth_probe_cpu():
    out = obs.effective_bandwidth_probe(size_mb=8, iters=2)
    assert out['copy_gbs'] > 0 and out['reduce_gbs'] > 0


def test_chained_throughput():
    import jax.numpy as jnp

    def step(c, x):
        y = x * 2
        return y, c + jnp.sum(y)

    dt, rate = obs.chained_throughput(step, [jnp.ones((16, 16))], iters=3,
                                      units_per_iter=4.0)
    assert dt > 0 and abs(rate - 4.0 / dt) < 1e-6
