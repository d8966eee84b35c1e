"""Pallas LSTM recurrence kernel vs the lax.scan path on the real chip.

Two levels (PERF.md: standalone probes overstate — in-graph is the metric):
1. standalone single layer at the encoder's LSTM shape (H=1024, T=500);
2. full EnCodec-32k encode with lstm_kernel on/off (bf16, b32 + b128),
   plus a token-match check.
"""
import jax
import jax.numpy as jnp
import numpy as np

from audiocraft_tpu.builders import get_encodec_32khz
from audiocraft_tpu.nn.lstm import StreamableLSTM, lstm_layer
from audiocraft_tpu.obs import chained_throughput
from audiocraft_tpu.ops.lstm_pallas import lstm_layer_pallas
from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()


def standalone(B, T=500, H=1024, dtype=jnp.bfloat16):
    p = StreamableLSTM(H, num_layers=1).init(jax.random.PRNGKey(0))['l0']
    p = jax.tree.map(lambda a: a.astype(dtype), p)
    xs = [jnp.asarray(np.random.RandomState(i).randn(T, B, H)
                      .astype(np.float32) * 0.3).astype(dtype)
          for i in range(2)]

    def scan_step(carry, x):
        y = lstm_layer(x + carry.astype(dtype), p['w_ih'], p['w_hh'],
                       p['b_ih'], p['b_hh'])
        return y, jnp.mean(y).astype(jnp.float32)

    def kern_step(carry, x):
        y = lstm_layer_pallas(x + carry.astype(dtype), p['w_ih'], p['w_hh'],
                              p['b_ih'], p['b_hh'])
        return y, jnp.mean(y).astype(jnp.float32)

    dt_s, _ = chained_throughput(scan_step, xs)
    dt_k, _ = chained_throughput(kern_step, xs)
    print(f"standalone lstm T{T} B{B} H{H} {jnp.dtype(dtype).name}: "
          f"scan {dt_s*1e3:.2f} ms  kernel {dt_k*1e3:.2f} ms "
          f"({dt_s/dt_k:.2f}x)", flush=True)


def in_graph(B, seconds=1.0):
    model = get_encodec_32khz()  # bf16 production default
    params = model.init(jax.random.PRNGKey(0))
    T = int(seconds * model.sample_rate)
    xs = [jnp.asarray(np.random.RandomState(i).randn(B, 1, T)
                      .astype(np.float32) * 0.2) for i in range(2)]

    def enc(kern):
        def step(carry, x):
            codes, _ = model.encode(params, x + carry.reshape(1, 1, 1),
                                    lstm_kernel=kern)
            return codes, jnp.sum(codes).astype(jnp.float32) * 1e-9
        return step

    dt_x, thr_x = chained_throughput(enc(False), xs, units_per_iter=B * seconds)
    dt_k, thr_k = chained_throughput(enc(True), xs, units_per_iter=B * seconds)
    c_x, _ = jax.jit(lambda x: model.encode(params, x))(xs[0])
    c_k, _ = jax.jit(lambda x: model.encode(params, x,
                                            lstm_kernel=True))(xs[0])
    match = float(jnp.mean((c_x == c_k).astype(jnp.float32)))
    print(f"encode b{B} bf16: xla {dt_x*1e3:.1f} ms ({thr_x:.0f} a-s/s)  "
          f"lstm_kernel {dt_k*1e3:.1f} ms ({thr_k:.0f} a-s/s)  "
          f"token match {match:.6f}", flush=True)


def in_graph_decode(B, seconds=1.0):
    model = get_encodec_32khz()
    params = model.init(jax.random.PRNGKey(0))
    n_frames = int(seconds * model.frame_rate)
    rs = np.random.RandomState(0)
    codes = [jnp.asarray(rs.randint(0, model.quantizer.bins,
                                    size=(B, model.quantizer.n_q, n_frames))
                         .astype(np.int32)) for _ in range(2)]

    def dec(kern):
        def step(carry, c):
            wav = model.decode(params, (c + carry.astype(jnp.int32) * 0)
                               % model.quantizer.bins, lstm_kernel=kern)
            return wav, jnp.sum(wav[:, :, :8]).astype(jnp.float32) * 1e-9
        return step

    dt_x, thr_x = chained_throughput(dec(False), codes, units_per_iter=B * seconds)
    dt_k, thr_k = chained_throughput(dec(True), codes, units_per_iter=B * seconds)
    w_x = jax.jit(lambda c: model.decode(params, c))(codes[0])
    w_k = jax.jit(lambda c: model.decode(params, c, lstm_kernel=True))(codes[0])
    err = float(jnp.max(jnp.abs(w_x - w_k)))
    print(f"decode b{B} bf16: xla {dt_x*1e3:.1f} ms ({thr_x:.0f} a-s/s)  "
          f"lstm_kernel {dt_k*1e3:.1f} ms ({thr_k:.0f} a-s/s)  "
          f"max err {err:.2e}", flush=True)


def main():
    # Stage-selectable: each Mosaic compile is 10-20 min through the remote
    # tunnel, so run `python perf_lstm_kernel.py standalone|b32|b128` as
    # separate detached jobs rather than one 4-compile marathon.
    import sys
    stage = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if stage in ('standalone', 'all'):
        standalone(32)
        standalone(128)
    if stage in ('b32', 'all'):
        in_graph(32, seconds=10.0)  # headline workload: 10 s -> 500 steps
    if stage in ('b128', 'all'):
        in_graph(128, seconds=10.0)
    if stage in ('dec32', 'all'):
        in_graph_decode(32, seconds=10.0)


if __name__ == "__main__":
    main()
