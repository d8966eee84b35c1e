"""Data-parallel tokenization scaling benchmark (BASELINE config 5 harness).

    python -m audiocraft_tpu.apps.scale_bench [--devices 1 2 4 8] \
        [--batch-per-device 8] [--seconds 10] [--cpu-virtual 8]

Measures audio-sec/s tokenized at increasing device counts on a ('data',)
mesh and reports scaling efficiency vs 1 device.  On a multi-chip/multi-host
platform this exercises real ICI; with --cpu-virtual N it validates the
sharded program on N virtual CPU devices (correctness of the scaling path,
not a performance statement).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--devices', type=int, nargs='+', default=None)
    parser.add_argument('--batch-per-device', type=int, default=8)
    parser.add_argument('--seconds', type=int, default=10)
    parser.add_argument('--iters', type=int, default=8)
    parser.add_argument('--cpu-virtual', type=int, default=0)
    parser.add_argument('--debug', action='store_true')
    args = parser.parse_args(argv)

    import os
    if args.cpu_virtual:
        os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                                   + f" --xla_force_host_platform_device_count={args.cpu_virtual}")
        os.environ['JAX_PLATFORMS'] = 'cpu'

    import jax
    from ..utils.misc import enable_compilation_cache
    enable_compilation_cache()
    if args.cpu_virtual:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..builders import get_debug_compression_model, get_encodec_32khz
    from ..dist.mesh import make_mesh

    model = get_debug_compression_model(32000) if (args.debug or args.cpu_virtual) \
        else get_encodec_32khz()
    params = model.init(jax.random.PRNGKey(0))
    sr = model.sample_rate

    all_devices = jax.devices()
    counts = args.devices or sorted({1, max(1, len(all_devices) // 2),
                                     len(all_devices)})
    counts = [c for c in counts if c <= len(all_devices)]

    results = []
    for n in counts:
        mesh = make_mesh(n_data=n, n_model=1, devices=all_devices[:n])
        repl = NamedSharding(mesh, P())
        dsh = NamedSharding(mesh, P('data'))
        p = jax.device_put(params, repl)
        B = args.batch_per_device * n
        wav = jax.device_put(jnp.asarray(
            np.random.RandomState(0).randn(B, 1, sr * args.seconds)
            .astype(np.float32) * 0.1), dsh)

        def step(p, x, carry):
            codes, _ = model.encode(p, x + carry * 1e-20)
            return jnp.sum(codes).astype(jnp.float32)

        step = jax.jit(step)
        carry = jnp.zeros(())
        carry = step(p, wav, carry)
        float(carry)
        t0 = time.perf_counter()
        carry = jnp.zeros(())
        for _ in range(args.iters):
            carry = step(p, wav, carry)
        float(carry)
        dt = (time.perf_counter() - t0) / args.iters
        throughput = B * args.seconds / dt
        results.append({'devices': n, 'audio_sec_per_s': round(throughput, 1)})
        base = results[0]['audio_sec_per_s']
        eff = throughput / (base * n / results[0]['devices'])
        print(json.dumps({**results[-1],
                          'scaling_efficiency': round(eff, 3)}), flush=True)


if __name__ == '__main__':
    main()
