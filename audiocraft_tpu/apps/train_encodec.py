"""CLI: data-parallel EnCodec reconstruction training (the role of the
reference's stripped compression solver, SURVEY §7 M7).

    python -m audiocraft_tpu.apps.train_encodec DATA_DIR \
        [--steps 100] [--batch 8] [--segment 1.0] [--ckpt out_ckpt] [--debug]

Shards each global batch across all local devices over a ('data',) mesh; the
RVQ EMA statistics all-reduce over the mesh via GSPMD.  DATA_DIR may be a
directory of wavs or a jsonl manifest; `--synthetic` trains on generated
noise (pipeline smoke test without a corpus).

Run management (the stripped solver's checkpoint.th role): ``--save-every``
writes the full training state (optimizer moments, discriminator, balancer,
step, RNG) next to the model checkpoint; ``--resume`` continues an
interrupted run from it.  ``--ema-decay`` maintains an exponential moving
average of the generator weights (the upstream ``ModuleDictEMA`` whose state
the exporter ships as ``best_state``) and exports it as the model
checkpoint's weights.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('data', nargs='?', default=None)
    parser.add_argument('--steps', type=int, default=100)
    parser.add_argument('--batch', type=int, default=8)
    parser.add_argument('--segment', type=float, default=1.0)
    parser.add_argument('--lr', type=float, default=3e-4)
    parser.add_argument('--lr-schedule', default=None,
                        choices=['cosine', 'inverse_sqrt', 'polynomial',
                                 'linear_warmup'],
                        help='LR schedule (default: constant --lr)')
    parser.add_argument('--warmup', type=int, default=0,
                        help='warmup steps for --lr-schedule')
    parser.add_argument('--optimizer', default='adam',
                        choices=['adam', 'adamw'])
    parser.add_argument('--weight-decay', type=float, default=0.0)
    parser.add_argument('--max-grad-norm', type=float, default=None)
    parser.add_argument('--ema-decay', type=float, default=0.0,
                        help='>0: keep a weight EMA and export it as the '
                             'checkpoint weights')
    parser.add_argument('--ckpt', default=None)
    parser.add_argument('--save-every', type=int, default=0,
                        help='>0: save full train state every N steps '
                             '(requires --ckpt)')
    parser.add_argument('--resume', action='store_true',
                        help='resume from the train state in --ckpt')
    parser.add_argument('--debug', action='store_true',
                        help='tiny debug codec config')
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--log-every', type=int, default=10)
    parser.add_argument('--compute-dtype', default=None,
                        choices=['bfloat16'],
                        help='mixed precision: bf16 forward/backward, fp32 '
                             'master params + optimizer (dist/train.py)')
    parser.add_argument('--adversarial', action='store_true',
                        help='full EnCodec GAN recipe: MS-STFT discriminator '
                             '+ hinge/feature-matching + multi-scale mel, '
                             'combined by the gradient balancer')
    parser.add_argument('--d-lr', type=float, default=3e-4,
                        help='discriminator learning rate (GAN mode)')
    args = parser.parse_args(argv)
    if (args.save_every or args.resume) and not args.ckpt:
        parser.error('--save-every/--resume require --ckpt')

    import jax
    from ..utils.misc import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..builders import get_debug_compression_model, get_encodec_32khz
    from ..ckpt.io import save_checkpoint
    from ..ckpt.train_state import (has_train_state, load_train_state,
                                    save_train_state)
    from ..data.audio_dataset import AudioDataset
    from ..dist.mesh import make_mesh
    from ..dist.train import make_encodec_train_step
    from ..optim import ema_update, get_lr_schedule, make_optimizer

    model = get_debug_compression_model(32000) if args.debug \
        else get_encodec_32khz()
    params = model.init(jax.random.PRNGKey(0))
    grad_params = {k: v for k, v in params.items() if k != 'quantizer'}
    ema_state = params['quantizer']
    lr = get_lr_schedule(args.lr_schedule, args.lr, warmup_steps=args.warmup,
                         total_steps=args.steps)
    optimizer = make_optimizer(args.optimizer, lr,
                               weight_decay=args.weight_decay,
                               max_grad_norm=args.max_grad_norm)
    opt_state = optimizer.init(grad_params)

    n_dev = jax.local_device_count()
    mesh = make_mesh(n_data=n_dev, n_model=1)
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P('data'))
    grad_params = jax.device_put(grad_params, repl)
    ema_state = jax.device_put(ema_state, repl)
    opt_state = jax.device_put(opt_state, repl)

    assert args.batch % n_dev == 0, \
        f"batch {args.batch} must divide across {n_dev} devices"
    seg = int(args.segment * model.sample_rate)

    if args.synthetic or args.data is None:
        rng = np.random.RandomState(0)

        def batches():
            while True:
                yield (rng.randn(args.batch, 1, seg) * 0.1).astype(np.float32)
        batch_iter = batches()
    else:
        ds = AudioDataset.from_path(args.data, segment_duration=args.segment,
                                    sample_rate=model.sample_rate, channels=1,
                                    num_samples=args.steps * args.batch)
        ds.start_epoch(0)

        def batches():
            while True:
                for b in ds.iter_batches(args.batch,
                                         jax.process_index(),
                                         jax.process_count()):
                    yield b
        batch_iter = batches()

    key = jax.random.PRNGKey(1)
    # real copy, not device_put: the step donates grad_params' buffers and
    # device_put with an identical sharding aliases instead of copying
    wema = jax.tree.map(jnp.copy, grad_params) if args.ema_decay > 0 else ()
    ema_fn = jax.jit(ema_update, static_argnums=(2,), donate_argnums=(0,)) \
        if args.ema_decay > 0 else None
    t0 = time.perf_counter()

    if args.adversarial:
        from ..adversarial import MultiScaleSTFTDiscriminator
        from ..dist.train import make_encodec_gan_train_step
        from ..losses import Balancer
        disc = (MultiScaleSTFTDiscriminator(filters=4, n_ffts=(256, 128),
                                            hop_lengths=(64, 32),
                                            win_lengths=(256, 128))
                if args.debug else MultiScaleSTFTDiscriminator())
        d_params = jax.device_put(disc.init(jax.random.PRNGKey(2)), repl)
        d_optimizer = make_optimizer(args.optimizer, args.d_lr)
        d_opt_state = jax.device_put(d_optimizer.init(d_params), repl)
        balancer = Balancer(weights={'l1': 0.1, 'l2': 1.0, 'msspec': 3.0,
                                     'adv': 4.0, 'feat': 4.0})
        bal_state = jax.device_put(balancer.init_state(), repl)
        gan_fn = jax.jit(make_encodec_gan_train_step(
            model, disc, optimizer, d_optimizer, balancer=balancer,
            compute_dtype=args.compute_dtype),
            donate_argnums=(0, 1, 2, 3, 4, 5))

        def pack():
            return {'params': grad_params, 'quantizer': ema_state,
                    'opt': opt_state, 'd_params': d_params,
                    'd_opt': d_opt_state, 'bal': bal_state, 'key': key,
                    'wema': wema}
        start_step = 0
        if args.resume and has_train_state(args.ckpt):
            state, start_step, _ = load_train_state(args.ckpt, pack())
            state = jax.device_put(state, repl)
            grad_params, ema_state = state['params'], state['quantizer']
            opt_state, d_params = state['opt'], state['d_params']
            d_opt_state, bal_state = state['d_opt'], state['bal']
            key, wema = state['key'], state['wema']
            print(f"resumed GAN run at step {start_step}", flush=True)

        for step in range(start_step, args.steps):
            x = jax.device_put(jnp.asarray(next(batch_iter)), dsh)
            key, sub = jax.random.split(key)
            (grad_params, ema_state, opt_state, d_params, d_opt_state,
             bal_state, metrics) = gan_fn(grad_params, ema_state, opt_state,
                                          d_params, d_opt_state, bal_state,
                                          x, sub)
            if ema_fn is not None:
                wema = ema_fn(wema, grad_params, args.ema_decay)
            if step % args.log_every == 0 or step == args.steps - 1:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                print(f"step {step:5d}  l1 {m['l1']:.4f}  "
                      f"msspec {m['msspec']:.4f}  adv {m['adv']:.4f}  "
                      f"d {m['d_loss']:.4f}  ({dt:.1f}s)", flush=True)
            if args.save_every and (step + 1) % args.save_every == 0:
                save_train_state(args.ckpt, pack(), step + 1)
    else:
        step_fn = jax.jit(make_encodec_train_step(
            model, optimizer, compute_dtype=args.compute_dtype),
                          donate_argnums=(0, 1, 2))

        def pack():
            return {'params': grad_params, 'quantizer': ema_state,
                    'opt': opt_state, 'key': key, 'wema': wema}
        start_step = 0
        if args.resume and has_train_state(args.ckpt):
            state, start_step, _ = load_train_state(args.ckpt, pack())
            state = jax.device_put(state, repl)
            grad_params, ema_state = state['params'], state['quantizer']
            opt_state, key, wema = state['opt'], state['key'], state['wema']
            print(f"resumed at step {start_step}", flush=True)

        for step in range(start_step, args.steps):
            x = jax.device_put(jnp.asarray(next(batch_iter)), dsh)
            key, sub = jax.random.split(key)
            grad_params, ema_state, opt_state, metrics = step_fn(
                grad_params, ema_state, opt_state, x, sub)
            if ema_fn is not None:
                wema = ema_fn(wema, grad_params, args.ema_decay)
            if step % args.log_every == 0 or step == args.steps - 1:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                print(f"step {step:5d}  loss {m['loss']:.4f}  "
                      f"l1 {m['l1']:.4f}  penalty {m['penalty']:.4f}  "
                      f"({dt:.1f}s)", flush=True)
            if args.save_every and (step + 1) % args.save_every == 0:
                save_train_state(args.ckpt, pack(), step + 1)

    if args.ckpt:
        if args.save_every:
            save_train_state(args.ckpt, pack(), args.steps)
        export_params = wema if args.ema_decay > 0 else grad_params
        full = dict(export_params)
        full['quantizer'] = ema_state
        save_checkpoint(args.ckpt, model, full,
                        extra={'steps': args.steps,
                               'weights': 'ema' if args.ema_decay > 0
                               else 'raw'})
        print(f"saved checkpoint to {args.ckpt}")


if __name__ == '__main__':
    main()
