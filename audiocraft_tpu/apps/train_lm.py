"""CLI: MusicGen LM training over EnCodec tokens (the role of the reference's
stripped musicgen solver; delay-pattern masked cross-entropy with CFG
dropout, data×model sharded over a GSPMD mesh).

    python -m audiocraft_tpu.apps.train_lm DATA_DIR --codec-ckpt CKPT \
        [--steps 100] [--batch 8] [--segment 2.0] [--ckpt out] [--debug]

DATA_DIR may be a wav directory / jsonl manifest; ``--synthetic`` trains on
random tokens (pipeline smoke test).  Audio batches are tokenized through the
(frozen) codec on device, then the LM trains on the codes with
classifier-free-guidance text dropout — the full reference training recipe
(lm.py:270-321 compute_predictions + the solvers' CE) minus the corpus.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('data', nargs='?', default=None)
    parser.add_argument('--steps', type=int, default=50)
    parser.add_argument('--batch', type=int, default=4)
    parser.add_argument('--segment', type=float, default=2.0)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--lr-schedule', default=None,
                        choices=['cosine', 'inverse_sqrt', 'polynomial',
                                 'linear_warmup'],
                        help='LR schedule (default: constant --lr); MusicGen '
                             'trains with cosine + warmup')
    parser.add_argument('--warmup', type=int, default=0)
    parser.add_argument('--weight-decay', type=float, default=0.1)
    parser.add_argument('--max-grad-norm', type=float, default=None)
    parser.add_argument('--ema-decay', type=float, default=0.0,
                        help='>0: keep a weight EMA and export it as the '
                             'checkpoint weights')
    parser.add_argument('--cfg-dropout', type=float, default=0.1)
    parser.add_argument('--ckpt', default=None)
    parser.add_argument('--save-every', type=int, default=0,
                        help='>0: save full train state every N steps '
                             '(requires --ckpt)')
    parser.add_argument('--resume', action='store_true',
                        help='resume from the train state in --ckpt')
    parser.add_argument('--codec-ckpt', default=None,
                        help='imported codec checkpoint dir (default: '
                             'random debug codec)')
    parser.add_argument('--debug', action='store_true',
                        help='debug-size LM + codec')
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--log-every', type=int, default=10)
    parser.add_argument('--grad-accum', type=int, default=1,
                        help='sequential microbatches per optimizer step '
                             '(activation memory / A at the same effective '
                             'batch; --batch must be divisible by it)')
    parser.add_argument('--compute-dtype', default=None,
                        choices=['bfloat16'],
                        help='mixed precision: bf16 forward/backward, fp32 '
                             'master params + optimizer (dist/train.py)')
    args = parser.parse_args(argv)
    if (args.save_every or args.resume) and not args.ckpt:
        parser.error('--save-every/--resume require --ckpt')

    import jax
    from ..utils.misc import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..builders import (get_debug_compression_model,
                            get_debug_musicgen_lm, get_musicgen_lm)
    from ..ckpt.io import load_checkpoint, save_checkpoint
    from ..ckpt.train_state import (has_train_state, load_train_state,
                                    save_train_state)
    from ..cond.attributes import ClassifierFreeGuidanceDropout, \
        ConditioningAttributes
    from ..data.audio_dataset import AudioDataset
    from ..dist.mesh import make_mesh
    from ..dist.train import make_lm_train_step, make_lm_train_step_dp
    from ..optim import ema_update, get_lr_schedule, make_optimizer

    # ---- models
    if args.codec_ckpt:
        codec, codec_params, _ = load_checkpoint(args.codec_ckpt)
        codec_params = jax.tree.map(jnp.asarray, codec_params)
    else:
        codec = get_debug_compression_model(32000)
        codec_params = codec.init(jax.random.PRNGKey(0))
    if args.debug:
        lm, provider = get_debug_musicgen_lm()
    else:
        lm, provider = get_musicgen_lm('small', n_q=codec.num_codebooks)
    lm_params = lm.init(jax.random.PRNGKey(1))
    cond_params = provider.init(jax.random.PRNGKey(2))

    lr = get_lr_schedule(args.lr_schedule, args.lr, warmup_steps=args.warmup,
                         total_steps=args.steps)
    optimizer = make_optimizer('adamw', lr, betas=(0.9, 0.95),
                               weight_decay=args.weight_decay,
                               max_grad_norm=args.max_grad_norm)
    opt_state = optimizer.init(lm_params)

    n_dev = jax.local_device_count()
    mesh = make_mesh(n_data=n_dev, n_model=1)
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P('data'))
    lm_params = jax.device_put(lm_params, repl)
    opt_state = jax.device_put(opt_state, repl)
    codec_params = jax.device_put(codec_params, repl)
    assert args.batch % n_dev == 0

    # ---- data -> (wav batches, texts)
    seg = int(args.segment * codec.sample_rate)
    if args.synthetic or args.data is None:
        rng = np.random.RandomState(0)

        def batches():
            while True:
                yield ((rng.randn(args.batch, 1, seg) * 0.1)
                       .astype(np.float32), ['synthetic'] * args.batch)
    else:
        ds = AudioDataset.from_path(args.data, segment_duration=args.segment,
                                    sample_rate=codec.sample_rate, channels=1,
                                    num_samples=args.steps * args.batch)
        ds.start_epoch(0)

        def batches():
            while True:
                for b in ds.iter_batches(args.batch, jax.process_index(),
                                         jax.process_count()):
                    yield b, [''] * args.batch
    batch_iter = batches()

    encode = jax.jit(lambda p, x: codec.encode(p, x)[0])
    if n_dev > 1:
        # explicit shard_map dp: same math as the global-view step, and the
        # flash-attention 'auto' route works per-shard (long segments)
        step = make_lm_train_step_dp(lm, optimizer, mesh,
                                     compute_dtype=args.compute_dtype,
                                     grad_accum=args.grad_accum)
    else:
        step = make_lm_train_step(lm, optimizer,
                                  compute_dtype=args.compute_dtype,
                                  grad_accum=args.grad_accum)
    step_fn = jax.jit(step, donate_argnums=(0, 1))
    cfg_drop = ClassifierFreeGuidanceDropout(p=args.cfg_dropout)

    # real copy, not device_put: the step donates lm_params' buffers and
    # device_put with an identical sharding aliases instead of copying
    wema = jax.tree.map(jnp.copy, lm_params) if args.ema_decay > 0 else ()
    ema_fn = jax.jit(ema_update, static_argnums=(2,), donate_argnums=(0,)) \
        if args.ema_decay > 0 else None

    def pack():
        return {'params': lm_params, 'opt': opt_state, 'wema': wema}
    start_step = 0
    if args.resume and has_train_state(args.ckpt):
        state, start_step, _ = load_train_state(args.ckpt, pack())
        state = jax.device_put(state, repl)
        lm_params, opt_state, wema = (state['params'], state['opt'],
                                      state['wema'])
        print(f"resumed at step {start_step}", flush=True)

    t0 = time.perf_counter()
    for step in range(start_step, args.steps):
        wav, texts = next(batch_iter)
        attrs = [ConditioningAttributes(text={'description': t})
                 for t in texts]
        attrs = cfg_drop(attrs)
        tokenized = provider.tokenize(attrs)
        cond_tensors = provider(cond_params, tokenized)
        codes = encode(codec_params, jax.device_put(jnp.asarray(wav), dsh))
        lm_params, opt_state, metrics = step_fn(lm_params, opt_state, codes,
                                                cond_tensors)
        if ema_fn is not None:
            wema = ema_fn(wema, lm_params, args.ema_decay)
        if step % args.log_every == 0 or step == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"step {step:5d}  ce {m['loss']:.4f}  "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
        if args.save_every and (step + 1) % args.save_every == 0:
            save_train_state(args.ckpt, pack(), step + 1)

    if args.ckpt:
        if args.save_every:
            save_train_state(args.ckpt, pack(), args.steps)
        export = wema if args.ema_decay > 0 else lm_params
        save_checkpoint(args.ckpt,
                        {'lm': lm, 'condition_provider': provider},
                        {'lm': export, 'condition_provider': cond_params},
                        extra={'steps': args.steps,
                               'weights': 'ema' if args.ema_decay > 0
                               else 'raw'})
        print(f"saved checkpoint to {args.ckpt}")


if __name__ == '__main__':
    main()
