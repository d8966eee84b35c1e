# audiocraft_tpu — a TPU-native audio tokenization and music generation framework.
#
# Built from scratch in JAX/XLA/Pallas with the capabilities of Meta Audiocraft
# (Oncorporation/UnlimitedMusicGen fork): EnCodec neural codec (SEANet + RVQ),
# MusicGen transformer LM with delay-pattern codebook interleaving, conditioning,
# and unlimited-length generation.
#
# Design: pure-functional modules. Each component is a hashable static config
# dataclass with `init(key) -> params` and `__call__(params, x, ...)` methods;
# params are pytrees of jax.Arrays. Everything on the compute path is jittable,
# shardable with jax.sharding, and free of Python-side mutable state.

__version__ = "0.1.0"
