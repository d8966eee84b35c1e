"""Cross-cutting utilities (reference audiocraft/utils/utils.py + autocast.py +
cluster.py counterparts)."""

from __future__ import annotations

import hashlib
import logging
import os
import typing as tp
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def model_hash(params) -> str:
    """SHA1 over all parameters for regression tracking
    (reference utils/utils.py:26-33)."""
    hasher = hashlib.sha1()
    leaves = jax.tree.leaves(params)
    for leaf in leaves:
        hasher.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return hasher.hexdigest()


def length_to_mask(lengths: jax.Array, max_len: tp.Optional[int] = None) -> jax.Array:
    """[B] lengths -> [B, T] boolean mask (reference utils.py:177-190).
    `max_len` must be static under jit."""
    assert lengths.ndim == 1
    final_length = max_len if max_len else int(jnp.max(lengths))
    final_length = max(final_length, 1)
    return jnp.arange(final_length)[None, :] < lengths[:, None]


_WARNED: set = set()


def warn_once(logger_: logging.Logger, msg: str) -> None:
    if msg not in _WARNED:
        _WARNED.add(msg)
        logger_.warning(msg)


# ------------------------------------------------------------- dtype policy

class DtypePolicy:
    """Mixed-precision policy — the role of the reference TorchAutocast
    (utils/autocast.py:10-40) in functional form: cast inputs/params for the
    compute-heavy sections, keep fp32 where parity requires it (RVQ distance,
    attention softmax)."""

    def __init__(self, compute_dtype=jnp.float32, param_dtype=jnp.float32):
        self.compute_dtype = compute_dtype
        self.param_dtype = param_dtype

    @property
    def enabled(self) -> bool:
        return self.compute_dtype != jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating)
            else x, tree)


BF16_POLICY = DtypePolicy(compute_dtype=jnp.bfloat16)
FP32_POLICY = DtypePolicy()


# -------------------------------------------------------------- environment

def _guess_cluster_type() -> str:
    """Identify the compute environment (reference utils/cluster.py:21-43,
    mapped to TPU-world signals instead of sinfo probing)."""
    if os.environ.get('SLURM_JOB_ID') or os.environ.get('SLURM_NODELIST'):
        return 'slurm'
    if os.environ.get('TPU_WORKER_HOSTNAMES') or \
            os.environ.get('JAX_COORDINATOR_ADDRESS'):
        return 'tpu_pod'
    return 'local'


class AudioCraftEnvironment:
    """Team/cluster environment resolution (reference environment.py:25-176).

    A yaml config (``AUDIOCRAFT_CONFIG``; the reference's
    ``config/teams/<team>.yaml``) keyed by cluster name provides per-cluster
    directories and ``dataset_mappers`` — regex→replacement rules applied to
    every manifest path so the same manifest of files works across clusters
    (reference environment.py:166-176).  Env vars override:
    ``AUDIOCRAFT_TEAM``, ``AUDIOCRAFT_CLUSTER``, ``AUDIOCRAFT_DORA_DIR``,
    ``AUDIOCRAFT_REFERENCE_DIR``, ``AUDIOCRAFT_CACHE_DIR``.
    """

    DEFAULT_TEAM = 'default'
    _instance: tp.Optional['AudioCraftEnvironment'] = None

    def __init__(self) -> None:
        import re
        self.team: str = os.environ.get('AUDIOCRAFT_TEAM', self.DEFAULT_TEAM)
        self.cluster: str = os.environ.get('AUDIOCRAFT_CLUSTER',
                                           _guess_cluster_type())
        self._config: dict = {}
        config_path = os.environ.get('AUDIOCRAFT_CONFIG', '')
        if config_path:
            import yaml
            with open(config_path) as f:
                self._config = yaml.safe_load(f) or {}
        self._dataset_mappers: tp.List[tp.Tuple[tp.Any, str]] = []
        mappers = self._cluster_config().get('dataset_mappers') or {}
        for pattern, repl in mappers.items():
            self._dataset_mappers.append((re.compile(pattern), repl))

    def _cluster_config(self) -> dict:
        cfg = self._config.get(self.cluster)
        return cfg if isinstance(cfg, dict) else {}

    @classmethod
    def instance(cls) -> 'AudioCraftEnvironment':
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    @classmethod
    def reset(cls) -> None:
        """Force a reload on next use (reference environment.py:84-87)."""
        cls._instance = None

    @classmethod
    def get_team(cls) -> str:
        return cls.instance().team

    @classmethod
    def get_cluster(cls) -> str:
        return cls.instance().cluster

    @classmethod
    def get_cache_dir(cls) -> str:
        return os.environ.get('AUDIOCRAFT_CACHE_DIR',
                              os.path.expanduser('~/.cache/audiocraft_tpu'))

    @classmethod
    def get_dora_dir(cls) -> str:
        """Experiment-output directory (reference environment.py:103-111;
        dora is the reference's xp manager — ours is just a directory)."""
        inst = cls.instance()
        return os.environ.get(
            'AUDIOCRAFT_DORA_DIR',
            str(inst._cluster_config().get('dora_dir', '')
                or os.path.join(cls.get_cache_dir(), 'xps')))

    @classmethod
    def get_reference_dir(cls) -> str:
        inst = cls.instance()
        return os.environ.get(
            'AUDIOCRAFT_REFERENCE_DIR',
            str(inst._cluster_config().get('reference_dir', '')))

    @classmethod
    def resolve_reference_path(cls, path: tp.Union[str, os.PathLike]) -> str:
        path = str(path)
        if path.startswith('//reference'):
            return path.replace('//reference', cls.get_reference_dir())
        return path

    @classmethod
    def apply_dataset_mappers(cls, path: str) -> str:
        """Rewrite a manifest path with the cluster's regex rules
        (reference environment.py:166-176); identity when none configured."""
        for regex, repl in cls.instance()._dataset_mappers:
            path = regex.sub(repl, path)
        return path


def cluster_info() -> dict:
    """TPU pod environment (the reference's SLURM detection, cluster.py:27-75,
    mapped to JAX multi-host concepts)."""
    return {
        'process_index': jax.process_index(),
        'process_count': jax.process_count(),
        'local_devices': jax.local_device_count(),
        'global_devices': jax.device_count(),
        'coordinator': os.environ.get('JAX_COORDINATOR_ADDRESS'),
        'tpu_worker_hostnames': os.environ.get('TPU_WORKER_HOSTNAMES'),
    }


@contextmanager
def write_and_rename(path, suffix: str = '.tmp'):
    """Atomic file write: write to a temp file then rename."""
    from pathlib import Path
    path = Path(path)
    tmp = path.with_name(path.name + suffix)
    with open(tmp, 'wb') as f:
        yield f
    tmp.rename(path)


def enable_compilation_cache(path: tp.Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache (saves the 30-120 s remote
    TPU compiles across processes).  Call before the first jitted execution."""
    import jax
    path = path or os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                  os.path.expanduser('~/.cache/jax_comp_cache'))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', path)
    except Exception as exc:  # pragma: no cover - older jax
        logger.warning('could not enable compilation cache: %r', exc)
