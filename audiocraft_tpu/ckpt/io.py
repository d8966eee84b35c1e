"""Checkpoint save/load with embedded model config.

Mirrors the reference convention (utils/export.py:20-79 + models/loaders.py):
a checkpoint carries ``{state, config, version, exported}`` where ``config``
fully rebuilds the model — so a checkpoint is self-describing.  Storage is a
directory with ``config.json`` + an ``.npz`` of the flattened param pytree
(portable, dependency-free; orbax can layer on top for async/multi-host
writes in production).
"""

from __future__ import annotations

import dataclasses
import json
import typing as tp
from pathlib import Path

import jax
import numpy as np

from .. import __version__

# --------------------------------------------------------------- config codec

_REGISTRY: tp.Dict[str, type] = {}


def _register(*classes):
    for cls in classes:
        _REGISTRY[cls.__name__] = cls


def _registry():
    if not _REGISTRY:
        from ..codec.encodec import EncodecModel
        from ..codec.stereo import InterleaveStereoCompressionModel
        from ..codec.wrappers import HFEncodecCompressionModel
        from ..cond.chroma_cond import ChromaConditioner
        from ..cond.joint_embed import JointEmbeddingConditioner
        from ..cond.style_cond import StyleConditioner
        from ..cond.conditioners import (ConditioningProvider, LUTConditioner,
                                         T5Conditioner)
        from ..cond.fuser import ConditionFuser
        from ..lm.model import LMModel
        from ..nn.seanet import SEANetDecoder, SEANetEncoder
        from ..nn.t5 import T5EncoderConfig
        from ..patterns.pattern import (CoarseFirstPattern,
                                        DelayedPatternProvider,
                                        MusicLMPattern,
                                        ParallelPatternProvider,
                                        UnrolledPatternProvider)
        from ..quant.base import DummyQuantizer
        from ..quant.vq import ResidualVectorQuantizer
        _register(EncodecModel, InterleaveStereoCompressionModel,
                  HFEncodecCompressionModel,
                  SEANetEncoder, SEANetDecoder, ResidualVectorQuantizer,
                  DummyQuantizer, LMModel, ConditionFuser, LUTConditioner,
                  T5Conditioner, T5EncoderConfig, ChromaConditioner,
                  StyleConditioner,
                  JointEmbeddingConditioner, ConditioningProvider,
                  DelayedPatternProvider, ParallelPatternProvider,
                  UnrolledPatternProvider, CoarseFirstPattern, MusicLMPattern)
    return _REGISTRY


def config_to_dict(obj) -> tp.Any:
    """Recursively encode a model/config object into JSON-able data."""
    reg = _registry()
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {
            '__class__': type(obj).__name__,
            'fields': {f.name: config_to_dict(getattr(obj, f.name))
                       for f in dataclasses.fields(obj)
                       if not f.name.startswith('_')},
        }
    if type(obj).__name__ in reg and not dataclasses.is_dataclass(obj):
        # pattern providers: plain classes with constructor-mirroring attrs
        import inspect
        sig = inspect.signature(type(obj).__init__)
        kwargs = {}
        for name in sig.parameters:
            if name == 'self':
                continue
            if hasattr(obj, name):
                kwargs[name] = config_to_dict(getattr(obj, name))
        return {'__class__': type(obj).__name__, 'kwargs': kwargs}
    if isinstance(obj, (list, tuple)):
        return {'__seq__': 'tuple' if isinstance(obj, tuple) else 'list',
                'items': [config_to_dict(x) for x in obj]}
    if isinstance(obj, dict):
        return {k: config_to_dict(v) for k, v in obj.items()}
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    if isinstance(obj, np.floating):
        return float(obj)
    if isinstance(obj, np.integer):
        return int(obj)
    raise TypeError(f"cannot serialize config value of type {type(obj)}")


def config_from_dict(data: tp.Any) -> tp.Any:
    reg = _registry()
    if isinstance(data, dict) and '__class__' in data:
        cls = reg[data['__class__']]
        if 'fields' in data:
            kwargs = {k: config_from_dict(v) for k, v in data['fields'].items()}
        else:
            kwargs = {k: config_from_dict(v) for k, v in data['kwargs'].items()}
        return cls(**kwargs)
    if isinstance(data, dict) and '__seq__' in data:
        seq = [config_from_dict(x) for x in data['items']]
        return tuple(seq) if data['__seq__'] == 'tuple' else seq
    if isinstance(data, dict):
        return {k: config_from_dict(v) for k, v in data.items()}
    return data


# --------------------------------------------------------------- params codec

def _flatten(tree, prefix="") -> tp.Dict[str, np.ndarray]:
    out = {}
    if dataclasses.is_dataclass(tree) and not isinstance(tree, type):
        tree = {f.name: getattr(tree, f.name) for f in dataclasses.fields(tree)}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: tp.Dict[str, np.ndarray]) -> dict:
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return root


def params_to_state(params) -> tp.Dict[str, np.ndarray]:
    """Flatten a param pytree (incl. flax struct dataclasses) to name->array."""
    return _flatten(jax.tree.map(np.asarray, params,
                                 is_leaf=lambda x: hasattr(x, 'shape')))


# ---------------------------------------------------------------- save / load

def save_checkpoint(path: tp.Union[str, Path], model, params,
                    extra: tp.Optional[dict] = None) -> Path:
    """Write a self-describing checkpoint directory."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    meta = {
        'version': __version__,
        'exported': True,
        'config': config_to_dict(model),
        'extra': extra or {},
    }
    (path / 'config.json').write_text(json.dumps(meta, indent=2))
    flat = params_to_state(params)
    np.savez(path / 'state.npz', **flat)
    return path


def load_checkpoint(path: tp.Union[str, Path]
                    ) -> tp.Tuple[tp.Any, dict, dict]:
    """Returns (model, params, meta). Params are raw nested dicts of numpy
    arrays; struct-typed states (e.g. RVQState) are rebuilt by the caller's
    model init path or accepted as dicts by the models."""
    path = Path(path)
    meta = json.loads((path / 'config.json').read_text())
    model = config_from_dict(meta['config'])
    with np.load(path / 'state.npz') as data:
        flat = {k: data[k] for k in data.files}
    params = _unflatten(flat)
    return model, params, meta
