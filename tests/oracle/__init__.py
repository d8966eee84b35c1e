"""Conformance oracle: import the reference PyTorch implementation (read-only,
mounted at /root/reference) with its unavailable third-party dependencies
stubbed out, so parity tests can compare our JAX implementation against the
reference code running on CPU torch.

Only modules whose heavy dependencies are genuinely exercised get real
implementations; everything else (flashy distributed helpers at world_size=1,
xformers kernels we never select, audio backends we don't call) is replaced by
inert stubs.  The reference source tree itself is never modified or copied.
"""

from __future__ import annotations

import importlib
import sys
import types

REFERENCE_ROOT = "/root/reference"

_STUBBED = False


class _AutoAttr:
    """Attribute sink standing in for an unused third-party API."""

    def __init__(self, name: str):
        self._name = name

    def __getattr__(self, item):
        return _AutoAttr(f"{self._name}.{item}")

    def __call__(self, *args, **kwargs):
        return _AutoAttr(f"{self._name}()")

    def __repr__(self):
        return f"<stub {self._name}>"


def _stub_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)

    def getattr_(item, _n=name):
        if item.startswith("__"):  # keep dunder protocol sane for inspect & co.
            raise AttributeError(item)
        return _AutoAttr(f"{_n}.{item}")

    mod.__getattr__ = getattr_  # type: ignore
    mod.__file__ = f"<stub {name}>"
    mod.__path__ = []  # mark as package so submodule imports resolve
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
    return mod


def _install_stubs():
    global _STUBBED
    if _STUBBED:
        return
    import torch

    # flashy.distrib: world_size=1 semantics (all collectives are no-ops).
    flashy = _stub_module("flashy")
    distrib = _stub_module("flashy.distrib")
    distrib.broadcast_tensors = lambda tensors, src=0: None
    distrib.average_tensors = lambda tensors: None
    distrib.rank = lambda: 0
    distrib.world_size = lambda: 1
    distrib.is_distributed = lambda: False
    distrib.barrier = lambda: None
    distrib.broadcast_object = lambda obj, src=0: obj
    flashy.distrib = distrib
    sys.modules.setdefault("flashy", flashy)
    sys.modules.setdefault("flashy.distrib", distrib)

    # xformers: imported at module scope but only used when the memory_efficient
    # backend is selected; tests always use default torch paths.
    xformers = _stub_module("xformers")
    ops = _stub_module("xformers.ops")
    ops.LowerTriangularMask = type("LowerTriangularMask", (), {})
    ops.memory_efficient_attention = None
    ops.unbind = lambda x, dim: torch.unbind(x, dim=dim)
    xformers.ops = ops
    sys.modules.setdefault("xformers", xformers)
    sys.modules.setdefault("xformers.ops", ops)
    profiler = _stub_module("xformers.profiler")
    profiler.profiler = _stub_module("xformers.profiler.profiler")
    profiler.profiler._Profiler = type("_Profiler", (), {"_CURRENT_PROFILER": None})
    sys.modules.setdefault("xformers.profiler", profiler)
    sys.modules.setdefault("xformers.profiler.profiler", profiler.profiler)

    for name in ["omegaconf", "gradio", "spacy", "num2words", "torchaudio",
                 "torchaudio.functional", "soundfile", "av", "julius",
                 "librosa", "einx", "torchdiffeq", "demucs", "mutagen",
                 "filelock"]:
        if name not in sys.modules:
            sys.modules[name] = _stub_module(name)
    sys.modules["num2words"].num2words = lambda n, **kw: str(n)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _STUBBED = True


def ref_module(dotted: str):
    """Import a reference module, e.g. ref_module('audiocraft.modules.conv')."""
    _install_stubs()
    return importlib.import_module(dotted)


def to_torch(x):
    import numpy as np
    import torch
    return torch.from_numpy(np.asarray(x))


def to_np(t):
    return t.detach().cpu().numpy()
