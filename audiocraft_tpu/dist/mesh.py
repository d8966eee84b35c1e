"""Device mesh setup and sharding helpers.

The parallelism design (SURVEY.md §2.7): data parallelism is the strategy the
workload needs — audio batches shard over a 1-D ``('data',)`` mesh, codebook
tables and model params stay replicated, and the RVQ EMA statistics reduce
over ICI.  We write global-view jitted code and let GSPMD insert the
collectives; the batch axis sharding alone makes the one-hot count and
embed-sum reductions compile to ``all-reduce`` over the data axis (the
TPU-native equivalent of the reference's flashy.distrib broadcast/average
calls, core_vq.py:140,158 / conditioners.py:963).

A second ``'model'`` axis supports tensor-sharding the LM's attention heads and
FFN hidden dim for the 1.5B/3.3B variants (optional — not needed for parity).
"""

from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: tp.Optional[int] = None, n_model: int = 1,
              devices: tp.Optional[tp.Sequence[jax.Device]] = None) -> Mesh:
    """Create a ('data',) or ('data', 'model') mesh over the given devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), \
        f"need {n_data}*{n_model} devices, have {len(devices)}"
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with its leading axis sharded over 'data'."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def lm_param_sharding(mesh: Mesh, params: dict) -> dict:
    """Tensor-parallel PartitionSpecs for LM params over the 'model' axis.

    Attention in/out projections shard on the head dimension, FFN linears on
    the hidden dimension, per-codebook heads on the cardinality dimension;
    everything else (norms, embeddings) replicated.  GSPMD inserts the
    all-reduces after the row-sharded matmuls.
    """
    def spec_for(path: tuple, leaf) -> P:
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        joined = "/".join(names)
        if leaf.ndim == 0:
            return P()
        if "in_proj_weight" in joined:
            return P("model", None)       # [3E, E] rows = q/k/v head blocks
        if "out_proj" in joined and names[-1] == "weight":
            return P(None, "model")       # [E, E] contraction sharded
        if "linear1" in joined and names[-1] == "weight":
            return P("model", None)       # [F, D]
        if "linear2" in joined and names[-1] == "weight":
            return P(None, "model")       # [D, F]
        if "linears" in joined and names[-1] == "weight":
            return P(None, "model", None)  # [K, card, D] shard card
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params)


def apply_sharding(tree, shardings):
    return jax.tree.map(jax.device_put, tree, shardings)
