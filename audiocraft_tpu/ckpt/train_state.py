"""Full training-state checkpointing (resume support).

The model checkpoints in :mod:`.io` carry weights + config (the reference's
``{best_state, xp.cfg}`` export convention).  Resuming an interrupted *run*
additionally needs the optimizer moments, balancer EMA norms, discriminator,
step counter, and RNG — the role of the upstream solver's ``checkpoint.th``
that the reference fork stripped.

Arbitrary pytrees (optax states are nested namedtuples) are serialized as
their flattened leaves; the *structure* is not stored.  On load the caller
passes a freshly-initialized template with the same structure and the leaves
are poured back in — which also revalidates that the run configuration
matches the checkpoint (a structure mismatch fails loudly instead of
silently misassigning moments).
"""

from __future__ import annotations

import json
import typing as tp
from pathlib import Path

import jax
import numpy as np

from ..utils.misc import write_and_rename

TRAIN_STATE_FILE = 'train_state.npz'
TRAIN_META_FILE = 'train_meta.json'


def save_train_state(path: tp.Union[str, Path], state_tree,
                     step: int, extra: tp.Optional[dict] = None) -> Path:
    """Write ``state_tree`` (any pytree of arrays) + step to ``path`` dir."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    leaves = jax.tree.leaves(state_tree)
    flat = {f'leaf{i:05d}': np.asarray(v) for i, v in enumerate(leaves)}
    meta = {'step': int(step), 'n_leaves': len(leaves), 'extra': extra or {}}
    with write_and_rename(path / TRAIN_STATE_FILE) as f:
        np.savez(f, **flat)
    with write_and_rename(path / TRAIN_META_FILE) as f:
        f.write(json.dumps(meta, indent=2).encode())
    return path


def has_train_state(path: tp.Union[str, Path]) -> bool:
    path = Path(path)
    return (path / TRAIN_STATE_FILE).exists() \
        and (path / TRAIN_META_FILE).exists()


def load_train_state(path: tp.Union[str, Path], template
                     ) -> tp.Tuple[tp.Any, int, dict]:
    """Load leaves into ``template``'s structure.

    Returns ``(state_tree, step, extra)``.  Raises if the leaf count or any
    leaf shape disagrees with the template (run-config drift)."""
    path = Path(path)
    meta = json.loads((path / TRAIN_META_FILE).read_text())
    with np.load(path / TRAIN_STATE_FILE) as data:
        loaded = [data[f'leaf{i:05d}'] for i in range(meta['n_leaves'])]
    treedef = jax.tree.structure(template)
    t_leaves = jax.tree.leaves(template)
    if len(t_leaves) != len(loaded):
        raise ValueError(
            f"train state at {path} has {len(loaded)} leaves but the run "
            f"expects {len(t_leaves)} — configuration drift?")
    for i, (t, l) in enumerate(zip(t_leaves, loaded)):
        t_shape = tuple(np.shape(t))
        if t_shape != l.shape:
            raise ValueError(
                f"train state leaf {i}: checkpoint shape {l.shape} != "
                f"expected {t_shape} — configuration drift?")
    state = jax.tree.unflatten(treedef, loaded)
    return state, meta['step'], meta.get('extra', {})
