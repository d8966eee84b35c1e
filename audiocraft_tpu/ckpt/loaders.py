"""Pretrained-model dispatch and cache.

TPU-native counterpart of ``/root/reference/audiocraft/models/loaders.py:40-90``
(name -> checkpoint resolution) and ``app.py:300-315`` (cached model
switching).  There is no network egress here, so "pretrained" means a local
checkpoint directory produced by ``apps/import_checkpoint.py`` from published
torch weights; the name map mirrors the reference's 11-model
``HF_MODEL_CHECKPOINTS_MAP`` so the same identifiers resolve.

Layout of a model directory (what the import CLI writes)::

    <cache_dir>/<name>/
        compression/   # EncodecModel checkpoint (config.json + state.npz)
        lm/            # {'lm': LMModel, 'condition_provider': ...} checkpoint

``get_pretrained('debug')`` builds the self-contained debug model (reference
musicgen.py:121-125) and needs no files.
"""

from __future__ import annotations

import logging
import os
import typing as tp
from pathlib import Path

logger = logging.getLogger(__name__)

#: reference loaders.py:40-52 — kept verbatim so user-facing names carry over.
HF_MODEL_CHECKPOINTS_MAP = {
    "small": "facebook/musicgen-small",
    "medium": "facebook/musicgen-medium",
    "large": "facebook/musicgen-large",
    "melody": "facebook/musicgen-melody",
    "melody-large": "facebook/musicgen-melody-large",
    "stereo-small": "facebook/musicgen-stereo-small",
    "stereo-medium": "facebook/musicgen-stereo-medium",
    "stereo-large": "facebook/musicgen-stereo-large",
    "stereo-melody": "facebook/musicgen-stereo-melody",
    "stereo-melody-large": "facebook/musicgen-stereo-melody-large",
    "style": "facebook/musicgen-style",
}


def get_cache_dir(cache_dir: tp.Optional[str] = None) -> Path:
    return Path(cache_dir
                or os.environ.get('AUDIOCRAFT_TPU_CACHE_DIR',
                                  os.path.expanduser('~/.cache/audiocraft_tpu')))


def resolve_checkpoint_dir(name: str,
                           cache_dir: tp.Optional[str] = None
                           ) -> tp.Optional[Path]:
    """Resolve a model name/path to an imported checkpoint directory.

    Accepts: a filesystem path, a short name from the map ('small',
    'melody', ...), or a full repo id ('facebook/musicgen-small').  Returns
    None if nothing is found (callers decide whether that is fatal).
    """
    as_path = Path(name)
    if as_path.is_dir() and (as_path / 'lm').is_dir():
        return as_path
    root = get_cache_dir(cache_dir)
    candidates = [name]
    if name in HF_MODEL_CHECKPOINTS_MAP:
        candidates.append(HF_MODEL_CHECKPOINTS_MAP[name])
    reverse = {v: k for k, v in HF_MODEL_CHECKPOINTS_MAP.items()}
    if name in reverse:
        candidates.append(reverse[name])
    for cand in candidates:
        for sub in (cand, cand.replace('/', '--'), cand.split('/')[-1]):
            path = root / sub
            if (path / 'lm').is_dir():
                return path
    return None


def list_local_models(cache_dir: tp.Optional[str] = None) -> tp.List[str]:
    """Names servable right now: 'debug' plus every imported checkpoint dir."""
    names = ['debug']
    root = get_cache_dir(cache_dir)
    if root.is_dir():
        for child in sorted(root.iterdir()):
            if (child / 'lm').is_dir():
                names.append(child.name)
    return names


def get_pretrained(name: str = 'debug', cache_dir: tp.Optional[str] = None,
                   max_duration: float = 30.0):
    """Build a ready-to-generate MusicGen facade for `name`.

    Mirrors reference musicgen.py:100-143: 'debug' returns the tiny
    self-contained test model; anything else resolves to an imported
    checkpoint directory (see module docstring) and loads codec + LM +
    conditioner parameters from it.
    """
    import jax

    from ..gen.musicgen import MusicGen, get_debug_musicgen

    if name == 'debug':
        return get_debug_musicgen(jax.random.PRNGKey(0))

    path = resolve_checkpoint_dir(name, cache_dir)
    if path is None:
        # a raw HF hub snapshot directory (config.json + safetensors, e.g.
        # `huggingface-cli download facebook/musicgen-small`): convert once
        # into the cache, then serve from the converted checkpoint
        as_path = Path(name)
        if (as_path / 'config.json').exists():
            dest = get_cache_dir(cache_dir) / (as_path.name + '-hf')
            if not (dest / 'lm').is_dir():
                # convert into a temp sibling and rename into place so a
                # failure mid-conversion can never poison the cache with a
                # half-written dir that the is_dir() gate would then skip
                import shutil
                import tempfile

                from .hf_import import import_hf_snapshot
                logger.info("converting HF snapshot %s -> %s", as_path, dest)
                dest.parent.mkdir(parents=True, exist_ok=True)
                tmp = Path(tempfile.mkdtemp(
                    prefix=dest.name + '.tmp-', dir=dest.parent))
                try:
                    import_hf_snapshot(
                        as_path, tmp, require_codec=True,
                        unmapped_hook=lambda keys: logger.warning(
                            "%d HF keys were not imported: %s",
                            len(keys), keys[:8]))
                    if dest.exists():
                        shutil.rmtree(dest)
                    os.replace(tmp, dest)
                except BaseException:
                    shutil.rmtree(tmp, ignore_errors=True)
                    raise
            path = dest
    if path is None:
        raise FileNotFoundError(
            f"no imported checkpoint for '{name}' under "
            f"{get_cache_dir(cache_dir)} — run "
            f"`python -m audiocraft_tpu.apps.import_checkpoint` on the "
            f"published torch weights first (map: "
            f"{HF_MODEL_CHECKPOINTS_MAP.get(name, name)})")

    from .io import load_checkpoint

    if not (path / 'compression').is_dir():
        raise FileNotFoundError(
            f"checkpoint dir {path} has an LM but no 'compression/' codec "
            "checkpoint (a decoder-only import?) — generation needs both. "
            "Import the matching EnCodec weights with apps.import_checkpoint "
            "--kind compression into that directory.")
    codec, codec_params, _ = load_checkpoint(path / 'compression')
    bundle, params, meta = load_checkpoint(path / 'lm')
    lm = bundle['lm']
    provider = bundle['condition_provider']
    unmapped = meta.get('extra', {}).get('unmapped_keys', [])
    if unmapped:
        logger.warning("checkpoint %s was imported with %d unmapped keys",
                       path, len(unmapped))
    return MusicGen(name=name, compression_model=codec,
                    codec_params=codec_params, lm=lm,
                    lm_params=params['lm'], condition_provider=provider,
                    cond_params=params['condition_provider'],
                    max_duration=max_duration)


# ------------------------------------------------------------- model cache

_MODEL_CACHE: tp.Dict[str, tp.Any] = {}
_MAX_CACHED = 2  # LM params are large; keep the two most recent


def load_model(name: str = 'debug', cache_dir: tp.Optional[str] = None):
    """Cached model switching for the serving layer (reference
    app.py:300-315 keeps one global MODEL and reloads on name change; we keep
    a small LRU so A/B-ing two models doesn't thrash)."""
    if name in _MODEL_CACHE:
        model = _MODEL_CACHE.pop(name)
        _MODEL_CACHE[name] = model  # refresh recency
        return model
    model = get_pretrained(name, cache_dir)
    _MODEL_CACHE[name] = model
    while len(_MODEL_CACHE) > _MAX_CACHED:
        evicted = next(iter(_MODEL_CACHE))
        del _MODEL_CACHE[evicted]
        logger.info("evicted model '%s' from cache", evicted)
    return model


def clear_model_cache() -> None:
    _MODEL_CACHE.clear()
