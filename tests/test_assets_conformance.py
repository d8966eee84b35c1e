"""Conformance-corpus parity: decode the reference's assets/*.mp3 with our
native decoder, run the same PCM through the reference torch codec and our
JAX codec (same imported weights), require exact token-id match.

This is BASELINE config 1/2's harness.  With published pretrained weights it
runs unchanged; here the shared weights come from the reference's debug codec
(no network egress in this environment, so no facebook/encodec_32khz).
"""

from pathlib import Path

import numpy as np
import pytest

from oracle import ref_module, to_np, to_torch

import jax
import jax.numpy as jnp

from audiocraft_tpu.builders import get_debug_compression_model
from audiocraft_tpu.ckpt.torch_import import import_encodec
from audiocraft_tpu.io.audio_utils import convert_audio
from audiocraft_tpu.io.wav import audio_read

ASSETS = Path("/root/reference/assets")
MP3S = sorted(ASSETS.glob("*.mp3"))


@pytest.fixture(scope="module")
def models():
    import torch
    ref_builders = ref_module("audiocraft.models.builders")
    torch.manual_seed(23)
    ref = ref_builders.get_debug_compression_model(sample_rate=32000)
    ours = get_debug_compression_model(sample_rate=32000)
    params = jax.tree.map(jnp.asarray, import_encodec(
        ours, {k: to_np(v) for k, v in ref.state_dict().items()}))
    return ref, ours, params


@pytest.mark.parametrize("asset", MP3S, ids=[p.name[:30] for p in MP3S])
def test_asset_token_parity(asset, models):
    import torch
    ref, ours, params = models
    wav, sr = audio_read(asset, duration=4.0)
    assert wav.shape[0] in (1, 2) and wav.shape[1] > 0
    mono = np.asarray(convert_audio(jnp.asarray(wav), sr, 32000, 1))[None]

    with torch.no_grad():
        codes_ref = to_np(ref.encode(to_torch(mono))[0])
    codes, _ = ours.encode(params, jnp.asarray(mono))
    codes = np.asarray(codes)
    assert codes.shape == codes_ref.shape
    match = (codes == codes_ref).mean()
    assert match == 1.0, f"{asset.name}: token match {match:.6f} != 1.0"


def test_asset_roundtrip_decode(models):
    import torch
    ref, ours, params = models
    wav, sr = audio_read(MP3S[0], duration=2.0)
    mono = np.asarray(convert_audio(jnp.asarray(wav), sr, 32000, 1))[None]
    codes, _ = ours.encode(params, jnp.asarray(mono))
    out = np.asarray(ours.decode(params, codes))
    with torch.no_grad():
        out_ref = to_np(ref.decode(to_torch(np.asarray(codes)), None))
    np.testing.assert_allclose(out, out_ref, atol=1e-4, rtol=1e-4)
