"""Import-checkpoint CLI: torch export layout -> our checkpoint directory."""

import numpy as np
import jax
import jax.numpy as jnp

from oracle import ref_module, to_np, to_torch


def test_import_compression_checkpoint_cli(tmp_path):
    """Round-trip a torch-exported debug codec through the CLI and verify
    token parity of the loaded checkpoint."""
    import torch
    from audiocraft_tpu.apps.import_checkpoint import main as import_main
    from audiocraft_tpu.ckpt.io import load_checkpoint

    ref_builders = ref_module("audiocraft.models.builders")
    torch.manual_seed(23)
    ref = ref_builders.get_debug_compression_model(sample_rate=32000)
    # the reference export convention (utils/export.py:20-79)
    ckpt_file = tmp_path / "compression_state_dict.bin"
    torch.save({'best_state': ref.state_dict(), 'xp.cfg': {},
                'version': '1.3', 'exported': True}, ckpt_file)

    out_dir = tmp_path / "converted"
    import_main(['compression', str(ckpt_file), '--out', str(out_dir),
                 '--config', 'debug'])

    model, params, meta = load_checkpoint(out_dir)
    params = jax.tree.map(jnp.asarray, params)
    wav = np.random.RandomState(0).randn(1, 1, 32000).astype(np.float32) * 0.2
    with torch.no_grad():
        codes_ref = to_np(ref.encode(to_torch(wav))[0])
    codes, _ = model.encode(params, jnp.asarray(wav))
    assert (np.asarray(codes) == codes_ref).all()
