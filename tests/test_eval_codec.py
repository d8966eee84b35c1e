"""Codec-evaluation CLI (the stripped solvers' evaluate stage)."""

import json
import math

import numpy as np

from audiocraft_tpu.apps.eval_codec import main


def test_eval_codec_synthetic(tmp_path, capsys):
    out = tmp_path / 'metrics.json'
    metrics = main(['--synthetic', '--batches', '2', '--batch', '2',
                    '--segment', '0.25', '--json', str(out)])
    # printed one JSON line and wrote the file
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed == json.loads(out.read_text())
    for k in ('sisnr_db', 'msspec_distance', 'l1'):
        assert np.isfinite(metrics[k]), k
    # debug codec: 2 codebooks of 400 bins at its frame rate
    from audiocraft_tpu.builders import get_debug_compression_model
    model = get_debug_compression_model(32000)
    expect = model.frame_rate * model.num_codebooks * math.log2(
        model.cardinality) / 1000.0
    assert metrics['bitrate_kbps'] == expect
    assert len(metrics['codebook_entropy_bits']) == model.num_codebooks
    assert all(0 <= u <= 1 for u in metrics['codebook_usage'])
    assert metrics['n_segments'] == 4
