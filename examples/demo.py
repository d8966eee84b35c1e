"""Demo walkthrough — the counterpart of the reference's demo.ipynb.

Runs on whatever accelerator JAX finds (TPU here). With debug-scale models it
exercises every public flow end to end; swap in `builders.get_musicgen(...)`
plus imported pretrained weights for real audio quality.

    python examples/demo.py [--outdir /tmp/demo_out]
"""

import argparse
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--outdir", default="/tmp/audiocraft_tpu_demo")
    args = parser.parse_args()
    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)

    import jax
    from audiocraft_tpu.builders import get_debug_compression_model
    from audiocraft_tpu.gen.extend import generate_music_segments, stitch_segments
    from audiocraft_tpu.gen.musicgen import (get_debug_melody_musicgen,
                                             get_debug_musicgen)
    from audiocraft_tpu.io.spectrogram import save_spectrogram
    from audiocraft_tpu.io.wav import audio_write

    # 1. text-to-music
    model = get_debug_musicgen(jax.random.PRNGKey(0))
    model.set_generation_params(duration=2.0, top_k=100)
    wav = model.generate(["an upbeat electronic track"],
                         key=jax.random.PRNGKey(1))
    path = audio_write(out / "text_to_music", np.asarray(wav[0]),
                       model.sample_rate, strategy="loudness")
    save_spectrogram(out / "text_to_music.png", np.asarray(wav[0]),
                     model.sample_rate, title="text-to-music")
    print("text-to-music ->", path)

    # 2. continuation of an audio prompt
    prompt = np.asarray(wav[:, :, : model.sample_rate])
    cont = model.generate_continuation(prompt, model.sample_rate,
                                       descriptions=["continue the groove"],
                                       key=jax.random.PRNGKey(2))
    print("continuation ->", audio_write(out / "continuation",
                                         np.asarray(cont[0]),
                                         model.sample_rate))

    # 3. melody-conditioned generation
    melody_model = get_debug_melody_musicgen(jax.random.PRNGKey(3))
    melody_model.set_generation_params(duration=2.0, top_k=100)
    t = np.arange(2 * melody_model.sample_rate) / melody_model.sample_rate
    melody = (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)[None]
    mwav = melody_model.generate_with_chroma(["follow this melody"], [melody],
                                             melody_model.sample_rate,
                                             key=jax.random.PRNGKey(4))
    print("melody ->", audio_write(out / "melody", np.asarray(mwav[0]),
                                   melody_model.sample_rate))

    # 4. unlimited-length segment stitching
    melody_model.set_generation_params(duration=2.0, top_k=100,
                                       extend_stride=1.0)
    long_melody = (melody_model.sample_rate,
                   np.tile(melody[0], 3).astype(np.float32))
    segments, _ = generate_music_segments(
        "a long evolving piece", long_melody, seed=7, model=melody_model,
        duration=6, overlap=1, segment_duration=2)
    stitched = stitch_segments(segments, melody_model.sample_rate, overlap=1)
    print("unlimited ->", audio_write(out / "unlimited",
                                      np.asarray(stitched[0]),
                                      melody_model.sample_rate))

    # 5. audio tokenization round trip on the codec alone
    codec = get_debug_compression_model(32000)
    codec_params = codec.init(jax.random.PRNGKey(5))
    codes, _ = codec.encode(codec_params, wav)
    recon = codec.decode(codec_params, codes)
    print(f"tokenize: {wav.shape[-1]} samples -> {codes.shape} tokens "
          f"-> {recon.shape[-1]} samples")


if __name__ == "__main__":
    main()
