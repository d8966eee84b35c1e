"""Unlimited-length generation: segment-stitch extension with crossfades.

The fork's flagship capability (``/root/reference/audiocraft/utils/extend.py``
plus the stitching in ``app.py:425-453``):
* ``separate_audio_segments`` (extend.py:22-52): split a melody wav into
  fixed-duration windows with optional overlap.
* ``generate_music_segments`` (extend.py:54-237): compute the segment count
  with overlap-loss compensation, generate a shared prompt segment, then per
  melody window generate a continuation segment conditioned on
  (text, window melody, prompt segment).
* ``stitch_segments``: overlap-crossfade (linear fade-out/fade-in) splice.

All host-side orchestration over the jitted MusicGen facade; durations are
capped at 720 s / 15 s overlap like the fork (extend.py:65-66).
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..io.audio_utils import apply_tafade
from .musicgen import MusicGen

AudioTuple = tp.Tuple[int, np.ndarray]  # (sample_rate, samples [T] or [T, C])


def separate_audio_segments(audio: AudioTuple, segment_duration: int = 30,
                            overlap: int = 1) -> tp.List[AudioTuple]:
    """Split (sr, samples) into up-to-25 windows of `segment_duration` seconds
    with `overlap` seconds shared between consecutive windows; audio shorter
    than one window yields a single segment.

    Note: this implements the splitter's *intended* behavior.  The reference's
    loop condition (extend.py:36, ``while total_samples >= segment_samples``)
    compares a segment count against a sample count and therefore almost
    always emits a single segment, which generate_music_segments then papers
    over by repeating it; we split properly instead.
    """
    sr, audio_data = audio
    segment_samples = sr * segment_duration
    overlap_samples = sr * overlap
    n = len(audio_data)

    if n <= segment_samples:
        return [(sr, audio_data)]

    segments: tp.List[AudioTuple] = []
    start = 0
    stride = max(segment_samples - overlap_samples, 1)
    while start + segment_samples <= n and len(segments) < 25:
        segments.append((sr, audio_data[start:start + segment_samples]))
        start += stride
    if start < n and len(segments) < 25 and n - start > overlap_samples:
        segments.append((sr, audio_data[-segment_samples:]))
    return segments


def plan_segments(duration: int, segment_duration: int, overlap: int
                  ) -> tp.Tuple[int, int, int]:
    """Segment count + overlap-loss compensation (extend.py:68-88).

    Returns (total_segments, adjusted_duration, excess_duration).
    """
    duration = min(duration, 720)
    overlap = min(overlap, 15)
    total_segments = max(math.ceil(duration / segment_duration), 1)
    duration_loss = max(total_segments - 1, 0) * math.ceil(overlap / 2)
    excess_duration = segment_duration - (total_segments * segment_duration
                                          - duration)
    duration += duration_loss
    while excess_duration + duration_loss > segment_duration:
        total_segments += 1
        duration_loss += math.ceil(overlap / 2)
        excess_duration = segment_duration - (total_segments * segment_duration
                                              - duration)
        if excess_duration + duration_loss > segment_duration:
            duration += duration_loss
            duration_loss = 0
    total_segments = min(total_segments, 720 // segment_duration
                         if segment_duration <= 720 else 1)
    total_segments = max(total_segments, 1)
    return total_segments, duration, excess_duration


def generate_music_segments(text: str, melody: AudioTuple, seed: int,
                            model: MusicGen, duration: int = 10,
                            overlap: int = 1, segment_duration: int = 30,
                            prompt_index: int = 0,
                            harmony_only: bool = False,
                            interrupt: tp.Optional[tp.Callable[[], bool]] = None
                            ) -> tp.Tuple[tp.List[jax.Array], int]:
    """Generate a long piece as overlapping segments following the melody.

    Returns (list of [B, C, T] waveform segments, excess_duration).
    `prompt_index >= 0` keeps one shared prompt segment for consistency;
    `prompt_index < 0` chains each segment's output as the next prompt.
    `harmony_only` strips percussion from each melody verse via median-filter
    HPSS before conditioning (reference extend.py:106-112,216-227; io/hpss.py
    stands in for librosa.effects.hpss).
    """
    melody_segments = separate_audio_segments(melody, segment_duration, 0)
    text = f"{text}, seed={seed}"
    total_segments, duration, excess_duration = plan_segments(
        duration, segment_duration, overlap)

    while len(melody_segments) < total_segments:
        melody_segments.append(
            melody_segments[len(melody_segments) % max(len(melody_segments), 1)])

    melodys = []
    for segment_idx in range(total_segments):
        if interrupt and interrupt():
            return [], duration
        sr, verse_data = melody_segments[segment_idx]
        verse = np.asarray(verse_data, np.float32)
        if verse.ndim == 1:
            verse = verse[None]          # [C=1, T]
        else:
            verse = verse.T              # [T, C] -> [C, T]
        verse = verse[..., :int(sr * model.max_duration)]
        if harmony_only:
            from ..io.hpss import harmonic
            verse = harmonic(verse)
        melodys.append(verse)

    key = jax.random.PRNGKey(seed & 0x7fffffff)

    prompt_verse = melodys[0]
    if prompt_index > 0:
        prompt_verse = melodys[min(prompt_index, total_segments - 1)]

    saved_duration = model.duration
    model.set_generation_params(
        use_sampling=model.use_sampling, top_k=model.top_k, top_p=model.top_p,
        temperature=model.temperature, cfg_coef=model.cfg_coef,
        duration=min(segment_duration, model.max_duration - 1e-9)
        if segment_duration >= model.max_duration else segment_duration,
        extend_stride=model.extend_stride)

    key, sub = jax.random.split(key)
    prompt_segment = model.generate_with_chroma(
        [text], [prompt_verse], sr, key=sub)

    # Crop the continuation prompt to the overlap window so each segment
    # actually generates new content.  (The reference passes the full
    # segment as prompt, which — with prompt length == window length — makes
    # lm.generate emit only the delayed-codebook tail, i.e. the output
    # equals the prompt; its text-only path in app.py:404-410 prompts with
    # the overlap chunk only, which is the behavior we adopt here.)
    prompt_seconds = max(overlap, 1)

    def crop_prompt(seg):
        return seg[..., -prompt_seconds * model.sample_rate:]

    output_segments: tp.List[jax.Array] = []
    remaining = duration
    for idx, verse in enumerate(melodys):
        if interrupt and interrupt():
            break
        if (idx + 1) == len(melodys) or remaining < segment_duration:
            mod_duration = max(min(remaining, segment_duration), 1)
            model.set_generation_params(
                use_sampling=model.use_sampling, top_k=model.top_k,
                top_p=model.top_p, temperature=model.temperature,
                cfg_coef=model.cfg_coef, duration=mod_duration,
                extend_stride=model.extend_stride)
            verse = verse[..., -mod_duration * model.sample_rate:]

        key, sub = jax.random.split(key)
        output = model.generate_continuation(
            crop_prompt(prompt_segment), model.sample_rate,
            descriptions=[text], melody_wavs=[verse], melody_sample_rate=sr,
            key=sub)
        if prompt_index < 0:
            prompt_segment = output
        output_segments.append(output)
        if remaining > segment_duration:
            remaining -= segment_duration

    model.duration = saved_duration
    return output_segments, excess_duration


def stitch_segments(segments: tp.Sequence[jax.Array], sample_rate: int,
                    overlap: int) -> jax.Array:
    """Overlap-crossfade splice (app.py:425-453): linear fade-out of the last
    `overlap` seconds against linear fade-in of the next segment's first
    `overlap` seconds, with the fork's half-overlap trim."""
    output = jnp.asarray(segments[0])
    for i in range(1, len(segments)):
        seg = jnp.asarray(segments[i])
        if overlap > 0:
            overlap_samples = overlap * sample_rate
            fadeout = apply_tafade(output[:, :, -overlap_samples:], sample_rate,
                                   duration=overlap, out=True, start=True,
                                   shape="linear")
            fadein = apply_tafade(seg[:, :, :overlap_samples], sample_rate,
                                  duration=overlap, out=False, start=False,
                                  shape="linear")
            overlapping = jnp.concatenate(
                [fadeout[:, :, :-(overlap_samples // 2)], fadein], axis=2)
            output = jnp.concatenate(
                [output[:, :, :-overlap_samples], overlapping,
                 seg[:, :, overlap_samples:]], axis=2)
        else:
            output = jnp.concatenate([output, seg], axis=2)
    return output
