"""Metadata-carrying audio dataset.

Counterpart of ``/root/reference/audiocraft/data/info_audio_dataset.py``:
an AudioDataset that always returns (wav, SegmentWithAttributes) where the
info converts to ConditioningAttributes for the conditioning stack, with
cluster path mapping via AudioCraftEnvironment.
"""

from __future__ import annotations

import dataclasses
import typing as tp


from ..cond.attributes import ConditioningAttributes
from ..utils.misc import AudioCraftEnvironment
from .audio_dataset import AudioDataset, AudioMeta, SegmentInfo


def _clusterify_meta(meta: AudioMeta) -> AudioMeta:
    """Resolve paths for the current environment (reference :25-38):
    dataset-mapper regex rules first, then the //reference placeholder."""
    meta.path = AudioCraftEnvironment.resolve_reference_path(
        AudioCraftEnvironment.apply_dataset_mappers(meta.path))
    if meta.info_path is not None:
        meta.info_path.zip_path = AudioCraftEnvironment.apply_dataset_mappers(
            meta.info_path.zip_path)
    return meta


def clusterify_all_meta(meta: tp.List[AudioMeta]) -> tp.List[AudioMeta]:
    return [_clusterify_meta(m) for m in meta]


@dataclasses.dataclass
class SegmentInfoWithAttributes(SegmentInfo):
    """SegmentInfo that can convert to ConditioningAttributes
    (the SegmentWithAttributes contract, reference conditioners.py:129-136)."""

    def to_condition_attributes(self) -> ConditioningAttributes:
        return ConditioningAttributes()


class InfoAudioDataset(AudioDataset):
    """AudioDataset that returns metadata alongside the wav
    (reference info_audio_dataset.py:40-110)."""

    def __init__(self, meta: tp.List[AudioMeta], **kwargs):
        super().__init__(clusterify_all_meta(meta), **kwargs)

    def __getitem__(self, index: int):
        if not self.return_info:
            return super().__getitem__(index)
        wav, info = super(InfoAudioDataset, self).__getitem__(index)
        return wav, SegmentInfoWithAttributes(
            meta=info.meta, seek_time=info.seek_time, n_frames=info.n_frames,
            total_frames=info.total_frames, sample_rate=info.sample_rate,
            channels=info.channels)
