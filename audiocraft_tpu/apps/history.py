"""Local generation history — the storage core of the fork's
``modules/user_history.py`` (per-user gallery: filelock-guarded jsonl of
generations plus copies of the audio/image files, :333-741), without the
Gradio gallery / HF-hub upload layers (UI- and network-bound; seams only).
"""

from __future__ import annotations

import json
import shutil
import time
import typing as tp
from pathlib import Path


class GenerationHistory:
    """Append-only per-user history: jsonl metadata + copied artifacts."""

    def __init__(self, folder: tp.Union[str, Path], user: str = "local"):
        self.root = Path(folder) / user
        self.root.mkdir(parents=True, exist_ok=True)
        self.jsonl = self.root / "history.jsonl"

    def save(self, audio_path: tp.Union[str, Path],
             label: str = "",
             metadata: tp.Optional[dict] = None,
             image_path: tp.Optional[tp.Union[str, Path]] = None) -> dict:
        ts = time.strftime("%Y%m%d-%H%M%S")
        audio_path = Path(audio_path)
        dest_audio = self.root / f"{ts}{audio_path.suffix}"
        i = 0
        while dest_audio.exists():
            i += 1
            dest_audio = self.root / f"{ts}-{i}{audio_path.suffix}"
        shutil.copy(audio_path, dest_audio)
        entry = {
            "timestamp": ts,
            "label": label,
            "audio": dest_audio.name,
            "metadata": metadata or {},
        }
        if image_path is not None:
            dest_img = dest_audio.with_suffix(Path(image_path).suffix)
            shutil.copy(image_path, dest_img)
            entry["image"] = dest_img.name
        # append under a real blocking file lock (reference
        # user_history.py:351 uses filelock the same way — no silent
        # lock-skip on contention)
        from filelock import FileLock
        with FileLock(str(self.jsonl.with_suffix(".lock"))):
            with open(self.jsonl, "a") as fp:
                fp.write(json.dumps(entry) + "\n")
        return entry

    def list(self) -> tp.List[dict]:
        if not self.jsonl.exists():
            return []
        return [json.loads(line) for line in self.jsonl.read_text().splitlines()
                if line.strip()]

    def delete(self, audio_name: str) -> None:
        entries = [e for e in self.list() if e["audio"] != audio_name]
        for suffix_file in self.root.glob(Path(audio_name).stem + ".*"):
            suffix_file.unlink(missing_ok=True)
        self.jsonl.write_text("".join(json.dumps(e) + "\n" for e in entries))

    def export_zip(self, dest: tp.Union[str, Path]) -> Path:
        archive = shutil.make_archive(str(dest), "zip", self.root)
        return Path(archive)
