"""DROID-specific dataset machinery.

Capability parity with lihzha/lap ``datasets/robot/droid_dataset.py`` +
``droid_mixins.py``: metadata lookup tables built from JSON files
(episode-path -> id, per-step keep ranges, language annotations), success
and has-instruction trajectory filters, random choice of one of three
instructions and one of two exterior cameras (seeded per trajectory).

Metadata files live under ``{data_dir}/droid_metadata/``:
    episode_ids.json      {episode_path: id}
    keep_ranges.json      {episode_id: [[start, end], ...]}
    language_annotations.json  {episode_id: [instr1, instr2, instr3]}
    success_episodes.json [episode_id, ...]
All are optional — absent files degrade to permissive behavior.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from lap_tpu.data.episode_pipeline import stable_hash, traj_rng
from lap_tpu.data.transforms_oxe import droid_dataset_transform

logger = logging.getLogger(__name__)

EXTERIOR_CAMERAS = ("exterior_image_1_left", "exterior_image_2_left")


class DroidMetadata:
    def __init__(self, data_dir: str | Path):
        base = Path(data_dir) / "droid_metadata"

        def load(name, default):
            path = base / name
            if path.exists():
                return json.loads(path.read_text())
            return default

        self.episode_ids = load("episode_ids.json", {})
        self.keep_ranges = load("keep_ranges.json", {})
        self.language_annotations = load("language_annotations.json", {})
        self.success_episodes = set(load("success_episodes.json", []))
        self.enabled = bool(
            self.episode_ids or self.keep_ranges or self.language_annotations or self.success_episodes
        )

    def episode_id(self, episode: dict) -> str | None:
        meta = episode.get("episode_metadata", {})
        path = meta.get("file_path")
        if isinstance(path, list):
            path = path[0] if path else None
        if isinstance(path, bytes):
            path = path.decode()
        if path is None:
            return None
        return str(self.episode_ids.get(path, path))


def make_droid_standardize_fn(data_dir: str | Path, *, seed: int = 0, success_only: bool = True):
    """Wrap the base DROID transform with metadata-driven filtering/sampling."""
    metadata = DroidMetadata(data_dir)

    def standardize(episode: dict):
        traj = droid_dataset_transform(episode)
        if traj is None:
            return None
        ep_id = metadata.episode_id(episode) if metadata.enabled else None

        # Trajectory filters: success path + has an instruction.
        if metadata.enabled and ep_id is not None:
            if success_only and metadata.success_episodes and ep_id not in metadata.success_episodes:
                return None
        instructions = traj.get("language_instruction", [])
        annotations = metadata.language_annotations.get(ep_id or "", [])
        rng = traj_rng(seed, ep_id or str(stable_hash(str(len(instructions)))))
        if annotations:
            # Random pick of up to 3 annotations (reference droid_dataset.py:112-130).
            choice = str(annotations[int(rng.integers(len(annotations)))])
            t = len(traj["action"])
            traj["language_instruction"] = [choice] * t
        elif not any(instructions):
            return None  # has-instruction filter

        # Random exterior camera of two.
        steps = episode.get("steps", episode)
        obs = steps.get("observation", {})
        cams = [c for c in EXTERIOR_CAMERAS if c in obs]
        if len(cams) > 1:
            traj["observation"]["base_0_rgb"] = list(obs[cams[int(rng.integers(len(cams)))]])

        # Per-step keep ranges -> frame mask consumed by the pipeline.
        ranges = metadata.keep_ranges.get(ep_id or "")
        if ranges:
            t = len(traj["action"])
            keep = np.zeros(t, bool)
            for start, end in ranges:
                keep[int(start) : int(end)] = True
            traj["frame_keep_mask"] = keep
        return traj

    return standardize


def droid_frame_filter(frame: dict) -> bool:
    """Drop frames outside the keep ranges (applied post-flatten)."""
    mask = frame.pop("frame_keep_mask", None)
    return bool(mask) if mask is not None else True
