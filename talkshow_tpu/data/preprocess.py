"""Dataset preprocessing: quality filter + train/val/test split.

Mirror of data_utils/dataset_preprocess.py:46-169 (drop clips whose audio
is unreadable, that are shorter than 90 frames, or contain NaNs; random
80/10/10 split) and data_utils/apply_split.py (apply a published split
mapping clip -> train/val/test).
"""
from __future__ import annotations

import os
import pickle
import random

import numpy as np

MIN_FRAMES = 90


def check_clip(pkl_path: str, wav_path: str) -> bool:
    """Quality gate (dataset_preprocess.py:104-137)."""
    try:
        from talkshow_tpu.ops.audio import load_wav
        load_wav(wav_path)
    except Exception:
        return False
    try:
        with open(pkl_path, "rb") as f:
            data = pickle.load(f)
        body = np.asarray(data["body_pose_axis"])
        if body.shape[0] < MIN_FRAMES:
            return False
        for key in ("jaw_pose", "leye_pose", "reye_pose", "global_orient",
                    "body_pose_axis", "left_hand_pose", "right_hand_pose",
                    "expression"):
            if not np.isfinite(np.asarray(data[key])).all():
                return False
    except Exception:
        return False
    return True


def scan_clips(data_root: str, speakers) -> list[tuple[str, str, str]]:
    """-> [(speaker, pkl_path, wav_path)] over every clip directory."""
    out = []
    for speaker in speakers:
        sp = os.path.join(data_root, speaker)
        if not os.path.isdir(sp):
            continue
        for dirpath, _, files in os.walk(sp):
            pkls = [f for f in files if f.endswith(".pkl")]
            wavs = [f for f in files if f.endswith(".wav")]
            if pkls and wavs:
                out.append((speaker, os.path.join(dirpath, pkls[0]),
                            os.path.join(dirpath, wavs[0])))
    return out


def random_split(clips: list, train: float = 0.8, val: float = 0.1,
                 seed: int = 0) -> dict[str, list]:
    """Random 80/10/10 split (dataset_preprocess.py:141-169)."""
    rng = random.Random(seed)
    clips = list(clips)
    rng.shuffle(clips)
    n = len(clips)
    n_train = int(n * train)
    n_val = int(n * val)
    return {
        "train": clips[:n_train],
        "val": clips[n_train:n_train + n_val],
        "test": clips[n_train + n_val:],
    }


def load_published_split(pkl_path: str) -> dict[str, str]:
    """Flatten the reference's published split pkl into apply_split's map.

    `split_more_than_2s.pkl` is nested {speaker: {vid: {split: [seq_path,
    ...]}}} with Windows-style path entries (data_utils/apply_split.py:
    10-27 walks it and physically MOVES files); here we just map each
    clip-directory basename -> 'train'|'val'|'test' and let apply_split
    assign scanned clips, no file moves needed.
    """
    with open(pkl_path, "rb") as f:
        nested = pickle.load(f)
    split_map: dict[str, str] = {}
    for vids in nested.values():
        for splits in vids.values():
            for split, seqs in splits.items():
                for seq in seqs:
                    key = os.path.basename(str(seq).replace("\\", "/"))
                    split_map[key] = split
    return split_map


def apply_split(clips: list, split_map: dict[str, str]) -> dict[str, list]:
    """Apply a published split: split_map maps a clip key (its directory
    basename) to 'train'|'val'|'test' (data_utils/apply_split.py)."""
    out = {"train": [], "val": [], "test": []}
    for item in clips:
        key = os.path.basename(os.path.dirname(item[1]))
        split = split_map.get(key)
        if split in out:
            out[split].append(item)
    return out


def preprocess(data_root: str, speakers, out_json: str | None = None,
               seed: int = 0) -> dict[str, list]:
    """Scan + filter + split; optionally persist the split as JSON."""
    clips = [c for c in scan_clips(data_root, speakers)
             if check_clip(c[1], c[2])]
    splits = random_split(clips, seed=seed)
    if out_json:
        import json
        with open(out_json, "w") as f:
            json.dump({k: [list(c) for c in v] for k, v in splits.items()}, f)
    return splits
