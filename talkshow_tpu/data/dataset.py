"""SHOW-dataset loading + windowing, host-side, numpy-only.

Mirrors the reference data layer (data_utils/dataloader_torch.py:12-259,
data_utils/mesh_dataset.py:29-348) without torch DataLoaders:

  * directory walk `data_root/<speaker>/<video>/<split>/<clip>/` with
    `<clip>.pkl` (SMPL-X params) + `<clip>.wav`;
  * per-clip preprocessing: pack 99-D pose (jaw, eyes, orient, body,
    12+12 hand-PCA), expand hand PCA -> 165-D, append 100-D expression,
    precompute the MFCC (or raw-waveform) audio feature once;
  * one-time pickling of the preprocessed split for fast reload
    (`<split><pklname>` next to data_root, as dataloader_torch.py:246-250);
  * train windows of `generate_length` frames at stride 6 with the
    reference's random jitter (mesh_dataset.py:240-252, 337-340); whole
    clips at val/test;
  * `batches()` yields dict batches of stacked numpy arrays, dropping the
    ragged remainder (batch dims stay static for jit).

Returned arrays are channels-last: poses (T, 165), expression (T, 100),
aud_feat (T, 64) — the TPU models' native layout.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field

import numpy as np

from talkshow_tpu.ops import audio as audio_ops
from talkshow_tpu.ops.pose import SPEAKER_ID, hand_pca_to_full


@dataclass
class Clip:
    speaker: str
    poses: np.ndarray        # (T, 165) axis-angle
    expression: np.ndarray   # (T, 100)
    aud_feat: np.ndarray     # (T_a, F) mfcc, or (N, 1) raw wave
    betas: np.ndarray        # (300,)
    audio_path: str = ""


@dataclass
class ShowDataset:
    clips: list = field(default_factory=list)
    generate_length: int = 88
    pre_length: int = 0
    seed: int = 0

    # ------------------------------------------------------------------
    @classmethod
    def from_root(cls, data_root: str, speakers, split: str = "train",
                  feat: str = "mfcc", cache_pkl: str | None = None,
                  generate_length: int = 88, fps: int = 30,
                  audio_sr: int = 22000, limit: int | None = None,
                  convert_to_6d: bool = False):
        """Walk the SHOW layout and preprocess every clip of `split`.

        The pickle cache is keyed by a signature of the discovered clip
        tree + featurization args, so growing the split (or switching
        feat/6d) invalidates it automatically — no manual cache-tag bump
        needed (a stale 4-clip cache once silently shrank the eval
        battery; see CLAUDE.md).  Legacy bare-list pickles (no signature)
        are rebuilt."""
        jobs = []
        for speaker in speakers:
            sp_dir = os.path.join(data_root, speaker)
            if not os.path.isdir(sp_dir):
                continue
            for vid in sorted(os.listdir(sp_dir)):
                split_dir = os.path.join(sp_dir, vid, split)
                if not os.path.isdir(split_dir):
                    continue
                for clip_name in sorted(os.listdir(split_dir)):
                    cdir = os.path.join(split_dir, clip_name)
                    pkls = [f for f in os.listdir(cdir) if f.endswith(".pkl")]
                    wavs = [f for f in os.listdir(cdir) if f.endswith(".wav")]
                    if pkls and wavs:
                        jobs.append((speaker, os.path.join(cdir, pkls[0]),
                                     os.path.join(cdir, wavs[0])))
        if limit:
            jobs = jobs[:limit]

        import hashlib
        sig = hashlib.sha1(repr(
            (sorted(j[1] for j in jobs), feat, fps, audio_sr,
             convert_to_6d)).encode()).hexdigest()
        if cache_pkl and os.path.isfile(cache_pkl):
            with open(cache_pkl, "rb") as f:
                cached = pickle.load(f)
            if isinstance(cached, dict) and cached.get("sig") == sig:
                return cls(cached["clips"], generate_length)
            print(f"[dataset] cache {cache_pkl} is stale "
                  f"(tree/featurization changed) — rebuilding")

        # threaded preprocessing: the native featurizer releases the GIL
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(8, max(1, len(jobs)))) as ex:
            clips = list(ex.map(
                lambda j: cls.load_clip(j[1], j[2], j[0], feat=feat, fps=fps,
                                        audio_sr=audio_sr,
                                        convert_to_6d=convert_to_6d), jobs))
        clips = [c for c in clips if c is not None]
        if cache_pkl:
            with open(cache_pkl, "wb") as f:
                pickle.dump({"sig": sig, "clips": clips}, f)
        return cls(clips, generate_length)

    # ------------------------------------------------------------------
    @staticmethod
    def load_clip(pkl_path: str, wav_path: str, speaker: str,
                  feat: str = "mfcc", fps: int = 30,
                  audio_sr: int = 22000, convert_to_6d: bool = False) -> Clip | None:
        """One clip pkl+wav -> Clip (mesh_dataset._load_them_all :166-222)."""
        with open(pkl_path, "rb") as f:
            data = pickle.load(f)
        try:
            jaw = np.asarray(data["jaw_pose"])
            leye = np.asarray(data["leye_pose"])
            reye = np.asarray(data["reye_pose"])
            orient = np.asarray(data["global_orient"]).squeeze()
            body = np.asarray(data["body_pose_axis"])
            lh = np.asarray(data["left_hand_pose"])
            rh = np.asarray(data["right_hand_pose"])
            expression = np.asarray(data["expression"])
            betas = np.asarray(data["betas"]).reshape(-1)
        except KeyError:
            return None
        packed = np.concatenate([jaw, leye, reye, orient.reshape(len(jaw), 3),
                                 body, lh[:, :12], rh[:, :12]], axis=1)
        if packed.shape[1] != 99 or not np.isfinite(packed).all():
            return None
        poses = hand_pca_to_full(packed).astype(np.float32)
        if convert_to_6d:
            # (T, 165) axis-angle -> (T, 330) rot6d (mesh_dataset.py:187-191)
            import jax.numpy as jnp
            from talkshow_tpu.ops.pose import axis_angle_poses_to_6d
            poses = np.asarray(axis_angle_poses_to_6d(jnp.asarray(poses)),
                               np.float32)

        if feat == "mfcc":
            # native (C++/OpenMP) featurizer when built; JAX fallback
            from talkshow_tpu import native
            if native.available():
                aud = native.get_mfcc_native(wav_path, sr=audio_sr, fps=fps)
            else:
                aud = audio_ops.get_mfcc(wav_path, sr=audio_sr, fps=fps)
        elif feat == "raw":
            aud = audio_ops.get_raw_16k(wav_path)
        else:
            raise ValueError(feat)
        return Clip(speaker, poses, expression.astype(np.float32),
                    np.asarray(aud, np.float32), betas.astype(np.float32),
                    wav_path)

    # ------------------------------------------------------------------
    def train_windows(self, rng: np.random.Generator):
        """Yield per-window samples: stride-6 start indices with the
        reference's 0/3-frame jitter (mesh_dataset.py:240-252,337-340)."""
        L = self.generate_length + self.pre_length
        for ci, clip in enumerate(self.clips):
            T = min(clip.poses.shape[0], clip.aud_feat.shape[0])
            for start in range(0, T - L, 6):
                s = start + rng.choice([0, 3])
                if s + L > clip.poses.shape[0]:
                    s = start
                aud = clip.aud_feat[s:s + L]
                if aud.shape[0] < L:
                    aud = np.pad(aud, [[0, L - aud.shape[0]], [0, 0]],
                                 mode="reflect")
                yield {
                    "poses": clip.poses[s:s + L],
                    "expression": clip.expression[s:s + L],
                    "aud_feat": aud,
                    "speaker": np.int32(SPEAKER_ID[clip.speaker] - 20),
                    "betas": clip.betas,
                    # identifies the window for trainer-side caches (the
                    # frozen-VQ token cache); popped before the train step
                    "window_key": np.asarray([ci, s], np.int64),
                }

    def batches(self, batch_size: int, rng: np.random.Generator,
                shuffle: bool = True):
        """Stacked numpy batches of train windows (drop ragged tail)."""
        samples = list(self.train_windows(rng))
        order = rng.permutation(len(samples)) if shuffle else np.arange(len(samples))
        for i in range(0, len(samples) - batch_size + 1, batch_size):
            group = [samples[j] for j in order[i:i + batch_size]]
            yield {k: np.stack([g[k] for g in group]) for k in group[0]}

    def face_batches(self, num_classes: int = 4, bucket_frames: int = 0,
                     batch_size: int = 1):
        """Whole-clip batches for face training (the reference trains the
        face stage at batch 1 on whole clips with the raw 16 kHz waveform,
        config/face.json whole_video=true + batch_size 1).

        Requires clips loaded with feat='raw' (aud_feat (N, 1) @16 kHz).
        Yields {'waveform' (B, N), 'id_onehot' (B, C), 'gt' (B, T, 265)}.

        bucket_frames > 0 enables TPU length bucketing: clip frame counts
        are rounded up to a multiple of bucket_frames (waveforms padded in
        proportion) so real datasets compile O(#buckets) programs instead
        of O(#distinct clip lengths), and same-bucket clips are grouped
        into batches of up to batch_size. Batches then also carry
        valid_samples/valid_frames (B,), which the face model uses to keep
        real frames numerically equal to the unpadded program.
        """
        from talkshow_tpu.ops.pose import SPEAKER_ID as _SID

        def onehot_for(clip):
            sid = _SID[clip.speaker] - 20
            onehot = np.zeros((num_classes,), np.float32)
            onehot[sid] = 1.0
            return onehot

        for clip in self.clips:
            if clip.aud_feat.shape[-1] != 1:
                raise ValueError("face_batches needs feat='raw' clips")

        if not bucket_frames:
            for clip in self.clips:
                gt = np.concatenate([clip.poses, clip.expression], axis=-1)[None]
                yield {
                    "waveform": clip.aud_feat.reshape(1, -1),
                    "id_onehot": onehot_for(clip)[None],
                    "gt": gt.astype(np.float32),
                }
            return

        # samples-per-frame rounded up so padded buffers always fit; the
        # bucket also covers the AUDIO length (real clips can carry more
        # audio than poses_frames/30 seconds — truncating it would change
        # every wav2vec feature vs the unbucketed program)
        spf = -(-16000 // 30)
        buckets: dict[int, list] = {}
        for clip in self.clips:
            t = clip.poses.shape[0]
            t_aud = -(-clip.aud_feat.shape[0] // spf)
            tb = -(-max(t, t_aud) // bucket_frames) * bucket_frames
            buckets.setdefault(tb, []).append(clip)
        for tb in sorted(buckets):
            group = buckets[tb]
            nb = tb * spf
            for i in range(0, len(group), batch_size):
                chunk = group[i:i + batch_size]
                B = len(chunk)
                wav = np.zeros((B, nb), np.float32)
                gt = np.zeros((B, tb, chunk[0].poses.shape[1]
                               + chunk[0].expression.shape[1]), np.float32)
                vs = np.zeros((B,), np.int32)
                vf = np.zeros((B,), np.int32)
                ids = np.zeros((B, num_classes), np.float32)
                for j, clip in enumerate(chunk):
                    n = min(clip.aud_feat.shape[0], nb)
                    t = clip.poses.shape[0]
                    wav[j, :n] = clip.aud_feat.reshape(-1)[:n]
                    gt[j, :t] = np.concatenate(
                        [clip.poses, clip.expression], axis=-1)
                    vs[j], vf[j] = n, t
                    ids[j] = onehot_for(clip)
                yield {"waveform": wav, "id_onehot": ids, "gt": gt,
                       "valid_samples": vs, "valid_frames": vf}

    def whole_clips(self):
        """Eval mode: full clips (mesh_dataset.py:246-248)."""
        for clip in self.clips:
            yield {
                "poses": clip.poses,
                "expression": clip.expression,
                "aud_feat": clip.aud_feat,
                "speaker": np.int32(SPEAKER_ID[clip.speaker] - 20),
                "betas": clip.betas,
                "audio_path": clip.audio_path,
            }


def synthetic_dataset(num_clips: int = 4, frames: int = 240, seed: int = 0,
                      speakers=("oliver", "chemistry")) -> ShowDataset:
    """Random dataset with the real layout — for tests and smoke training."""
    rng = np.random.default_rng(seed)
    clips = []
    for i in range(num_clips):
        t = frames + int(rng.integers(0, 30))
        clips.append(Clip(
            speaker=speakers[i % len(speakers)],
            poses=rng.standard_normal((t, 165)).astype(np.float32) * 0.2,
            expression=rng.standard_normal((t, 100)).astype(np.float32) * 0.3,
            aud_feat=rng.standard_normal((t, 64)).astype(np.float32),
            betas=np.zeros(300, np.float32),
        ))
    return ShowDataset(clips)


# ---------------------------------------------------------------------------
# Pose normalization (reference Data.pose.normalization / norm_stats.npy)
# ---------------------------------------------------------------------------

def compute_norm_stats(dataset: ShowDataset) -> tuple[np.ndarray, np.ndarray]:
    """Per-channel mean/std over all clips' poses (norm_method='all',
    mesh_dataset.py:280-283 consumption; stats saved as norm_stats.npy next
    to checkpoints in the reference, scripts/demo.py:107-111)."""
    allp = np.concatenate([c.poses for c in dataset.clips], axis=0)
    mean = allp.mean(axis=0)
    std = allp.std(axis=0)
    std = np.where(std < 1e-6, 1.0, std)
    return mean.astype(np.float32), std.astype(np.float32)


def normalize_poses(poses: np.ndarray, stats) -> np.ndarray:
    mean, std = stats
    return (poses - mean) / std


def denormalize_poses(poses: np.ndarray, stats) -> np.ndarray:
    """nets/utils.denormalize equivalent."""
    mean, std = stats
    return poses * std + mean
