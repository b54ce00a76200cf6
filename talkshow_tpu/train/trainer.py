"""Training runtime: epoch loop, logging, checkpoint/resume.

Replaces trainer/Trainer.py:28-278 with a functional design: the Trainer
owns the optimizer (not the models), drives the jitted stage step, logs a
running loss dict every `print_every` steps, and checkpoints the WHOLE
train state (params + norm stats + VQ codebooks + optimizer + step) with
orbax every `save_every` epochs — so resume restores optimizer state too
(which the reference's Trainer path loses, trainer/Trainer.py:103-109).
"""
from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

try:
    import orbax.checkpoint as ocp
except Exception:  # pragma: no cover
    ocp = None

from talkshow_tpu.config import Config
from talkshow_tpu.data.dataset import ShowDataset

log = logging.getLogger("talkshow_tpu")


def _device_memory_gb():
    """Bytes in use on device 0, in GB — HBM observability per epoch.
    None when the backend doesn't report memory stats (CPU)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return round(stats["bytes_in_use"] / 2**30, 3)
    except Exception:
        pass
    return None


def save_checkpoint(path: str, state: Any) -> None:
    """Save a train-state pytree with orbax (or npz fallback)."""
    path = os.path.abspath(path)
    if ocp is not None:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)
    else:  # pragma: no cover
        flat, _ = jax.tree_util.tree_flatten(state)
        np.savez(path + ".npz", *[np.asarray(x) for x in flat])


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_checkpoint, shaped like `like`."""
    path = os.path.abspath(path)
    if ocp is not None:
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(path, item=jax.device_get(like))
        return jax.tree_util.tree_map(jnp.asarray, restored)
    raise RuntimeError("orbax not available")


@dataclass
class Trainer:
    """Drives one stage's jitted step over a ShowDataset.

    step_fn(state, batch, rng) or step_fn(state, batch) — detected by
    `needs_rng`.  Batches come as stacked numpy dicts.
    """
    config: Config
    dataset: ShowDataset
    init_state_fn: Callable
    step_fn: Callable
    needs_rng: bool = True
    run_dir: str = "experiments/run"
    state: Any = None
    epoch: int = 0
    global_step: int = 0
    history: list = field(default_factory=list)
    mesh: Any = None        # jax.sharding.Mesh for dp x tp training
    batch_mode: str = "windows"   # "windows" | "face_clips"
    face_bucket_frames: int = 0   # >0: length-bucketed face batches
    face_batch_size: int = 1
    #: jitted poses -> tokens through the frozen stage-1 VQs
    #: (steps.make_token_encoder). When set, token grids are cached per
    #: (clip, window-start) and fed to the step as batch['tokens'] — the
    #: encoder is frozen and deterministic, so epochs 2+ skip its ~22% of
    #: the pixel step's device time at identical numerics.
    token_encoder: Any = None
    _token_cache: dict = field(default_factory=dict)
    #: keys of the batch dict the step actually reads (None = all). Unused
    #: keys are dropped BEFORE host->device transfer — on a remote-attached
    #: device the batch upload, not the step, dominates wall time, and
    #: e.g. the body-VQ step reads only 'poses' of the ~15 MB batch.
    batch_keys: tuple | None = None

    def setup(self, rng=None):
        os.makedirs(self.run_dir, exist_ok=True)
        with open(os.path.join(self.run_dir, "config.json"), "w") as f:
            f.write(self.config.to_json())
        # file + stdout logging into the run dir (trainer/Trainer.py:86-101)
        if not any(isinstance(h, logging.FileHandler)
                   and getattr(h, "_talkshow_run", None) == self.run_dir
                   for h in log.handlers):
            fh = logging.FileHandler(os.path.join(self.run_dir, "train.log"))
            fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
            fh._talkshow_run = self.run_dir
            log.addHandler(fh)
            log.setLevel(logging.INFO)
        if self.state is None:
            rng = rng if rng is not None else jax.random.PRNGKey(self.config.train.seed)
            self.state = self.init_state_fn(
                rng, window=self.config.data.pose.generate_length)
        pc = self.config.parallel
        if self.mesh is None and pc.dp * pc.tp > 1:
            from talkshow_tpu.parallel import mesh as pmesh
            self.mesh = pmesh.make_mesh(dp=pc.dp, tp=pc.tp)
        if self.mesh is not None:
            from talkshow_tpu.parallel import mesh as pmesh
            self.state = self.state._replace(
                params=pmesh.shard_params(self.mesh, self.state.params))
        return self

    def _put_batch(self, batch: dict) -> dict:
        if self.config.data.pose.normalization and "poses" in batch:
            if not hasattr(self, "_norm_stats"):
                from talkshow_tpu.data.dataset import compute_norm_stats
                self._norm_stats = compute_norm_stats(self.dataset)
                np.save(os.path.join(self.run_dir, "norm_stats.npy"),
                        np.stack(self._norm_stats))
            from talkshow_tpu.data.dataset import normalize_poses
            batch = dict(batch)
            batch["poses"] = normalize_poses(batch["poses"], self._norm_stats)
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from talkshow_tpu.parallel import mesh as pmesh
        out = {}
        for k, v in batch.items():
            arr = jnp.asarray(v)
            out[k] = jax.device_put(arr, pmesh.batch_sharding(self.mesh, arr.ndim))
        return out

    def train(self, epochs: int | None = None, log_cb: Callable | None = None):
        epochs = epochs if epochs is not None else self.config.train.epochs
        np_rng = np.random.default_rng(self.config.train.seed + self.epoch)
        rng = jax.random.PRNGKey(self.config.train.seed + 1)
        print_every = self.config.log.print_every
        save_every = self.config.log.save_every

        for epoch in range(self.epoch, epochs):
            running: dict[str, list] = {}
            pending_cache: list = []    # (window keys, device tokens)

            def drain_cache():
                # tiny int32 grids; read back in bulk OFF the per-step
                # critical path so epoch-1 cache misses never stall the
                # dispatch pipeline (the encode result is only needed
                # again next epoch)
                for ks, td in pending_cache:
                    for k, t in zip(ks, np.asarray(td)):
                        self._token_cache[k] = t
                pending_cache.clear()

            count = 0
            t0 = time.time()
            if self.batch_mode == "face_clips":
                # whole clips, batch 1 (face stage; config/face.json)
                batch_iter = self.dataset.face_batches(
                    bucket_frames=self.face_bucket_frames,
                    batch_size=self.face_batch_size)
            else:
                batch_iter = self.dataset.batches(
                    self.config.train.batch_size, np_rng)
            # assemble the next batches on a background thread while the
            # device runs the current step (order-preserving — training
            # stays bit-reproducible)
            from talkshow_tpu.utils import prefetch_iter
            for batch in prefetch_iter(batch_iter, depth=2):
                wkey = batch.pop("window_key", None)
                batch = {k: v for k, v in batch.items()
                         if (isinstance(v, np.ndarray) or np.isscalar(v)
                             or isinstance(v, (np.integer, np.floating)))
                         and (self.batch_keys is None or k in self.batch_keys)}
                toks = None
                use_cache = self.token_encoder is not None and wkey is not None
                if use_cache:
                    keys = [tuple(map(int, k)) for k in wkey]
                    if all(k in self._token_cache for k in keys):
                        toks = np.stack([self._token_cache[k] for k in keys])
                        # cached tokens replace poses entirely: skip the
                        # poses upload too (the step never reads them)
                        batch.pop("poses", None)
                batch = self._put_batch(batch)
                if use_cache:
                    if toks is None:
                        # one extra encode dispatch on first sight of a
                        # window; the step then skips its in-step encode,
                        # so epoch 1 is ~cost-neutral and epochs 2+ save
                        # it.  The DEVICE array feeds the step directly;
                        # the host copy for the cache is read back in
                        # drain_cache (a blocking np.asarray here would
                        # stall the dispatch pipeline every step)
                        toks_dev = self.token_encoder(batch["poses"])
                        batch["tokens"] = toks_dev
                        pending_cache.append((keys, toks_dev))
                    else:
                        batch["tokens"] = self._put_batch(
                            {"tokens": toks})["tokens"]
                if self.needs_rng:
                    rng, sub = jax.random.split(rng)
                    self.state, metrics = self.step_fn(self.state, batch, sub)
                else:
                    self.state, metrics = self.step_fn(self.state, batch)
                self.global_step += 1
                count += 1
                for k, v in metrics.items():
                    # LIST-append the device scalars: a device add here
                    # (running + v) would launch an extra kernel per
                    # metric per step (~1-2 ms device-visible dispatch
                    # overhead each on a remote attach), and float(v)
                    # would force a sync; both readback AND reduction
                    # happen at print time instead
                    running.setdefault(k, []).append(v)
                if self.global_step % print_every == 0:
                    # collapse each metric list to ONE device scalar: the
                    # stack stays bounded (<= print_every + 1 elements)
                    # and shape-stable across prints, instead of
                    # re-stacking an epoch-long list (a NEW program —
                    # i.e. a recompile — at every print)
                    for k, v in running.items():
                        running[k] = [jnp.stack(v).sum()]
                    avg = {k: float(v[0]) / count
                           for k, v in running.items()}
                    msg = f"epoch {epoch} step {self.global_step} " + " ".join(
                        f"{k}={v:.4f}" for k, v in avg.items())
                    log.info(msg)
                    if log_cb:
                        log_cb(epoch, self.global_step, avg)
                    drain_cache()
            self.epoch = epoch + 1
            drain_cache()
            avg = {k: float(jnp.stack(v).sum()) / count if count else 0.0
                   for k, v in running.items()}
            avg["epoch_seconds"] = time.time() - t0
            hbm = _device_memory_gb()
            if hbm is not None:
                avg["hbm_in_use_gb"] = hbm
            self.history.append({"epoch": epoch, **avg})
            if (epoch + 1) % save_every == 0 or epoch + 1 == epochs:
                self.save(os.path.join(self.run_dir, f"ckpt-{epoch}"))
        with open(os.path.join(self.run_dir, "history.json"), "w") as f:
            json.dump(self.history, f, indent=1)
        return self.state

    def save(self, path: str):
        save_checkpoint(path, {
            "state": self.state,
            "epoch": jnp.asarray(self.epoch),
            "global_step": jnp.asarray(self.global_step),
        })

    def resume(self, path: str):
        restored = load_checkpoint(path, {
            "state": self.state,
            "epoch": jnp.asarray(self.epoch),
            "global_step": jnp.asarray(self.global_step),
        })
        self.state = restored["state"]
        self.epoch = int(restored["epoch"])
        self.global_step = int(restored["global_step"])
        return self
