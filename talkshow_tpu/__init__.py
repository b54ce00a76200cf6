"""talkshow_tpu — a TPU-native speech-to-holistic-3D-motion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of TalkSHOW
("Generating Holistic 3D Human Motion from Speech", CVPR 2023): given a
speech waveform, generate whole-body SMPL-X motion at 30 fps — facial
expression + jaw from a deterministic wav2vec-2.0 generator, body + hands
from compositional VQ-VAEs driven by an audio-conditioned autoregressive
PixelCNN prior.

Public API (mirror of the reference's scripts/demo.py surface):

    from talkshow_tpu import Pipeline
    pipe = Pipeline.create(rng)                       # or .from_checkpoint(...)
    motion = pipe.generate(wav, speaker="oliver", num_samples=4)
    # motion: (num_samples, T, 265) SMPL-X params @30fps

Subpackages:
    ops       — numeric foundations (rotation, pose layout, audio DSP,
                vector-quantization kernels, SMPL-X LBS)
    models    — flax model definitions (vqvae, pixelcnn, wav2vec2, face,
                ls3dcg, body_ae)
    parallel  — device mesh + sharding rules (dp x tp over ICI)
    train     — optax train states and jitted train steps
    data      — SHOW-dataset loading and windowing
    eval      — FGD / LVD / diversity / beat-consistency metrics
    convert   — PyTorch reference checkpoint -> JAX weight conversion
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Some TPU plugins (e.g. the remote 'axon' backend) register themselves
    # in a way that overrides the documented JAX_PLATFORMS env var.  Honor
    # the user's explicit choice by re-asserting it through jax.config —
    # a no-op unless the backend is already initialized differently.
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # backend already initialized; leave it alone
        pass

from talkshow_tpu.config import (  # noqa: F401
    Config,
    body_pixel_config,
    body_vq_config,
    face_config,
    ls3dcg_config,
)

__all__ = [
    "Config",
    "Pipeline",
    "face_config",
    "body_vq_config",
    "body_pixel_config",
    "ls3dcg_config",
]


def __getattr__(name):
    if name == "Pipeline":
        from talkshow_tpu.pipeline import Pipeline
        return Pipeline
    raise AttributeError(name)
