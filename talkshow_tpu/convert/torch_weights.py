"""PyTorch <-> JAX weight-layout conversion utilities.

Generic tensor-layout converters used to ingest reference TalkSHOW
checkpoints (nets/* state dicts) and HF wav2vec2 weights into the flax
models.  Each model has a dedicated mapper that walks the torch state dict.
Torch is only needed at conversion time; converted checkpoints are saved as
plain numpy/orbax trees.
"""
from __future__ import annotations

import numpy as np


def t2j(x) -> np.ndarray:
    """torch tensor -> numpy (host)."""
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def conv1d_kernel(w) -> np.ndarray:
    """torch Conv1d weight (out, in, k) -> flax nn.Conv kernel (k, in, out)."""
    return t2j(w).transpose(2, 1, 0)


def conv1d_transpose_kernel(w) -> np.ndarray:
    """torch ConvTranspose1d weight (in, out, k) -> flax nn.ConvTranspose
    (transpose_kernel=True) kernel (k, out, in)."""
    return t2j(w).transpose(2, 1, 0)


def conv2d_kernel(w) -> np.ndarray:
    """torch Conv2d weight (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return t2j(w).transpose(2, 3, 1, 0)


def linear_kernel(w) -> np.ndarray:
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return t2j(w).T


def batchnorm(params: dict, stats: dict, prefix: str, state_dict: dict,
              flax_name: str = "BatchNorm_0") -> None:
    """Copy a torch BatchNorm1d into flax BatchNorm params/batch_stats."""
    params[flax_name] = {
        "scale": t2j(state_dict[prefix + ".weight"]),
        "bias": t2j(state_dict[prefix + ".bias"]),
    }
    stats[flax_name] = {
        "mean": t2j(state_dict[prefix + ".running_mean"]),
        "var": t2j(state_dict[prefix + ".running_var"]),
    }


def layernorm(state_dict: dict, prefix: str) -> dict:
    return {
        "scale": t2j(state_dict[prefix + ".weight"]),
        "bias": t2j(state_dict[prefix + ".bias"]),
    }
