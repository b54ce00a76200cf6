"""Device mesh + sharding rules (dp x tp over ICI).

The workload is small enough that data parallelism is the primary axis
(SURVEY.md §2.2 — the reference's only parallelism is a 2-GPU
DataParallel on the pixel stage).  We still expose a 2-D (dp, tp) mesh:

  * batch axes shard over 'dp';
  * wide channel dimensions (VQ-VAE 1024-ch trunks, the PixelCNN 512-ch
    head, wav2vec FFN 3072) shard over 'tp'.

Sharding is by annotation only: params get NamedShardings from
`shard_params`, inputs from `batch_sharding`, and XLA GSPMD inserts the
all-gather / reduce-scatter collectives (the scaling-book recipe).
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp={dp*tp} != #devices={n}")
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, ("dp", "tp"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: tuple, x: Any, tp: int) -> P:
    """Choose a PartitionSpec for one parameter tensor.

    Kernels whose output-channel dim is large and divisible by tp shard on
    'tp'; everything else replicates.  (Biases/norm params stay replicated:
    they are tiny and XLA fuses the broadcast.)
    """
    shape = getattr(x, "shape", ())
    if len(shape) == 0 or tp == 1:
        return P()
    name = path[-1] if path else ""
    if name == "kernel" and len(shape) >= 2 and shape[-1] % tp == 0 and shape[-1] >= 512:
        return P(*([None] * (len(shape) - 1)), "tp")
    if name == "embedding" and len(shape) == 2 and shape[0] % tp == 0 and shape[0] >= 512:
        return P("tp", None)   # big embedding tables (codebook-sized) row-shard
    return P()


def param_shardings(mesh: Mesh, params: Any):
    """Pytree of NamedShardings matching `params` under the rules above."""
    tp = mesh.shape["tp"]

    def walk(path, x):
        return NamedSharding(mesh, _param_spec(tuple(str(k.key) if hasattr(k, "key") else str(k) for k in path), x, tp))

    return jax.tree_util.tree_map_with_path(walk, params)


def shard_params(mesh: Mesh, params: Any):
    """Device-put params with tp shardings applied."""
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
