"""Multi-host (DCN) scaling helpers.

The workload fits one chip, but the framework exposes the standard JAX
multi-host recipe for fleet-scale training: initialize the distributed
runtime, build a global (dp, tp) mesh over all hosts' devices, and feed
per-host data shards through `make_global_batch` (host-local arrays ->
one globally-sharded array, collectives ride ICI within a slice and DCN
across slices only for the dp all-reduce).

Exercised end-to-end by tests/test_multihost.py: two real JAX processes
(localhost coordinator, 4 virtual CPU devices each) run dp-sharded
body-VQ train steps through `global_mesh` + `make_global_batch` and
assert the globally-reduced loss is identical on both hosts.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-var fallbacks; no-op when
    single-process."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def warmup_collectives(mesh: Mesh) -> float:
    """Establish the cross-process collective context with a tiny psum.

    CPU collectives (Gloo) initialize lazily at the FIRST collective
    execution, with a ~30 s TCP connect timeout per pair.  The first real
    collective usually sits inside a big jitted train step whose compile
    time differs across processes (cache state, machine load) — if one
    process reaches the collective while a peer is still compiling for
    >30 s, Gloo context init fails with DEADLINE_EXCEEDED/Connect timeout
    (observed in tests/test_multihost.py under load).  Running a trivial
    psum first bounds the arrival skew by this function's ~sub-second
    compile, so the TCP mesh is up before any heavy compile begins; later
    collectives reuse the established context.  Returns the psum result
    (= number of mesh devices) so callers can sanity-check participation.
    """
    spec = NamedSharding(mesh, P())
    ones = jax.device_put(np.ones((len(mesh.devices.flat),), np.float32),
                          NamedSharding(mesh, P(mesh.axis_names[0])))

    @jax.jit
    def _allsum(x):
        return jax.lax.with_sharding_constraint(x.sum(keepdims=True), spec)

    return float(np.asarray(_allsum(ones))[0])


def global_mesh(dp: int | None = None, tp: int = 1) -> Mesh:
    """Mesh over ALL devices (across hosts). tp should divide the number of
    devices per host so tensor collectives never cross DCN."""
    devices = np.asarray(jax.devices())
    n = len(devices)
    dp = dp if dp is not None else n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp={dp * tp} != global devices {n}")
    per_host = len(jax.local_devices())
    if tp > per_host:
        raise ValueError(f"tp={tp} would cross hosts (per-host={per_host})")
    return Mesh(devices.reshape(dp, tp), ("dp", "tp"))


def make_global_batch(mesh: Mesh, host_batch: dict) -> dict:
    """Per-host numpy batch -> globally dp-sharded jax arrays.

    Each host passes its local shard (global_batch_size / num_hosts rows);
    jax.make_array_from_process_local_data assembles the global array.
    """
    out = {}
    for k, v in host_batch.items():
        v = np.asarray(v)
        sharding = NamedSharding(mesh, P("dp", *([None] * (v.ndim - 1))))
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
