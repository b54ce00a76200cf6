"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Each process owns 4 virtual CPU devices (8 global), initializes the JAX
distributed runtime through talkshow_tpu.parallel.multihost, and runs TWO
dp-sharded body-VQ train steps on a deterministic batch: the global mesh
spans both processes, `make_global_batch` stitches each host's local shard
into the global dp-sharded array, and the loss (a global reduction across
both hosts' shards) must come out bit-identical on every process.

Usage: python tests/multihost_worker.py <coordinator> <num_procs> <pid> <out>
"""
import os
import sys

# set outright (no append): the parent test process may itself carry a
# conflicting --xla_force_host_platform_device_count (tests/conftest.py
# uses 8), and the LAST occurrence would win
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    coordinator, nprocs, pid, out_path = (sys.argv[1], int(sys.argv[2]),
                                          int(sys.argv[3]), sys.argv[4])
    import numpy as np
    import jax
    import jax.numpy as jnp

    from talkshow_tpu.parallel import multihost as mh

    mh.initialize_multihost(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 4 * nprocs          # global
    assert len(jax.local_devices()) == 4             # per host

    from jax.sharding import NamedSharding, PartitionSpec as P
    from talkshow_tpu.models.vqvae import VQVAE
    from talkshow_tpu.train import steps as tsteps

    mesh = mh.global_mesh(dp=8, tp=1)   # pure dp across both hosts

    # establish the Gloo context while the processes are still in
    # lockstep — the train-step compile below can skew them past Gloo's
    # 30 s connect timeout (see mh.warmup_collectives docstring)
    assert mh.warmup_collectives(mesh) == 4 * nprocs

    vq_body = VQVAE(in_dim=39, num_hiddens=32, embedding_dim=8)
    vq_hand = VQVAE(in_dim=90, num_hiddens=32, embedding_dim=8)
    init_state, step = tsteps.make_body_vq_step(vq_body, vq_hand, 1e-3)
    state = init_state(jax.random.PRNGKey(0), window=16)

    # identical init on every process (same seed) -> replicate globally
    rep = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        state)

    # deterministic GLOBAL batch; this host contributes rows
    # [pid*local : (pid+1)*local] — global batch 8 = 2 hosts x 4 rows
    rng = np.random.default_rng(7)
    global_poses = rng.standard_normal((8, 16, 129)).astype(np.float32) * 0.2
    local = global_poses[pid * 4:(pid + 1) * 4]
    losses = []
    for _ in range(2):
        batch = mh.make_global_batch(mesh, {"poses": local})
        assert batch["poses"].shape == (8, 16, 129)   # global, dp-sharded
        state, metrics = step(state, batch)
        losses.append(float(metrics["body_rec"]) + float(metrics["hand_rec"]))
    assert np.isfinite(losses).all()

    with open(out_path, "w") as f:
        f.write(repr(losses))
    print(f"proc {pid} ok: {losses}")


if __name__ == "__main__":
    main()
