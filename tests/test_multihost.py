"""Multi-host (DCN) path, actually exercised: 2 JAX processes.

VERDICT r3 next #4: prove parallel/multihost.py with a real
2-process `jax.distributed.initialize` run — localhost coordinator, two
subprocesses with 4 virtual CPU devices each (8 global), one dp-sharded
body-VQ step through `global_mesh` + `make_global_batch`.  The loss is a
global reduction over both hosts' batch shards, so it only comes out
identical (and correct) on both processes if the cross-process sharding
and collectives actually work.
"""
import ast
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_body_vq_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    # share the suite's persistent compile cache (see test_cli_train.py);
    # host-keyed like conftest so cross-machine AOT artifacts never load
    from talkshow_tpu.utils import host_cache_dir
    env["JAX_COMPILATION_CACHE_DIR"] = host_cache_dir(os.path.join(
        os.path.dirname(__file__), ".jax_cache"))
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")

    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"loss{pid}.txt")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, f"127.0.0.1:{port}", "2", str(pid), out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(worker))))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), \
        "\n".join(log[-3000:] for log in logs)

    losses = [ast.literal_eval(open(o).read()) for o in outs]
    assert len(losses[0]) == 2 and np.isfinite(losses[0]).all()
    # both processes saw the identical global loss (true collective)
    assert losses[0] == losses[1]
    # step 2 differs from step 1 (optimizer actually updated the params)
    assert losses[0][0] != losses[0][1]
