#!/usr/bin/env python
"""Serving-throughput benchmark for talkshow_tpu.serving.MotionServer.

Measures wall-clock flush latency and motion-seconds/sec for batched
10 s-clip traffic.  Prints one JSON line.

Note on remote-attached chips (axon): each flush uploads the group's
waveforms (~2.7 MB per batch of four 10 s clips) and reads back the
motion over the tunnel, so wall numbers there are transfer-bound; the
device compute per group is ~20 ms.  On a locally attached chip the same
program is device-bound.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bucket_frames", type=int, default=320)
    p.add_argument("--max_batch", type=int, default=4)
    p.add_argument("--clip_seconds", type=float, default=10.0)
    p.add_argument("--requests", type=int, default=8)
    p.add_argument("--trials", type=int, default=3)
    args = p.parse_args()

    import jax
    from talkshow_tpu.pipeline import Pipeline
    from talkshow_tpu.serving import MotionServer

    pipe = Pipeline.create(0)
    server = MotionServer(pipe, bucket_frames=args.bucket_frames,
                          max_batch=args.max_batch)
    t0 = time.perf_counter()
    n_prog = server.warmup(max_clip_seconds=args.clip_seconds)
    warmup_s = time.perf_counter() - t0

    def wav(seed):
        return (np.random.default_rng(seed).standard_normal(
            int(16000 * args.clip_seconds)) * 0.1).astype(np.float32)

    # one warm flush (device caches)
    for i in range(args.max_batch):
        server.submit(wav(i), speaker=i % 4)
    server.flush()

    best_ms = float("inf")
    for trial in range(args.trials):
        for i in range(args.requests):
            server.submit(wav(100 + trial * args.requests + i),
                          speaker=i % 4)
        t0 = time.perf_counter()
        out = server.flush()
        dt = time.perf_counter() - t0
        assert len(out) == args.requests
        best_ms = min(best_ms, dt * 1000)

    motion_sec_per_sec = (args.requests * args.clip_seconds
                          / (best_ms / 1000.0))
    print(json.dumps({
        "flush_ms": round(best_ms, 1),
        "clips_per_sec": round(args.requests / (best_ms / 1000.0), 2),
        "motion_sec_per_sec": round(motion_sec_per_sec, 1),
        "requests": args.requests,
        "max_batch": args.max_batch,
        "bucket_frames": args.bucket_frames,
        "warmup_s": round(warmup_s, 1),
        "programs": n_prog,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
