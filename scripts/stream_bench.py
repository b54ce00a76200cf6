#!/usr/bin/env python
"""Streaming-latency benchmark for talkshow_tpu.streaming.StreamingSession.

Feeds 1 s audio chunks and measures steady-state per-chunk wall latency
against the motion duration each chunk emits.  Prints one JSON line.

On a remote-attached chip (axon) the latency is dominated by the tunnel
round trip + window upload; device compute per chunk is ~10 ms.
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
    p.add_argument("--chunk_rows", type=int, default=8)
    p.add_argument("--context_rows", type=int, default=24)
    p.add_argument("--warm_chunks", type=int, default=6)
    p.add_argument("--timed_chunks", type=int, default=10)
    args = p.parse_args()

    import jax
    from talkshow_tpu.pipeline import Pipeline
    from talkshow_tpu.streaming import StreamingSession

    pipe = Pipeline.create(0)
    sess = StreamingSession(pipe, speaker=0, chunk_rows=args.chunk_rows,
                            context_rows=args.context_rows)

    def chunk_wav(i):
        return (np.random.default_rng(i).standard_normal(16000)
                * 0.1).astype(np.float32)

    t0 = time.perf_counter()
    for i in range(args.warm_chunks):
        sess.feed(chunk_wav(i))
    warmup_s = time.perf_counter() - t0

    times = []
    for i in range(args.warm_chunks, args.warm_chunks + args.timed_chunks):
        t0 = time.perf_counter()
        out = sess.feed(chunk_wav(i))
        dt = (time.perf_counter() - t0) * 1000
        if out is not None:
            times.append(dt)
    p50 = float(np.percentile(times, 50))
    emit_ms = args.chunk_rows * 4 / 30 * 1000
    print(json.dumps({
        "chunk_latency_p50_ms": round(p50, 1),
        "motion_ms_per_chunk": round(emit_ms, 1),
        "real_time_factor": round(emit_ms / p50, 2),
        "chunk_rows": args.chunk_rows,
        "context_rows": args.context_rows,
        "warmup_s": round(warmup_s, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
