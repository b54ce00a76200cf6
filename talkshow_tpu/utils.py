"""Runtime utilities: profiling, determinism, failure detection.

The reference has none of these beyond RNG seeding + a NaN-gradient print
(SURVEY.md §5); here they are first-class:

  * `trace(...)`: context manager around jax.profiler for TensorBoard-
    viewable TPU traces;
  * `seed_everything`: one seed -> (numpy rng, jax key), replacing the
    reference's global-mutation seeding (trainer/Trainer.py:79-84);
  * `skip_nonfinite_updates`: an optax wrapper that SKIPS a step when
    grads contain NaN/Inf and counts occurrences — replacing the
    reference's `print('fuck')` NaN "handling"
    (nets/smplx_body_pixel.py:221-222).
"""
from __future__ import annotations

import contextlib
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/talkshow_trace", enabled: bool = True):
    """Profile everything inside the context to a TensorBoard trace dir."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for traces: `with annotate('decode'): ...`."""
    return jax.profiler.TraceAnnotation(name)


def seed_everything(seed: int):
    """-> (np.random.Generator, jax PRNG key)."""
    return np.random.default_rng(seed), jax.random.PRNGKey(seed)


class StepTimer:
    """Wall-clock per-step timing with warmup skip (host-side)."""

    def __init__(self, skip: int = 2):
        self.skip = skip
        self.times: list[float] = []
        self._t0 = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.skip:
            self.times.append(dt)

    @property
    def mean_ms(self) -> float:
        return 1000.0 * float(np.mean(self.times)) if self.times else 0.0


def skip_nonfinite_updates(inner: optax.GradientTransformation
                           ) -> optax.GradientTransformation:
    """Wrap an optimizer: if any grad is non-finite, apply a zero update
    and increment a counter instead of poisoning the params."""

    def init(params):
        return {"inner": inner.init(params),
                "nonfinite_count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]))
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, inner_state = inner.update(safe_grads, state["inner"], params)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
        # true skip: on a non-finite step the inner state (moments, counts)
        # stays exactly as it was, so the poisoned step leaves no trace
        inner_state = tree_select(finite, inner_state, state["inner"])
        return updates, {
            "inner": inner_state,
            "nonfinite_count": state["nonfinite_count"] + (1 - finite.astype(jnp.int32)),
        }

    return optax.GradientTransformation(init, update)


def all_finite(tree) -> jnp.ndarray:
    """Scalar bool: every array leaf of `tree` is finite."""
    leaves = [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(tree)]
    return jnp.all(jnp.asarray(leaves))


def tree_select(pred, new_tree, old_tree):
    """Elementwise `new if pred else old` over matching pytrees (used to
    guard BatchNorm stats / VQ EMA state on non-finite train steps)."""
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(pred, n, o) if hasattr(n, "shape") else n,
        new_tree, old_tree)


def cast_floats(tree, dtype=jnp.bfloat16, keep_norm_f32: bool = True):
    """Cast float arrays of a params pytree to `dtype` (inference
    quantization). Norm scales/biases stay f32 by default."""
    def cast(path, x):
        if not hasattr(x, "dtype") or not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        keys = [str(getattr(k, "key", k)) for k in path]
        if keep_norm_f32 and any(("Norm" in k or k in ("scale", "mean", "var"))
                                 for k in keys):
            return x
        return x.astype(dtype)
    return jax.tree_util.tree_map_with_path(cast, tree)


def host_cache_dir(base: str) -> str:
    """Host-keyed persistent-compilation-cache directory.

    XLA:CPU's persistent cache stores AOT-compiled executables whose ISA
    matches the COMPILING host; loading them on a host with different CPU
    features fails (cpu_aot_loader "Compile machine features ... doesn't
    match", potentially SIGILL).  Keying the cache path by machine arch +
    /proc/cpuinfo flags makes a shared/checked-around cache dir safe: each
    host population gets its own subtree, warm runs stay warm."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        # No readable ISA fingerprint (masked /proc in a hardened
        # container): fall back to the hostname so distinct machines can
        # never collide on one cache subtree.  Weaker sharing (a renamed
        # host recompiles), never unsafe.
        flags = "no-cpuinfo:" + platform.node()
    key = hashlib.sha1(
        (platform.machine() + flags).encode()).hexdigest()[:12]
    return os.path.join(base, f"host-{key}")


def prefetch_iter(iterable, depth: int = 2):
    """Yield items of `iterable` while producing the NEXT `depth` items in
    a background thread — overlaps host-side batch assembly (window
    slicing, np.stack) with device compute. Order-preserving, so training
    remains bit-reproducible; generator exceptions re-raise at the
    consuming site."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END, _ERR = object(), object()

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 — forwarded to consumer
            q.put((_ERR, e))
            return
        q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            raise item[1]
        yield item
