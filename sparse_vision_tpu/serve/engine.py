"""Batched serving engine over an exported artifact.

TPU serving rule: XLA compiles one program per concrete input shape, so a
naive "run whatever batch arrives" server compiles unboundedly and stalls on
every new size. The engine therefore pads every request batch up to a fixed
bucket ladder (powers of two by default) — at most ``len(buckets)`` compiles
ever, all warmable up front — and slices the padding back off the outputs.
Shape-polymorphic artifacts make the ladder a pure serving choice; static
artifacts pin it to their exported batch.

``submit()`` adds cross-request micro-batching: a worker thread coalesces
concurrent single-sample requests into one device dispatch (the serving
analogue of the training loop's token batching) with a bounded linger.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np

from sparse_vision_tpu.serve.artifact import load_artifact


def _bucket_ladder(max_batch: int) -> tuple:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return tuple(out)


class ServingEngine:
    def __init__(self, artifact_dir: str, *, max_batch: int = 64,
                 buckets: Optional[Sequence[int]] = None,
                 linger_ms: float = 2.0):
        import jax

        self.exported, self.meta = load_artifact(artifact_dir)
        # jit the call so XLA's executable cache (keyed by concrete shape)
        # serves repeat buckets without re-tracing
        self._call = jax.jit(self.exported.call)
        self.input_shape = tuple(self.meta["input_shape"])
        self.input_dtype = np.dtype(self.meta["input_dtype"])
        if self.meta["batch"] == "poly":
            self.buckets = tuple(sorted(buckets)) if buckets else _bucket_ladder(max_batch)
        else:
            # static-batch artifact: the exported size is the only legal shape
            self.buckets = (int(self.meta["batch"]),)
        self.max_batch = self.buckets[-1]
        # extra static-shaped inputs (e.g. steering vectors): initialized to
        # the artifact's declared identity fills, replaceable per session via
        # set_extras(). They ride every dispatch unpadded — only the batch
        # axis buckets.
        self._extra_specs = tuple(self.meta.get("extra_inputs", ()))
        self._extras = tuple(
            np.full(tuple(s["shape"]), s.get("fill", 0.0), np.dtype(s["dtype"]))
            for s in self._extra_specs
        )
        self._linger_s = linger_ms / 1e3
        self._queue: queue.Queue = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        self._stop = threading.Event()

    # ---- direct batched path -------------------------------------------
    def warmup(self) -> None:
        """Compile every bucket up front (serving hosts do this before
        taking traffic; on TPU each first-compile is seconds-to-minutes)."""
        for b in self.buckets:
            self.predict(np.zeros((b, *self.input_shape), self.input_dtype))

    def set_extras(self, *arrays) -> None:
        """Replace the artifact's extra inputs (e.g. a steering vector pair)
        for every subsequent predict/submit — a steering session. Shapes must
        match the artifact's declared extra_inputs."""
        if len(arrays) != len(self._extra_specs):
            raise ValueError(
                f"artifact declares {len(self._extra_specs)} extra inputs, "
                f"got {len(arrays)}"
            )
        out = []
        for a, s in zip(arrays, self._extra_specs):
            a = np.asarray(a, np.dtype(s["dtype"]))
            if a.shape != tuple(s["shape"]):
                raise ValueError(
                    f"extra input {s['name']!r} shape {a.shape} != declared "
                    f"{tuple(s['shape'])}"
                )
            out.append(a)
        self._extras = tuple(out)

    def predict(self, images: np.ndarray) -> dict:
        """Run a request batch of any size; returns host numpy outputs with
        exactly ``len(images)`` rows per output."""
        images = np.asarray(images, self.input_dtype)
        if images.shape[1:] != self.input_shape:
            raise ValueError(
                f"request shape {images.shape[1:]} != artifact input "
                f"{self.input_shape}"
            )
        n = images.shape[0]
        outs: list[dict] = []
        i = 0
        while i < n:  # chunk oversize requests to the largest bucket
            chunk = images[i : i + self.max_batch]
            outs.append(self._run_padded(chunk))
            i += self.max_batch
        if len(outs) == 1:
            return outs[0]
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}

    def _run_padded(self, chunk: np.ndarray) -> dict:
        n = chunk.shape[0]
        bucket = next(b for b in self.buckets if b >= n)
        if bucket != n:
            pad = np.zeros((bucket - n, *self.input_shape), self.input_dtype)
            chunk = np.concatenate([chunk, pad])
        out = self._call(chunk, *self._extras)
        return {k: np.asarray(v)[:n] for k, v in out.items()}

    # ---- micro-batching service ----------------------------------------
    def start(self) -> None:
        if self._worker is not None:
            return
        self._stop.clear()
        self._worker = threading.Thread(target=self._serve_loop, daemon=True)
        self._worker.start()

    def stop(self) -> None:
        if self._worker is None:
            return
        self._stop.set()
        self._worker.join()
        self._worker = None

    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one sample; resolves to its per-sample output dict."""
        if self._worker is None:
            raise RuntimeError("engine not started; call start()")
        fut: Future = Future()
        self._queue.put((np.asarray(image, self.input_dtype), fut))
        return fut

    def _serve_loop(self) -> None:
        while not self._stop.is_set():
            batch = self._drain()
            if not batch:
                continue
            images = np.stack([img for img, _ in batch])
            try:
                out = self.predict(images)
            except BaseException as e:  # propagate to every waiter
                for _, fut in batch:
                    fut.set_exception(e)
                continue
            for i, (_, fut) in enumerate(batch):
                fut.set_result({k: v[i] for k, v in out.items()})

    def _drain(self) -> list:
        """Block for the first request, then linger briefly to coalesce
        whatever else is in flight, up to one max bucket."""
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        t_end = time.monotonic() + self._linger_s
        while len(batch) < self.max_batch:
            remaining = t_end - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch
