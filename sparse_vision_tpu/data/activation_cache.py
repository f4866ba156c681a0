"""Activation cache: dump a frozen backbone's tapped activations once, then train SAEs
directly from the cached token shards.

The reference ABANDONED an HDF5 version of this (activations_handler.py +
utils.py:613-657, kept in supplementary_files_1) because naive whole-dataset HDF5
caching didn't scale; its production path recomputes the backbone forward every SAE
train step inside a hook. Here the cache is a first-class, TPU-friendly path (SURVEY.md
§7.3 #5): the north-star workload trains a 16k-latent SAE on ImageNet GoogLeNet
activations, where recomputing GoogLeNet per step wastes ~100x the SAE's FLOPs.

Format: a directory of fixed-size raw token shards ``acts_00000.npy`` ([tokens, C],
float32 by default) + ``meta.json``. Shards are memory-mapped on read; a background
thread prefetches the next shard while the current one feeds the device, so host IO
overlaps TPU compute.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

# bfloat16 doesn't round-trip through the .npy header; shards store a uint16 BITCAST
# and meta.json records the logical dtype.
_BF16 = ml_dtypes.bfloat16


def _to_storage(arr: np.ndarray) -> np.ndarray:
    return arr.view(np.uint16) if arr.dtype == _BF16 else arr


def _from_storage(arr: np.ndarray, logical_dtype: str) -> np.ndarray:
    return arr.view(_BF16) if logical_dtype == "bfloat16" else arr


def _scale_path(shard_path: str) -> str:
    """Sidecar per-channel scale file of an int8 shard (acts_N.npy -> scales_N.npy)."""
    d, b = os.path.split(shard_path)
    return os.path.join(d, b.replace("acts_", "scales_", 1))


def quantize_int8(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-channel int8 quantization of a [T, C] token block.

    scale[c] = absmax(arr[:, c]) / 127 (floored away from 0 so all-zero channels
    round-trip to exact zeros); q = round(arr / scale) clipped to [-127, 127].
    Dequantized value = q * scale — the train step does this ON DEVICE
    (train/steps.make_dequant_step_fn), so an int8 cache halves disk AND
    host->device bytes vs bfloat16 at a max per-element error of absmax/254."""
    a = np.asarray(arr, np.float32)
    scale = np.abs(a).max(axis=0) / 127.0
    scale = np.maximum(scale, 1e-12).astype(np.float32)
    q = np.clip(np.rint(a / scale), -127, 127).astype(np.int8)
    return q, scale


def dequantize_int8(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Host-side inverse of :func:`quantize_int8` (the device-side version lives in
    the train-step wrapper; this one serves host consumers and tests)."""
    return q.astype(np.float32) * scale


def validate_sharded_batch(batch_size: int, sharding) -> None:
    """Fail fast on a batch size the sharded tap pass cannot split evenly — a
    non-divisible batch otherwise surfaces as an opaque device_put sharding error
    mid-dump. Called by dump_activations, and by train_sae_cached BEFORE spawning
    the overlap dump thread (a thread-side raise would only surface after the
    pre-training eval consumed the stream)."""
    if sharding is None:
        return
    n_data = int(dict(sharding.mesh.shape).get("data", 1))
    if batch_size % max(n_data, 1):
        raise ValueError(
            f"batch_size={batch_size} (cfg.sae_batch_size) must be divisible by "
            f"the data mesh axis size {n_data} (cfg.mesh_shape) for the sharded "
            "activation dump."
        )


class _ShardWriter:
    """Accumulates token rows and publishes fixed-size ``acts_NNNNN.npy`` shards
    atomically (temp file + os.replace). One writer per output cache directory;
    the multi-layer dump runs several concurrently off one backbone pass."""

    def __init__(self, out_dir: str, shard_tokens: int,
                 shard_queue: Optional[queue.Queue] = None, quantize: bool = False):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.shard_tokens = shard_tokens
        self.shard_queue = shard_queue
        self.quantize = quantize
        self.buf: list[np.ndarray] = []
        self.buffered = 0
        self.shard_idx = 0
        self.total = 0
        self.dim: Optional[int] = None
        self.sumsq = 0.0  # running sum of squared entries -> meta["token_rms"]
        self.sumsq_n = 0

    def add(self, tok: np.ndarray) -> None:
        self.dim = tok.shape[1]
        # token-RMS statistic of the TRUE values (before int8 quantization):
        # sqrt(mean(x^2)) over all entries — the per-layer input scale
        # sae_input_norm="rms" training divides by (config.py). BLAS dot keeps
        # this a negligible share of the dump (decode-bound on this host).
        flat = np.ascontiguousarray(tok, dtype=np.float32).ravel()
        self.sumsq += float(np.dot(flat, flat))
        self.sumsq_n += flat.size
        self.buf.append(tok)
        self.buffered += tok.shape[0]
        self._flush(final=False)

    def _flush(self, final: bool) -> None:
        while self.buffered >= self.shard_tokens or (final and self.buffered > 0):
            take = min(self.shard_tokens, self.buffered)
            chunk, rest, got = [], [], 0
            for a in self.buf:
                if got + a.shape[0] <= take:
                    chunk.append(a)
                    got += a.shape[0]
                else:
                    chunk.append(a[: take - got])
                    rest.append(a[take - got :])
                    got = take
            # force C order: device->host arrays can come back F-contiguous
            arr = np.ascontiguousarray(np.concatenate(chunk, axis=0))
            path = os.path.join(self.out_dir, f"acts_{self.shard_idx:05d}.npy")
            tmp = path + ".tmp"
            if self.quantize:
                q, scale = quantize_int8(arr)
                # the scale sidecar lands BEFORE the shard's atomic publish, so a
                # shard path on the overlap queue / in a directory listing always
                # has its scales readable
                spath = _scale_path(path)
                with open(spath + ".tmp", "wb") as f:
                    np.save(f, scale)
                os.replace(spath + ".tmp", spath)
                arr = q
            with open(tmp, "wb") as f:
                np.save(f, _to_storage(arr))
            os.replace(tmp, path)  # atomic publish: readers never see partial shards
            if self.shard_queue is not None:
                self.shard_queue.put(path)
            self.shard_idx += 1
            self.total += arr.shape[0]
            self.buf = rest
            self.buffered = sum(a.shape[0] for a in self.buf)
            if final and self.buffered == 0:
                break

    def finish(self, layer: str, dtype) -> dict:
        self._flush(final=True)
        if self.dim is None:
            raise ValueError(
                f"activation dump for {layer!r} received ZERO batches — the "
                "dataset has fewer samples than one batch (drop_last) or the "
                "batch iterator was empty; nothing to cache"
            )
        if self.quantize:
            dtype_name = "int8"
        else:
            dtype_name = "bfloat16" if np.dtype(dtype) == _BF16 else np.dtype(dtype).name
        meta = {
            "layer": layer,
            "dim": int(self.dim),
            "num_shards": self.shard_idx,
            "total_tokens": int(self.total),
            "shard_tokens": int(self.shard_tokens),
            "dtype": dtype_name,
            "token_rms": float(np.sqrt(self.sumsq / max(self.sumsq_n, 1))),
        }
        with open(os.path.join(self.out_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
        return meta


def dump_activations(
    net,
    params: dict,
    state: Optional[dict],
    dataset,
    layer: str,
    out_dir: str,
    batch_size: int = 64,
    shard_tokens: int = 1 << 16,
    dtype=np.float32,
    max_batches: Optional[int] = None,
    shuffle_images: bool = False,
    seed: int = 0,
    workers: Optional[int] = None,
    sharding=None,
    shard_queue: Optional[queue.Queue] = None,
) -> dict:
    """Run the frozen backbone over ``dataset``, flatten the tapped layer to tokens
    ([B, H, W, C] -> [B*H*W, C]), and write fixed-size shards. Returns the meta dict.

    ``shuffle_images=True`` streams the images in a shuffled order so cached token
    blocks decorrelate across the dataset (recommended for training caches).
    Decode runs on a thread pool (``workers``; None -> auto) and batches are staged
    onto the device one step ahead, so the tap pass is bound by backbone FLOPs or
    disk bandwidth — not single-threaded PIL.

    ``sharding`` (a NamedSharding over a 'data' mesh axis) runs the tap pass
    data-parallel over every chip: image batches are placed sharded, the jitted
    forward partitions via GSPMD, and tokens gather to host for the shard writer
    (batch_size must divide by the data-axis size).

    ``shard_queue``: each finished shard's path is put on this queue as soon as its
    atomic write completes — the dump/train overlap hook (stream_stacks consumes
    shards while later ones are still being written). Shard files are always
    published via temp-file + os.replace, so a path on the queue (or visible to a
    directory listing) is always a complete shard; bytes are identical to the
    sequential mode's."""
    metas = dump_activations_multi(
        net, params, state, dataset, [layer], {layer: out_dir},
        batch_size=batch_size, shard_tokens=shard_tokens, dtype=dtype,
        max_batches=max_batches, shuffle_images=shuffle_images, seed=seed,
        workers=workers, sharding=sharding,
        shard_queues=None if shard_queue is None else {layer: shard_queue},
    )
    return metas[layer]


def dump_activations_multi(
    net,
    params: dict,
    state: Optional[dict],
    dataset,
    layers: list[str],
    out_dirs: dict[str, str],
    batch_size: int = 64,
    shard_tokens: int = 1 << 16,
    dtype=np.float32,
    max_batches: Optional[int] = None,
    shuffle_images: bool = False,
    seed: int = 0,
    workers: Optional[int] = None,
    sharding=None,
    shard_queues: Optional[dict[str, queue.Queue]] = None,
) -> dict[str, dict]:
    """Write the activation caches of EVERY requested layer from ONE backbone pass.

    The reference prepares the circuit tier's 8 frozen SAEs with 8 independent
    cluster jobs, each re-running the full ImageNet forward (compute_ie.py:52 layer
    list; one parameters.txt line per layer). Here ``SeqNet.apply`` already returns
    every stage's output up to ``stop_at``, so tapping N layers costs the SAME
    backbone FLOPs as tapping one: the jitted tap stops at the deepest requested
    stage and one `_ShardWriter` per layer shards its token stream. Per-layer shard
    files and meta are byte-identical to running ``dump_activations`` once per layer
    with the same arguments (pinned by tests), so ``ActivationCache``/``Pipeline``
    consume them unchanged.

    ``layers`` may include sub-taps (``"stage.sub"``); depth is the owning stage's
    index. ``shard_queues`` maps layer -> overlap queue (see ``dump_activations``);
    queues receive shard paths only — the caller owns the end-of-stream sentinel.
    """
    from sparse_vision_tpu.data.prefetch import prefetch
    from sparse_vision_tpu.models.sae import tokens_from_act

    validate_sharded_batch(batch_size, sharding)
    layers = list(dict.fromkeys(layers))
    missing = [l for l in layers if l not in out_dirs]
    if missing:
        raise ValueError(f"out_dirs missing entries for layers {missing}")
    # one forward serves all layers: stop at the DEEPEST requested stage
    depth = {l: net.index_of(l.split(".")[0]) for l in layers}
    stop = max(layers, key=lambda l: depth[l]).split(".")[0]

    # cast to the storage dtype ON DEVICE: a bf16 cache then moves half the bytes
    # device->host and skips the single-core ml_dtypes conversion entirely (measured
    # on the v5e tunnel host: the 8-layer dump dropped 188 s -> 30 s; XLA and
    # ml_dtypes both round-to-nearest-even, so shard bytes are unchanged).
    # dtype="int8": the device->host leg stays bf16 (per-shard scales can't be known
    # on device mid-stream); the shard writer quantizes at flush (quantize_int8).
    quantize = isinstance(dtype, str) and dtype == "int8"
    if not quantize and np.dtype(dtype) == np.int8:
        # np.int8 would be a silent astype TRUNCATION on device (no scales, data
        # destroyed) while meta would still say "int8" — only the string form
        # routes through quantize_int8
        raise ValueError("pass dtype='int8' (the string) for quantized dumps")
    acc_dtype = _BF16 if quantize else np.dtype(dtype)
    jdt = jnp.bfloat16 if np.dtype(acc_dtype) == _BF16 else np.dtype(acc_dtype)

    @jax.jit
    def tap(images):
        _, taps, _ = net.apply(params, images, state=state, stop_at=stop)
        return {l: tokens_from_act(taps[l])[0].astype(jdt) for l in layers}

    writers = {
        l: _ShardWriter(out_dirs[l], shard_tokens, (shard_queues or {}).get(l),
                        quantize=quantize)
        for l in layers
    }
    n = 0
    it = prefetch(
        dataset.batches(batch_size, shuffle=shuffle_images, seed=seed, workers=workers),
        sharding,
    )
    def drain(toks_dev):
        # device_get after copy_to_host_async: the bytes are already in flight
        toks = jax.device_get(toks_dev)
        for l in layers:
            # already the accumulation dtype (device-side cast): no host conversion
            tok = toks[l]
            writers[l].add(
                tok if tok.dtype == np.dtype(acc_dtype) else tok.astype(acc_dtype)
            )

    # one-batch software pipeline: dispatch the NEXT tap, start async host copies,
    # THEN drain the previous batch — device->host transfer latency (the dominant
    # cost through a network-attached device: N layers x RTT per batch if fetched
    # synchronously) hides behind the next forward
    pending = None
    for batch in it:
        toks_dev = tap(batch.images)
        jax.tree.map(lambda a: a.copy_to_host_async(), toks_dev)
        if pending is not None:
            drain(pending)
        pending = toks_dev
        n += 1
        if max_batches is not None and n >= max_batches:
            break
    if pending is not None:
        drain(pending)
    return {l: writers[l].finish(l, acc_dtype) for l in layers}


def stream_stacks(
    shard_queue: queue.Queue,
    tokens_per_step: int,
    k: int,
    logical_dtype: str = "float32",
) -> Iterator[np.ndarray]:
    """Yield [k', tokens_per_step, C] scan stacks from shard paths arriving on
    ``shard_queue`` WHILE the dump is still writing later shards — the dump/train
    overlap consumer (VERDICT r2 #6: train on shard i while the dump flushes i+1).

    Queue items: a shard path (complete, atomically published by dump_activations),
    ``None`` = dump finished, a BaseException = dump failed (re-raised here, same
    error-forwarding contract as the prefetch readers). Remainder tokens carry
    across shards; trailing partial steps are dropped (drop_last, matching
    ActivationCache.batches). Order is dump order — the streamed first epoch has no
    shard shuffle; later epochs read the completed cache with the usual shuffle."""
    block = tokens_per_step * k
    rem: Optional[np.ndarray] = None
    while True:
        item = shard_queue.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise item
        arr = _from_storage(np.load(item, mmap_mode="r"), logical_dtype)
        if logical_dtype == "int8":
            # overlapped epoch 0 is dump-bound; host dequantization (the scale
            # sidecar is published before its shard) keeps the consumer uniform
            # with the host-dequant read path — later epochs use the device path
            arr = dequantize_int8(np.asarray(arr), np.load(_scale_path(item)))
        if rem is not None and rem.shape[0]:
            # only the final (short) shard leaves a remainder when shard_tokens is a
            # multiple of the block, so this concat copy is rare
            arr = np.concatenate([rem, np.asarray(arr)], axis=0)
        n_full = arr.shape[0] // block
        for s in range(0, n_full * block, block):
            yield np.asarray(arr[s : s + block]).reshape(k, tokens_per_step, -1)
        rem = np.array(arr[n_full * block :])
    if rem is not None and rem.shape[0] >= tokens_per_step:
        n_steps = rem.shape[0] // tokens_per_step
        yield rem[: n_steps * tokens_per_step].reshape(
            n_steps, tokens_per_step, -1
        )


def overlapped_multi_dump(
    net, params, state, dataset, layers: list[str], out_dirs: dict[str, str],
    **dump_kwargs,
) -> tuple[dict[str, queue.Queue], "threading.Thread"]:
    """Start ``dump_activations_multi`` on a background thread with one overlap
    queue per layer: each layer's shard paths arrive in dump order, ``None`` =
    dump finished, a BaseException (put on EVERY queue so any blocked consumer
    wakes) = dump failed. The zip consumer is :func:`stream_stacks_zip`; the
    on-disk caches stay byte-identical to the sequential mode's."""
    import threading

    qs = {l: queue.Queue() for l in layers}

    def _producer():
        try:
            dump_activations_multi(
                net, params, state, dataset, layers, out_dirs,
                shard_queues=qs, **dump_kwargs,
            )
            for q in qs.values():
                q.put(None)
        except BaseException as e:  # forwarded to every stream consumer
            for q in qs.values():
                q.put(e)

    t = threading.Thread(target=_producer, daemon=True)
    t.start()
    return qs, t


def stream_stacks_zip(
    shard_queues: list,
    tokens_per_step: int,
    k: int,
    logical_dtype: str = "float32",
) -> Iterator[tuple]:
    """Zip :func:`stream_stacks` over L ALIGNED overlap queues: yields tuples of
    [k', tokens_per_step, C_l] stacks, one per layer, while the multi-layer dump
    is still writing — the transcoder/crosscoder dump-train overlap consumer.

    Alignment is structural: dump_activations_multi writes every layer's shard i
    from the same batch window before any layer's shard i+1, and all layers
    share (shard_tokens, token order), so the L stream_stacks generators yield
    identical block counts and the blocking zip can never deadlock."""
    its = [
        stream_stacks(q, tokens_per_step, k, logical_dtype=logical_dtype)
        for q in shard_queues
    ]
    yield from zip(*its)


class ActivationCache:
    """Memory-mapped shard reader with one-shard-ahead background prefetch."""

    def __init__(self, cache_dir: str):
        with open(os.path.join(cache_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.dir = cache_dir
        self.shard_paths = [
            os.path.join(cache_dir, f"acts_{i:05d}.npy")
            for i in range(self.meta["num_shards"])
        ]
        self.dim = self.meta["dim"]
        self.total_tokens = self.meta["total_tokens"]
        # int8 caches (quantize_int8): per-shard per-channel scale sidecars
        self.quantized = self.meta["dtype"] == "int8"
        self._scales: dict[int, np.ndarray] = {}

    def scale(self, i: int) -> np.ndarray:
        """Shard ``i``'s per-channel dequantization scale ([C] float32)."""
        if i not in self._scales:
            self._scales[i] = np.load(_scale_path(self.shard_paths[i]))
        return self._scales[i]

    @property
    def token_rms(self) -> float:
        """sqrt(mean(x^2)) over the cached tokens — the per-layer input scale
        that ``sae_input_norm="rms"`` training divides by. Dumps record it in
        meta.json; for caches written before the field existed it is computed
        once from the first shard (statistically equivalent at >=64k tokens)
        and persisted back."""
        if "token_rms" not in self.meta:
            a = np.asarray(self._load(0), dtype=np.float32)
            if self.quantized:
                a = dequantize_int8(a, self.scale(0))
            flat = a.ravel()
            self.meta["token_rms"] = float(
                np.sqrt(np.dot(flat, flat) / max(flat.size, 1))
            )
            tmp = os.path.join(self.dir, "meta.json.tmp")
            with open(tmp, "w") as f:
                json.dump(self.meta, f, indent=1)
            os.replace(tmp, os.path.join(self.dir, "meta.json"))
        return float(self.meta["token_rms"])

    def _load(self, i: int) -> np.ndarray:
        raw = np.load(self.shard_paths[i], mmap_mode="r")
        return _from_storage(raw, self.meta["dtype"])

    def _iter_shards(self, order, prefetch, dequant: bool = True
                     ) -> Iterator[tuple[int, np.ndarray]]:
        """Yield ``(shard_index, shard_array)`` in ``order``. Three engines:
        prefetch=False = synchronous memmap; True = Python-thread read-ahead;
        "native" = C++ ring-buffer reader (data/native_io.py; GIL-free pread loops,
        zero-copy views valid until the next shard). "native" falls back to True
        when no toolchain. Producer errors re-raise on the consumer; abandoning the
        generator releases the read-ahead thread (stop event).

        For int8 caches, ``dequant=True`` yields float32 shards (the per-shard
        multiply runs on the read-ahead thread where possible); ``dequant=False``
        yields the raw int8 shards — callers pair them with :meth:`scale` for
        on-device dequantization (train/steps.make_sae_train_multi_step_quant)."""
        host_dq = self.quantized and dequant

        if prefetch == "native":
            from sparse_vision_tpu.data import native_io

            if native_io.load_native() is not None:
                it = native_io.NativeShardIterator(
                    [self.shard_paths[i] for i in order]
                )
                for i, shard in zip(order, it):
                    shard = _from_storage(shard, self.meta["dtype"])
                    if host_dq:
                        shard = dequantize_int8(np.asarray(shard), self.scale(i))
                    yield int(i), shard
                return
            prefetch = True  # toolchain unavailable — degrade

        if not prefetch:
            for i in order:
                shard = self._load(i)
                if host_dq:
                    shard = dequantize_int8(np.asarray(shard), self.scale(i))
                yield int(i), shard
            return

        q: queue.Queue = queue.Queue(maxsize=1)
        stop = threading.Event()

        def producer():
            # Producer exceptions (truncated shard, ENOENT, ...) are enqueued and
            # RE-RAISED on the consumer — same contract as data/prefetch.py. Without
            # this the thread dies without the None sentinel and the consumer blocks
            # on q.get() forever. The stop event unblocks the producer when the
            # consumer abandons the generator early, so no thread is left parked on
            # q.put holding a full shard copy.
            def put(item) -> bool:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        return True
                    except queue.Full:
                        continue
                return False

            try:
                for i in order:
                    # np.array COPIES: faulting the mmap pages in on this thread is
                    # the whole point of the read-ahead (np.asarray would be a lazy
                    # view and all IO would land back on the consumer); the int8
                    # host-dequant multiply also lands here, off the consumer's
                    # critical path
                    shard = np.array(self._load(i))
                    if host_dq:
                        shard = dequantize_int8(shard, self.scale(i))
                    if not put((int(i), shard)):
                        return
            except BaseException as e:  # noqa: BLE001 — forwarded, not swallowed
                put(e)
            else:
                put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    t.join()
                    raise item
                yield item
            t.join()
        finally:
            stop.set()

    def batches(
        self, tokens_per_step: int, shuffle: bool = False, seed: int = 0,
        prefetch: bool | str = True, dequantize: str = "host",
    ) -> Iterator:
        """Yield [tokens_per_step, C] arrays; shards visited in (optionally shuffled)
        order, trailing partial steps dropped (drop_last semantics).

        shuffle randomizes BOTH the shard order and the step-block starting offsets
        within each shard; tokens inside one step stay contiguous (sequential IO).
        Residual correlation matches the reference's regime — its hook-mode batches
        are also all spatial tokens of a few consecutively-drawn images
        (utils.py:2448-2451). For fully decorrelated tokens, dump the cache from a
        shuffled image stream (dump_activations(..., shuffle_images=True)).

        int8 caches: ``dequantize="host"`` (default) yields float32 blocks —
        downstream code sees a normal cache; ``dequantize="device"`` yields
        ``(int8 block, scale [C])`` pairs so the jitted step dequantizes on device
        (half the host->device bytes of bfloat16)."""
        dev_q = self.quantized and dequantize == "device"
        rng = np.random.default_rng(seed)
        order = np.arange(len(self.shard_paths))
        if shuffle:
            rng.shuffle(order)
        for i, shard in self._iter_shards(order, prefetch, dequant=not dev_q):
            starts = np.arange(
                0, shard.shape[0] - tokens_per_step + 1, tokens_per_step
            )
            if shuffle:
                rng.shuffle(starts)
            for s in starts:
                blk = shard[s : s + tokens_per_step]
                yield (blk, self.scale(i)) if dev_q else blk

    def stacks(
        self, tokens_per_step: int, k: int, shuffle: bool = False, seed: int = 0,
        prefetch: bool | str = True, dequantize: str = "host",
    ) -> Iterator:
        """Yield [k', tokens_per_step, C] stacked microbatch blocks for the lax.scan
        multi-step dispatch (train/steps.make_sae_train_multi_step); the last stack
        of the epoch may have k' < k (the caller runs those rows single-step).

        When k*tokens_per_step divides the shard size, each full stack is a ZERO-COPY
        reshape of a contiguous shard slice — no np.stack assembly of k blocks on the
        consumer thread (at production shapes that copy is 10s-100s of MB per
        dispatch). Shuffle granularity is then the stack block rather than the step
        block (same shard-level randomization; tokens within a dispatch were already
        contiguous-correlated).

        int8 caches: ``dequantize="host"`` (default) yields float32 stacks;
        ``dequantize="device"`` yields ``(int8 stack, scale [C])`` pairs (the scale
        is per shard, so every stack — full or tail — stays within one shard and
        never mixes scales; requires the aligned shard layout the production dump
        guarantees, Pipeline._cache_dump_kwargs)."""
        dev_q = self.quantized and dequantize == "device"
        block = tokens_per_step * k
        shard_tokens = int(self.meta["shard_tokens"])
        if shard_tokens % block == 0:
            rng = np.random.default_rng(seed)
            order = np.arange(len(self.shard_paths))
            if shuffle:
                rng.shuffle(order)
            tail: list = []
            for i, shard in self._iter_shards(order, prefetch, dequant=not dev_q):
                scale = self.scale(i) if dev_q else None
                n_full = shard.shape[0] // block
                starts = np.arange(0, n_full * block, block)
                if shuffle:
                    rng.shuffle(starts)
                for s in starts:
                    stk = shard[s : s + block].reshape(k, tokens_per_step, -1)
                    yield (stk, scale) if dev_q else stk
                # leftover whole steps at the shard tail (short last shard)
                for s in range(n_full * block, shard.shape[0] - tokens_per_step + 1,
                               tokens_per_step):
                    # COPY: this buffer outlives the shard advance, and under the
                    # native reader shard views die at the next shard (np.asarray
                    # would keep a dangling ring-buffer view)
                    tail.append(np.array(shard[s : s + tokens_per_step]))
                    if len(tail) == k:
                        yield (np.stack(tail), scale) if dev_q else np.stack(tail)
                        tail = []
                if dev_q and tail:
                    # per-shard scales must not mix: flush the partial stack before
                    # the next shard
                    yield np.stack(tail), scale
                    tail = []
            if tail:
                yield np.stack(tail)
            return
        if dev_q:
            raise ValueError(
                "dequantize='device' needs shard_tokens to be a multiple of "
                f"k*tokens_per_step (shard {shard_tokens}, block {block}); the "
                "unaligned assembly crosses shard (and so scale) boundaries — "
                "use dequantize='host'"
            )
        # unaligned shard size: assemble stacks from step blocks
        buf: list = []
        for tok in self.batches(tokens_per_step, shuffle, seed, prefetch):
            buf.append(np.array(tok))  # copy: buffered across shard advances
            if len(buf) == k:
                yield np.stack(buf)
                buf = []
        if buf:
            yield np.stack(buf)
