"""Shared cache preparation for trainers that ZIP several aligned activation
caches (transcoders: 2, crosscoders: L) — sequential or dump/train-overlapped.

The overlap contract matches Pipeline.train_sae_cached's single-cache mode
(VERDICT r2 #6): when every requested cache is missing and
``cfg.overlap_dump_train`` is set, the one-pass multi-layer dump runs on a
background thread and the FIRST epoch consumes aligned shard tuples as their
atomic writes complete (data/activation_cache.stream_stacks_zip); later epochs
read the completed caches with the usual shuffle. On-disk bytes are identical
to the sequential mode's. When only SOME caches are missing, overlap is
skipped (a fresh stream cannot zip against an existing cache's shuffled
reader) and the missing ones dump sequentially.
"""

from __future__ import annotations

import os
from typing import Optional

from sparse_vision_tpu.data.activation_cache import (
    ActivationCache,
    dump_activations_multi,
    overlapped_multi_dump,
)


def open_validated(dirs: dict, layers: tuple) -> list[ActivationCache]:
    """Open every layer's cache and enforce IDENTICAL shard geometry. Token
    pairing depends on it, not just on counts: the shuffled iteration order is
    a function of shard count/size, so a cache inherited from a run with a
    different cache_tokens_per_step would zip tokens against the WRONG rows
    silently."""
    caches = [ActivationCache(dirs[layer]) for layer in layers]
    for field in ("total_tokens", "shard_tokens", "num_shards"):
        vals = [c.meta[field] for c in caches]
        if len(set(vals)) != 1:
            raise ValueError(
                f"Cache {field} differs across {layers}: {vals} — all layers "
                "must share spatial dims and all caches must come from the same "
                "dump geometry (delete stale ones to re-dump)"
            )
    return caches


def prepare_caches(pipe, layers: tuple, dirs: dict):
    """Dump whatever is missing and return ``(stream_qs, dump_thread, caches)``:
    ``stream_qs`` is a per-layer overlap-queue dict (None in sequential mode,
    where ``caches`` is the validated reader list instead; exactly one of the
    two is non-None). Callers in overlap mode must ``dump_thread.join()`` and
    :func:`open_validated` before the second epoch."""
    cfg = pipe.cfg
    missing = [l for l, d in dirs.items()
               if not os.path.exists(os.path.join(d, "meta.json"))]
    overlap = (
        cfg.overlap_dump_train
        and cfg.sae_epochs > cfg.sae_checkpoint_epoch
        and len(missing) == len(layers)
    )
    if overlap:
        print(f"Building aligned activation caches for {list(layers)} in one "
              "pass (overlapped) ...")
        qs, thread = overlapped_multi_dump(
            pipe.net, pipe.frozen_params, pipe.net_state, pipe.train_ds,
            list(layers), dirs, **pipe._cache_dump_kwargs(),
        )
        return qs, thread, None
    if missing:
        if cfg.overlap_dump_train:
            print(f"overlap_dump_train: caches partially exist — dumping "
                  f"{missing} sequentially (a fresh stream cannot zip against "
                  "an existing cache)")
        print(f"Building aligned activation caches for {missing} in one pass ...")
        dump_activations_multi(
            pipe.net, pipe.frozen_params, pipe.net_state, pipe.train_ds,
            missing, dirs, **pipe._cache_dump_kwargs(),
        )
    return None, None, open_validated(dirs, layers)


def epoch_stacks(pipe, layers: tuple, dirs: dict, epoch: int, start: int,
                 stream_qs: Optional[dict], dump_thread, caches):
    """Per-epoch aligned stack-tuple iterator + the (possibly just-opened)
    cache list. The streamed first epoch has no shard shuffle (dump order);
    later epochs zip the caches' shuffled readers under one seed — identical
    (tokens_per_step, k, shuffle seed, shard geometry) means the L iterators
    visit the same token rows in the same order."""
    from sparse_vision_tpu.data.activation_cache import stream_stacks_zip

    cfg = pipe.cfg
    tps = cfg.cache_tokens_per_step
    scan_k = pipe.CACHE_SCAN_K
    if stream_qs is not None and epoch == start:
        it = stream_stacks_zip(
            [stream_qs[l] for l in layers], tps, scan_k,
            logical_dtype=cfg.cache_dtype,
        )
        return it, caches
    if caches is None:  # dump finished during the streamed epoch
        dump_thread.join()
        caches = open_validated(dirs, layers)
    its = [c.stacks(tps, scan_k, shuffle=True, seed=cfg.seed + epoch)
           for c in caches]
    return zip(*its), caches
