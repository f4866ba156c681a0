"""Run orchestration: the TPU-native equivalent of the reference's ModelPipeline +
ExecuteProject (model_pipeline.py:24-1425, execute_project.py:8-235).

Five run modes, dispatched from RunConfig exactly like deploy_model
(model_pipeline.py:1288-1425):
  1. train original model      (original_model=True,  training=True)
  2. eval original model       (original_model=True,  training=False)
  3. train SAE                 (original_model=False, training=True)
  4. eval modified model       (original_model=False, training=False, mis="0")
  5. MIS collection            (mis="1": eval-style epoch on TRAIN data storing
                                per-unit max/min sample indices)
  (compute_ie != "0" dispatches to the circuit tier, interp/ie.py.)

Epoch loop parity (deploy_model:1306-1335): eval before the first train epoch, then
train/eval alternating; per-epoch checkpoint of {params, opt_state, step, dead_acc}
(model_pipeline.py:1266-1280); resume restores optimizer state and the train step
counter so the dead-neuron schedule continues (model_pipeline.py:234-263).

The reference's first-batch `break` debug leftover (model_pipeline.py:631-633) is NOT
replicated: epochs iterate all batches.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.data.datasets import load_data
from sparse_vision_tpu.data.prefetch import device_put_batch, prefetch
from sparse_vision_tpu.eval_tools import results as results_store
from sparse_vision_tpu.models.backbone import (
    get_sae_input_size,
    init_backbone,
    make_backbone,
)
from sparse_vision_tpu.models.sae import init_sae
from sparse_vision_tpu.ops import metrics, optim
from sparse_vision_tpu.ops.topk import init_topk, update_topk
from sparse_vision_tpu.parallel.mesh import data_sharding, make_mesh
from sparse_vision_tpu.train import checkpoint as ckpt
from sparse_vision_tpu.train.steps import (
    ModelTrainState,
    SAETrainState,
    init_sae_train_state,
    make_model_eval_step,
    make_model_train_step,
    make_sae_eval_step,
    make_sae_train_step,
)
from sparse_vision_tpu.ops.losses import get_criterion
from sparse_vision_tpu.utils.logging import RunLogger
from sparse_vision_tpu.utils.paths import folder_paths, run_id, sae_params_no_epochs


class Pipeline:
    def __init__(self, cfg: RunConfig, mesh=None, logger: Optional[RunLogger] = None,
                 datasets=None):
        """``datasets`` optionally injects an already-loaded
        ``(train_ds, val_ds, category_names, img_size)`` tuple so pipelines that
        differ only in SAE hyperparameters (train/sweep_vmap.py) or target layer
        (train/multilayer.py) share one dataset instance instead of re-reading it;
        dataset objects are read-only after construction (data/datasets.py)."""
        self.cfg = cfg
        self.validate_input_norm(cfg)
        self.paths = folder_paths(cfg)
        self.run_id = run_id(cfg)
        self.logger = logger or RunLogger(
            self.run_id, use_wandb=cfg.wandb_status, log_every=cfg.log_every,
            resume=cfg.sae_checkpoint_epoch > 0,
            # the full run config keys/filters the W&B run
            # (reference: execute_project.py:146-184 passes every parameter)
            config=json.loads(cfg.to_json()),
        )
        self.mesh = mesh if mesh is not None else (
            make_mesh(cfg.mesh_shape) if cfg.mesh_shape else None
        )
        self.batch_sharding = data_sharding(self.mesh) if self.mesh else None

        self.net = make_backbone(cfg.model_name, cfg.dataset_name)
        if datasets is not None:
            self.train_ds, self.val_ds, self.category_names, self.img_size = datasets
        else:
            self.train_ds, self.val_ds, self.category_names, self.img_size = load_data(
                cfg, class_filter=cfg.imagenet_class_filter or None
            )
        self.criterion = get_criterion(cfg.model_criterion_name)

        key = jax.random.key(cfg.seed)
        k_model, self.k_sae = jax.random.split(key)
        self.frozen_params, self.net_state = init_backbone(
            self.net, k_model, cfg.dataset_name
        )
        # frozen backbone weights: load the trained original model when available
        # (reference: load_pretrained_model, utils.py:197-225)
        model_ckpt_dir = self.paths["model_weights"]
        last = ckpt.latest_epoch(model_ckpt_dir)
        self._model_ckpt_epoch = last or 0
        if last is not None:
            restored = ckpt.load_checkpoint(
                model_ckpt_dir, last,
                like={"params": self.frozen_params, "net_state": self.net_state},
            )
            self.frozen_params = restored["params"]
            self.net_state = restored["net_state"]
            print(f"Loaded original-model weights from epoch {last}.")

        if cfg.use_sae:
            self.sae_input_size = get_sae_input_size(
                self.net, cfg.dataset_name, cfg.sae_layer
            )
            if cfg.sae_model_name == "transcoder":
                from sparse_vision_tpu.models.sae import init_transcoder

                if not cfg.transcoder_target_layer:
                    raise ValueError(
                        "sae_model_name='transcoder' needs transcoder_target_layer"
                    )
                self.transcoder_out_size = get_sae_input_size(
                    self.net, cfg.dataset_name, cfg.transcoder_target_layer
                )
                self.sae_params = init_transcoder(
                    self.k_sae, self.sae_input_size, cfg.sae_expansion_factor,
                    self.transcoder_out_size,
                )
            elif cfg.sae_model_name == "crosscoder":
                from sparse_vision_tpu.models.crosscoder import init_crosscoder

                extra = cfg.crosscoder_layer_list
                if not extra:
                    raise ValueError(
                        "sae_model_name='crosscoder' needs crosscoder_layers "
                        "(additional layers beyond sae_layer)"
                    )
                layers = (cfg.sae_layer, *extra)
                order = [self.net.stage_names.index(l) for l in layers]
                if order != sorted(order) or len(set(layers)) != len(layers):
                    raise ValueError(
                        f"crosscoder layers must be distinct and in network "
                        f"depth order with sae_layer shallowest (got {layers}; "
                        f"stage order: {self.net.stage_names})"
                    )
                self.crosscoder_all_layers = layers
                dims = tuple(
                    get_sae_input_size(self.net, cfg.dataset_name, l)
                    for l in layers
                )
                self.crosscoder_dims = dims
                self.sae_params = init_crosscoder(
                    self.k_sae, dims, cfg.sae_expansion_factor
                )
            else:
                self.sae_params = init_sae(
                    cfg.sae_model_name, self.k_sae, self.sae_input_size,
                    cfg.sae_expansion_factor,
                    jumprelu_threshold_init=cfg.jumprelu_threshold_init,
                )
            if cfg.sae_weights_path:
                # weight-only import: native .npz or reference-format torch .pth
                # (load_pretrained_model parity, utils.py:197-225)
                from sparse_vision_tpu.train.sae_io import import_any

                self.sae_params = import_any(
                    cfg.sae_weights_path, cfg.sae_model_name, like=self.sae_params
                )
                print(f"Initialized SAE weights from {cfg.sae_weights_path}.")
            self.num_units = self._num_latents()
            self.tx = optim.get_optimizer(cfg.sae_optimizer_name, cfg.sae_learning_rate)
            self.ts = init_sae_train_state(
                self.sae_params, self.tx, self.num_units, seed=cfg.seed
            )
            if cfg.sae_checkpoint_epoch > 0:
                self._restore_sae(cfg.sae_checkpoint_epoch)
        else:
            self.tx = optim.get_optimizer(
                cfg.model_optimizer_name, cfg.model_learning_rate
            )
            self.mts = ModelTrainState(
                params=self.frozen_params,
                net_state=self.net_state,
                opt_state=self.tx.init(self.frozen_params),
                step=jnp.zeros((), jnp.int32),
            )
            # original-model MIS/top-k: sae_layer may name a BACKBONE layer whose
            # channel-averaged activations get top-k collection (the reference
            # reuses the sae_layer parameter for this, specify_parameters.py:245-247;
            # collection rule model_pipeline.py:344-345). num_units = that layer's
            # channel count; 0 when sae_layer doesn't name a layer (e.g. 'None').
            try:
                self.num_units = get_sae_input_size(
                    self.net, cfg.dataset_name, cfg.sae_layer
                )
            except ValueError:
                self.num_units = 0

    # ------------------------------------------------------------------
    def _num_latents(self) -> int:
        return int(self.sae_input_size * self.cfg.sae_expansion_factor)

    def _sae_ckpt_dir(self) -> str:
        name = f"{self.cfg.sae_layer}_" + "_".join(
            str(v) for v in sae_params_no_epochs(self.cfg).values()
        )
        return os.path.join(self.paths["checkpoints"], name)

    def _restore_sae(self, epoch: int) -> None:
        like = {
            "params": self.ts.params,
            "opt_state": self.ts.opt_state,
            "step": self.ts.step,
            "dead_acc": self.ts.dead_acc,
        }
        restored = ckpt.load_checkpoint(self._sae_ckpt_dir(), epoch, like=like)
        self.ts = SAETrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"]),
            dead_acc=jnp.asarray(restored["dead_acc"]),
            rng=self.ts.rng,
        )
        print(f"Resumed SAE from checkpoint epoch {epoch} (train step {int(self.ts.step)}).")

    @staticmethod
    def validate_input_norm(cfg) -> None:
        """Pure-config part of the sae_input_norm contract — called from
        __init__ so misconfiguration fails BEFORE any dump thread starts
        (raising with a device-active daemon thread risks the tunnel wedge,
        train/crosscoder.py)."""
        if cfg.sae_input_norm == "none":
            return
        if cfg.sae_input_norm != "rms":
            raise ValueError(f"sae_input_norm must be 'none' or 'rms', got "
                             f"{cfg.sae_input_norm!r}")
        if not cfg.use_activation_cache:
            raise ValueError("sae_input_norm='rms' requires "
                             "use_activation_cache=True (the scale is a cache "
                             "statistic)")
        if cfg.overlap_dump_train:
            raise ValueError("sae_input_norm='rms' is incompatible with "
                             "overlap_dump_train (the scale is only known once "
                             "the dump finishes)")
        if cfg.sae_e2e_finetune_epochs > 0:
            raise ValueError("sae_input_norm='rms' does not support the e2e KL "
                             "finetune yet (its splice step is scale-unaware); "
                             "run the finetune on a sae_input_norm='none' run")

    def input_scale_for(self, layer: str):
        """The layer's input-normalization scale, or None when off.

        ``sae_input_norm="rms"``: the dictionary trains on ``x / token_rms`` of
        the layer's activation cache and the eval splice rescales the
        reconstruction back (config.py rationale: vision tap scales span orders
        of magnitude across layers, so lambda/lr recipes only transfer on a
        normalized basis). The scale is a CACHE statistic — deterministic given
        the dump — so checkpoints/resume need no extra state."""
        cfg = self.cfg
        if cfg.sae_input_norm == "none":
            return None
        self.validate_input_norm(cfg)
        if not hasattr(self, "_input_scales"):
            self._input_scales = {}
        if layer not in self._input_scales:
            from sparse_vision_tpu.data.activation_cache import ActivationCache

            cache_dir = self._cache_dir(layer)
            if not os.path.exists(os.path.join(cache_dir, "meta.json")):
                raise ValueError(
                    f"sae_input_norm='rms' needs the {layer} activation cache "
                    f"at {cache_dir} (train first, or dump the cache)")
            self._input_scales[layer] = ActivationCache(cache_dir).token_rms
        return self._input_scales[layer]

    def _recalibrate_batch_topk(self, cache, tps: int) -> None:
        """Replace the EMA-estimated batch-topk inference threshold with the
        paper's deployment conversion at the CONVERGED params: the T*k-th
        largest pre-activation over one cached token block
        (models/sae.calibrate_batch_topk_threshold)."""
        from sparse_vision_tpu.models.sae import calibrate_batch_topk_threshold

        tok = next(iter(cache.batches(
            tps, shuffle=True, seed=self.cfg.seed + 7919, prefetch=False
        )))
        if isinstance(tok, tuple):  # int8 device-dequant pairs never reach here
            tok = tok[0]
        tok = np.asarray(tok, np.float32)
        scale = self.input_scale_for(self.cfg.sae_layer)
        if scale is not None:  # threshold lives in the normalized space
            tok = tok / np.float32(scale)
        tok = jnp.asarray(tok)
        thr = calibrate_batch_topk_threshold(self.ts.params, tok, self.cfg.sae_topk)
        old = float(jax.device_get(self.ts.params["threshold"]))
        self.ts = self.ts._replace(
            params={**self.ts.params, "threshold": thr}
        )
        print(f"[batch_topk] inference threshold calibrated: "
              f"{old:.5g} (EMA) -> {float(jax.device_get(thr)):.5g}")

    def _put(self, batch):
        return device_put_batch(batch, self.batch_sharding)

    def _batches(self, ds, batch_size: int, shuffle: bool, seed: int = 0):
        """Decode-parallel host batches, staged onto the device(s) one step ahead
        (data/prefetch.py double-buffering; decode worker pool per cfg.data_workers)."""
        it = ds.batches(
            batch_size, shuffle=shuffle, seed=seed, workers=self.cfg.data_workers
        )
        return prefetch(it, self.batch_sharding)

    # ------------------------------------------------------------------
    # mode dispatch (deploy_model, model_pipeline.py:1288-1425)
    # ------------------------------------------------------------------
    def run(self):
        cfg = self.cfg
        if cfg.original_model and cfg.compute_ie != "0":
            # reference guard (specify_parameters.py:229-230): IE runs on a frozen
            # SAE only. MIS on the original model IS supported — the reference's
            # control experiment (sae_layer names a backbone layer,
            # specify_parameters.py:245-247) that produced the original-mixed3a
            # MIS anchors (visualize_mis.py:24, 119-120).
            raise ValueError(
                "IE can only be computed for the SAE model, not the original model "
                "(original_model=False)."
            )
        if cfg.original_model and cfg.mis != "0" and self.num_units == 0:
            raise ValueError(
                f"Original-model MIS needs sae_layer to name a backbone layer "
                f"(got {cfg.sae_layer!r}; available: {self.net.stage_names})."
            )
        if cfg.compute_ie != "0":
            from sparse_vision_tpu.interp.ie import run_ie

            return run_ie(self, cfg.compute_ie)
        if cfg.mis == "1":
            return self.mis_epoch()
        if cfg.mis == "2":
            from sparse_vision_tpu.interp.mis import compute_mis_for_run

            return compute_mis_for_run(self)
        if cfg.use_sae and cfg.training:
            return self.train_sae()
        if cfg.use_sae:
            # a standalone eval is its own last epoch: the reference sets
            # record_top_samples there (model_pipeline.py:529-533)
            return self.eval_modified(epoch=cfg.sae_checkpoint_epoch, final=True)
        if cfg.training:
            return self.train_original()
        # standalone original eval: when sae_layer names a backbone layer this is
        # its own last epoch, with top-k collection + the figure set over that
        # layer's channels (record_top_samples semantics, model_pipeline.py:529-533)
        collect = self.num_units > 0 and cfg.sae_layer not in ("", "None")
        return self.eval_original(collect_topk=collect, final=collect)

    # ------------------------------------------------------------------
    # SAE training (mode 3)
    # ------------------------------------------------------------------
    def train_sae(self):
        if self.cfg.sae_model_name == "transcoder":
            from sparse_vision_tpu.train.transcoder import train_transcoder_cached

            return train_transcoder_cached(self)
        if self.cfg.sae_model_name == "crosscoder":
            from sparse_vision_tpu.train.crosscoder import train_crosscoder_cached

            return train_crosscoder_cached(self)
        if self.cfg.use_activation_cache:
            return self.train_sae_cached()
        cfg = self.cfg
        step_fn = make_sae_train_step(
            self.net, cfg.sae_layer, cfg.sae_model_name, cfg.sae_lambda_sparse,
            self.tx, cfg.dead_neurons_steps, cfg.sae_expansion_factor, self.criterion,
            topk=cfg.sae_topk, topk_approx=cfg.sae_topk_approx,
            jumprelu_bandwidth=cfg.jumprelu_bandwidth,
            matryoshka_prefixes=cfg.matryoshka_prefix_fractions,
            aux_k=cfg.sae_aux_k, aux_alpha=cfg.sae_aux_alpha,
        )
        from sparse_vision_tpu.utils.profiling import maybe_profile

        start = cfg.sae_checkpoint_epoch
        last_eval = None
        self.eval_modified(epoch=start, store=False)  # pre-training eval (deploy:1315-1320)
        for epoch in range(start, cfg.sae_epochs):
            with maybe_profile(cfg.profile_dir or None):
                for b in self._batches(
                    self.train_ds, cfg.sae_batch_size, shuffle=True, seed=cfg.seed + epoch
                ):
                    self.ts, m = step_fn(
                        self.ts, self.frozen_params, self.net_state, b.images, b.labels
                    )
                    self.logger.log_train(int(self.ts.step), m)
            # async save: serialization overlaps the next epoch's compute
            ckpt.save_checkpoint(
                self._sae_ckpt_dir(), epoch + 1,
                {
                    "params": self.ts.params,
                    "opt_state": self.ts.opt_state,
                    "step": self.ts.step,
                    "dead_acc": self.ts.dead_acc,
                },
                blocking=False,
            )
            last_eval = self.eval_modified(
                epoch=epoch + 1, final=(epoch + 1 == cfg.sae_epochs)
            )
        ckpt.wait_for_saves()
        self._export_sae_weights()
        if cfg.sae_e2e_finetune_epochs > 0:
            from sparse_vision_tpu.train.e2e_finetune import e2e_finetune

            last_eval = e2e_finetune(self) or last_eval
        return last_eval

    # ------------------------------------------------------------------
    # SAE training from the activation cache (production ImageNet path: tap the
    # frozen backbone ONCE, then train at memory bandwidth; the reference recomputes
    # the backbone inside a hook every step and abandoned its HDF5 cache attempt)
    # ------------------------------------------------------------------
    # steps per lax.scan dispatch in the cached path: amortizes host-dispatch
    # latency; cache shards are sized to a multiple of scan_k*tokens_per_step so
    # training reads zero-copy stacks
    CACHE_SCAN_K = 8

    def _cache_dir(self, layer: str) -> str:
        """Per-layer activation-cache directory. Lives under evaluation_results,
        which depends only on (directory_path, model, dataset, sae_model_name) —
        NOT on the SAE hyperparameters — so every run on this backbone shares one
        cache per layer (and the multi-layer dump fills them all in one pass,
        train/multilayer.py)."""
        return os.path.join(
            self.paths["evaluation_results"], "activation_cache", layer
        )

    def _cache_dump_kwargs(self) -> dict:
        """Dump arguments shared by train_sae_cached and the multi-layer dump —
        one definition so a multi-dumped cache is byte-identical to the one this
        pipeline would have built itself."""
        cfg = self.cfg
        scan_k = self.CACHE_SCAN_K
        return dict(
            batch_size=cfg.sae_batch_size,
            workers=cfg.data_workers,
            dtype=(cfg.cache_dtype if cfg.cache_dtype in ("bfloat16", "int8")
                   else np.float32),
            # shards sized to a MULTIPLE of the scan dispatch block so
            # training reads zero-copy stacks (stacks alignment rule holds for
            # any cache_tokens_per_step, not just power-of-two ones)
            shard_tokens=(scan_k * cfg.cache_tokens_per_step)
            * max(1, -(-(1 << 16) // (scan_k * cfg.cache_tokens_per_step))),
            # multi-chip: the tap pass shards images over the 'data' axis
            sharding=self.batch_sharding,
        )

    def train_sae_cached(self):
        from sparse_vision_tpu.data.activation_cache import (
            ActivationCache,
            dump_activations,
        )
        from sparse_vision_tpu.train.steps import make_sae_train_step_from_acts
        from sparse_vision_tpu.utils.profiling import maybe_profile

        cfg = self.cfg
        scan_k = self.CACHE_SCAN_K
        cache_dir = self._cache_dir(cfg.sae_layer)
        dump_kwargs = self._cache_dump_kwargs()
        stream_q = None  # non-None -> the FIRST epoch consumes shards as they land
        dump_thread = None
        if not os.path.exists(os.path.join(cache_dir, "meta.json")):
            from sparse_vision_tpu.data.activation_cache import validate_sharded_batch

            # fail fast HERE: in overlap mode a dump-thread raise would only
            # surface after the pre-training eval consumed the stream
            validate_sharded_batch(cfg.sae_batch_size, self.batch_sharding)
            if cfg.overlap_dump_train and cfg.sae_epochs > cfg.sae_checkpoint_epoch:
                # dump/train overlap: the dump runs on a background thread and
                # publishes each shard path as its atomic write completes; epoch 0
                # trains from those shards in dump order (stream_stacks). The
                # on-disk cache is byte-identical to the sequential mode's.
                import queue as _queue
                import threading as _threading

                print(f"Building activation cache at {cache_dir} (overlapped) ...")
                stream_q = _queue.Queue()

                def _dump_producer(q=stream_q):
                    try:
                        dump_activations(
                            self.net, self.frozen_params, self.net_state,
                            self.train_ds, cfg.sae_layer, cache_dir,
                            shard_queue=q, **dump_kwargs,
                        )
                        q.put(None)
                    except BaseException as e:  # forwarded to the training loop
                        q.put(e)

                dump_thread = _threading.Thread(target=_dump_producer, daemon=True)
                dump_thread.start()
            else:
                print(f"Building activation cache at {cache_dir} ...")
                dump_activations(
                    self.net, self.frozen_params, self.net_state, self.train_ds,
                    cfg.sae_layer, cache_dir, **dump_kwargs,
                )
        cache = None if stream_q is not None else ActivationCache(cache_dir)
        tps = cfg.cache_tokens_per_step
        from sparse_vision_tpu.ops.fused_sae import can_fuse

        # multi-chip: tokens shard over the mesh 'data' axis, the fused kernel runs
        # per chip on its local [tps/n_data, C] shard, grads/metrics pmean over ICI
        # (parallel/sharded_steps.py; single-device parity: tests/test_sharded_fused.py)
        mesh = self.mesh
        n_data = int(mesh.shape["data"]) if mesh is not None else 1
        sharded = mesh is not None and int(np.prod(list(mesh.shape.values()))) > 1
        if sharded and tps % n_data:
            raise ValueError(
                f"cache_tokens_per_step={tps} not divisible by data mesh axis {n_data}"
            )
        local_t = tps // n_data
        tile_t = 1024 if cfg.sae_model_name == "gated_sae" else 2048
        from sparse_vision_tpu.models.sae import matryoshka_prefix_counts
        from sparse_vision_tpu.ops.fused_matryoshka_sae import can_fuse_matryoshka

        fused = (
            cfg.use_pallas
            and jax.default_backend() != "cpu"
            and (
                # TopK's fast path is gather-based stock XLA (ops/fast_topk_sae.py)
                # — no Pallas tile constraint; BatchTopK's is the radix-bisection
                # cutoff (ops/fast_batch_topk.py), equally tile-free
                cfg.sae_model_name in ("topk_sae", "batch_topk_sae")
                or (
                    cfg.sae_model_name in ("sae_mlp", "gated_sae", "jumprelu_sae")
                    and can_fuse(local_t, self.num_units, tile_t=tile_t)
                )
                or (
                    # matryoshka additionally needs the latent tile to divide every
                    # prefix boundary (ops/fused_matryoshka_sae.py docstring)
                    cfg.sae_model_name == "matryoshka_sae"
                    and can_fuse_matryoshka(
                        local_t, self.num_units,
                        matryoshka_prefix_counts(
                            self.num_units, cfg.matryoshka_prefix_fractions),
                        tile_t=tile_t,
                    )
                )
            )
        )
        # kernel matmul dtype from the config (kernels accumulate in f32 either
        # way); built unconditionally — the TP fused gate below is independent of
        # the DP `fused` flag and must not inherit its condition
        fused_opts = {
            "compute_dtype": jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
            else jnp.float32
        }
        if cfg.sae_model_name == "jumprelu_sae":
            # the STE bandwidth reaches the fused kernels (single-chip, shard_map,
            # and TP) through the shared kernel-options dict
            fused_opts["bandwidth"] = cfg.jumprelu_bandwidth
        from sparse_vision_tpu.train.steps import make_sae_train_multi_step

        tensor_parallel = (
            mesh is not None and "model" in mesh.axis_names
            and int(mesh.shape["model"]) > 1
        )
        if tensor_parallel:
            # 2-D (data, model) mesh: latent dim shards over 'model'. Two engines:
            # the FUSED Pallas step under explicit shard_map (ops/fused_sae_tp.py —
            # the production path for >=16k latents, where the fused kernel's HBM
            # savings matter most) when the local shard shapes tile; otherwise
            # GSPMD placement of the stock jitted step. Parity for both:
            # tests/test_tensor_parallel.py.
            from sparse_vision_tpu.parallel.tensor_parallel import (
                make_tp_fused_train_step,
                put_tokens_tp,
                put_tp_state,
            )

            n_model = int(mesh.shape["model"])
            self.ts = put_tp_state(mesh, self.ts)
            from sparse_vision_tpu.ops.fused_sae_tp import can_fuse_matryoshka_tp

            tp_fused = (
                cfg.use_pallas
                and jax.default_backend() != "cpu"
                and self.num_units % n_model == 0
                # AuxK is wired into the stock + shard_map steps only; a TopK run
                # with sae_aux_k under TP falls back to the GSPMD-placed stock
                # step (correct, modestly slower) rather than silently dropping
                # the aux loss
                and not (cfg.sae_aux_k > 0
                         and cfg.sae_model_name in ("topk_sae", "batch_topk_sae"))
                and (
                    (
                        cfg.sae_model_name
                        in ("sae_mlp", "gated_sae", "jumprelu_sae")
                        and can_fuse(
                            local_t, self.num_units // n_model, tile_t=tile_t
                        )
                    )
                    or (
                        cfg.sae_model_name == "matryoshka_sae"
                        and can_fuse_matryoshka_tp(
                            local_t,
                            matryoshka_prefix_counts(
                                self.num_units, cfg.matryoshka_prefix_fractions),
                            n_model, tile_t=tile_t,
                        )
                    )
                    or (
                        # two-stage distributed selection (ops/fast_topk_sae.py)
                        # needs the local shard to cover k candidates
                        cfg.sae_model_name == "topk_sae"
                        and cfg.sae_topk <= self.num_units // n_model
                    )
                )
            )
            if tp_fused:
                step_fn = make_tp_fused_train_step(
                    mesh, self.ts, cfg.sae_lambda_sparse, self.tx,
                    cfg.dead_neurons_steps, cfg.sae_expansion_factor,
                    fused_opts=fused_opts, sae_model_name=cfg.sae_model_name,
                    matryoshka_prefixes=cfg.matryoshka_prefix_fractions,
                    topk=cfg.sae_topk, topk_approx=cfg.sae_topk_approx,
                )
            else:
                step_fn = make_sae_train_step_from_acts(
                    cfg.sae_model_name, cfg.sae_lambda_sparse, self.tx,
                    cfg.dead_neurons_steps, cfg.sae_expansion_factor, fused=False,
                    topk=cfg.sae_topk, topk_approx=cfg.sae_topk_approx,
                    jumprelu_bandwidth=cfg.jumprelu_bandwidth,
                    matryoshka_prefixes=cfg.matryoshka_prefix_fractions,
                    aux_k=cfg.sae_aux_k, aux_alpha=cfg.sae_aux_alpha,
                )

            def _put_tokens(arr, token_axis):
                return put_tokens_tp(mesh, np.ascontiguousarray(arr), token_axis)
        elif sharded:
            from sparse_vision_tpu.parallel.sharded_steps import (
                make_sharded_fused_train_step,
                put_replicated_state,
                put_tokens_sharded,
            )

            step_fn = make_sharded_fused_train_step(
                mesh, cfg.sae_lambda_sparse, self.tx, cfg.dead_neurons_steps,
                cfg.sae_expansion_factor, fused=fused, fused_opts=fused_opts,
                sae_model_name=cfg.sae_model_name, topk=cfg.sae_topk, topk_approx=cfg.sae_topk_approx,
                jumprelu_bandwidth=cfg.jumprelu_bandwidth,
                matryoshka_prefixes=cfg.matryoshka_prefix_fractions,
                aux_k=cfg.sae_aux_k, aux_alpha=cfg.sae_aux_alpha,
            )
            self.ts = put_replicated_state(mesh, self.ts)

            def _put_tokens(arr, token_axis):
                return put_tokens_sharded(mesh, np.ascontiguousarray(arr), token_axis)
        else:
            step_fn = make_sae_train_step_from_acts(
                cfg.sae_model_name, cfg.sae_lambda_sparse, self.tx,
                cfg.dead_neurons_steps, cfg.sae_expansion_factor, fused=fused,
                fused_opts=fused_opts, topk=cfg.sae_topk, topk_approx=cfg.sae_topk_approx,
                jumprelu_bandwidth=cfg.jumprelu_bandwidth,
                matryoshka_prefixes=cfg.matryoshka_prefix_fractions,
                aux_k=cfg.sae_aux_k, aux_alpha=cfg.sae_aux_alpha,
            )

            def _put_tokens(arr, token_axis):
                return jnp.asarray(arr)

        input_scale = self.input_scale_for(cfg.sae_layer)
        if input_scale is not None:
            # sae_input_norm="rms": the dictionary trains on x / token_rms; the
            # multiply composes with every engine above ((ts, act)-shaped) and
            # with the int8 device-dequant wrappers built from this step below
            _base_step = step_fn
            _inv = float(1.0 / input_scale)

            @jax.jit
            def step_fn(ts, act):
                return _base_step(ts, act.astype(jnp.float32) * _inv)

        multi_fn = make_sae_train_multi_step(step_fn)
        # int8 cache: blocks arrive as (int8, scale) pairs and dequantize ON DEVICE
        # (half the host->device bytes of bf16); the overlapped first epoch's
        # stream_stacks host-dequants instead (it is dump-bound anyway), so both
        # quantized iterators coexist with the float multi_fn above
        from sparse_vision_tpu.train.steps import (
            make_dequant_step_fn,
            make_sae_train_multi_step_quant,
        )

        step_fn_q = make_dequant_step_fn(step_fn)
        multi_fn_q = make_sae_train_multi_step_quant(step_fn)
        if self.batch_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            _scale_sharding = NamedSharding(self.mesh, PartitionSpec())

            def _put_scale(scale):
                return jax.device_put(np.asarray(scale), _scale_sharding)
        else:
            def _put_scale(scale):
                return jnp.asarray(scale)

        start = cfg.sae_checkpoint_epoch
        last_eval = None
        self.eval_modified(epoch=start, store=False)
        for epoch in range(start, cfg.sae_epochs):
            if stream_q is not None and epoch == start:
                # overlapped first epoch: consume shards as the dump publishes them
                from sparse_vision_tpu.data.activation_cache import stream_stacks

                stacks_it = stream_stacks(
                    stream_q, tps, scan_k, logical_dtype=cfg.cache_dtype
                )
            else:
                if cache is None:  # dump finished during the streamed epoch
                    dump_thread.join()
                    cache = ActivationCache(cache_dir)
                # device dequant needs stack-aligned shards (scales are per
                # shard); a shared int8 cache dumped under a DIFFERENT
                # tokens-per-step geometry falls back to host dequant
                aligned = int(cache.meta["shard_tokens"]) % (scan_k * tps) == 0
                stacks_it = cache.stacks(
                    tps, scan_k, shuffle=True, seed=cfg.seed + epoch,
                    dequantize="device" if aligned else "host",
                )
            with maybe_profile(cfg.profile_dir or None):
                # stacks are zero-copy shard views when scan_k*tps divides the
                # shard size (ActivationCache.stacks) — no per-dispatch np.stack
                for item in stacks_it:
                    if isinstance(item, tuple):  # int8 device-dequant path
                        stack_arr, scale = item
                        scale = _put_scale(scale)
                        if stack_arr.shape[0] == scan_k:
                            self.ts, ms = multi_fn_q(
                                self.ts, _put_tokens(np.asarray(stack_arr), 1), scale
                            )
                            self.logger.log_train(
                                int(self.ts.step), {k: v[-1] for k, v in ms.items()}
                            )
                        else:
                            for tok in stack_arr:
                                self.ts, m = step_fn_q(
                                    self.ts, _put_tokens(tok, 0), scale
                                )
                                self.logger.log_train(int(self.ts.step), m)
                    elif item.shape[0] == scan_k:
                        self.ts, ms = multi_fn(
                            self.ts, _put_tokens(np.asarray(item), 1)
                        )
                        self.logger.log_train(
                            int(self.ts.step), {k: v[-1] for k, v in ms.items()}
                        )
                    else:  # tail (< scan_k steps) runs single-step
                        for tok in item:
                            self.ts, m = step_fn(self.ts, _put_tokens(tok, 0))
                            self.logger.log_train(int(self.ts.step), m)
            if (cfg.sae_model_name == "batch_topk_sae"
                    and epoch + 1 == cfg.sae_epochs):
                # final-params threshold calibration (models/sae.
                # calibrate_batch_topk_threshold): the train-time EMA lags the
                # converged cutoff, inflating deployment L0 — recompute on one
                # cached block BEFORE the final checkpoint/eval so both carry it
                if cache is None:  # single overlapped epoch: dump just finished
                    dump_thread.join()
                    cache = ActivationCache(cache_dir)
                self._recalibrate_batch_topk(cache, tps)
            # async save: serialization overlaps the next epoch's compute
            ckpt.save_checkpoint(
                self._sae_ckpt_dir(), epoch + 1,
                {
                    "params": self.ts.params,
                    "opt_state": self.ts.opt_state,
                    "step": self.ts.step,
                    "dead_acc": self.ts.dead_acc,
                },
                blocking=False,
            )
            last_eval = self.eval_modified(
                epoch=epoch + 1, final=(epoch + 1 == cfg.sae_epochs)
            )
        ckpt.wait_for_saves()
        self._export_sae_weights()
        if cfg.sae_e2e_finetune_epochs > 0:
            from sparse_vision_tpu.train.e2e_finetune import e2e_finetune

            last_eval = e2e_finetune(self) or last_eval
        return last_eval

    # ------------------------------------------------------------------
    def _export_sae_weights(self) -> None:
        """Weight-only export to the path scheme's sae_weights folder after training
        (save_model_weights parity, utils.py:187-195): the native .npz plus a torch
        .pth in the reference's nn.Linear key layout so these SAEs load straight into
        the reference codebase."""
        from sparse_vision_tpu.train.sae_io import save_sae_weights, to_torch_state_dict

        name = f"{self.cfg.sae_layer}_" + "_".join(
            str(v) for v in sae_params_no_epochs(self.cfg).values()
        )
        folder = self.paths["sae_weights"]
        params = self.ts.params
        if self.cfg.sae_input_norm != "none":
            # the dictionary operates on x / token_rms — persist the scale(s)
            # alongside the weights so any consumer can reproduce the splice
            if self.cfg.sae_model_name == "crosscoder":
                scales = [self.input_scale_for(l)
                          for l in self.crosscoder_all_layers]
            elif self.cfg.sae_model_name == "transcoder":
                scales = [self.input_scale_for(self.cfg.sae_layer),
                          self.input_scale_for(self.cfg.transcoder_target_layer)]
            else:
                scales = [self.input_scale_for(self.cfg.sae_layer)]
            params = {**params,
                      "input_scale": jnp.asarray(scales, jnp.float32)}
        path = save_sae_weights(params, folder, file_name=f"{name}_model_weights")
        try:
            import torch

            sd = {
                k: torch.from_numpy(np.array(v))  # copy: jax buffers are read-only
                for k, v in to_torch_state_dict(
                    self.ts.params, self.cfg.sae_model_name
                ).items()
            }
            torch.save(sd, os.path.join(folder, f"{name}_model_weights.pth"))
        except Exception as e:  # torch export is a courtesy, never fails the run
            print(f"[sae_io] torch export skipped: {e}")
        print(f"Saved SAE weights to {path}")

    # ------------------------------------------------------------------
    # modified-model eval (mode 4) — also the per-epoch eval during training
    # ------------------------------------------------------------------
    @property
    def _sae_eval_step_fn(self):
        # built once: a fresh @jax.jit closure per eval call would recompile the whole
        # spliced-backbone graph every epoch
        if not hasattr(self, "_sae_eval_step_cache"):
            cfg = self.cfg
            if cfg.sae_model_name == "transcoder":
                from sparse_vision_tpu.train.transcoder import (
                    make_transcoder_eval_step,
                )

                tc_scales = None
                if cfg.sae_input_norm != "none":
                    tc_scales = (
                        self.input_scale_for(cfg.sae_layer),
                        self.input_scale_for(cfg.transcoder_target_layer),
                    )
                self._sae_eval_step_cache = make_transcoder_eval_step(
                    self.net, cfg.sae_layer, cfg.transcoder_target_layer,
                    cfg.sae_lambda_sparse, cfg.sae_expansion_factor,
                    self.criterion, input_scales=tc_scales,
                )
                return self._sae_eval_step_cache
            if cfg.sae_model_name == "crosscoder":
                from sparse_vision_tpu.train.crosscoder import (
                    make_crosscoder_eval_step,
                )

                cc_scales = None
                if cfg.sae_input_norm != "none":
                    cc_scales = tuple(
                        self.input_scale_for(l)
                        for l in self.crosscoder_all_layers
                    )
                self._sae_eval_step_cache = make_crosscoder_eval_step(
                    self.net, self.crosscoder_all_layers,
                    cfg.sae_lambda_sparse, cfg.sae_expansion_factor,
                    self.criterion, input_scales=cc_scales,
                )
                return self._sae_eval_step_cache
            self._sae_eval_step_cache = make_sae_eval_step(
                self.net, cfg.sae_layer, cfg.sae_model_name, cfg.sae_lambda_sparse,
                cfg.sae_expansion_factor, self.criterion, topk=cfg.sae_topk, topk_approx=cfg.sae_topk_approx,
                jumprelu_bandwidth=cfg.jumprelu_bandwidth,
                matryoshka_prefixes=cfg.matryoshka_prefix_fractions,
                input_scale=self.input_scale_for(cfg.sae_layer),
            )
        return self._sae_eval_step_cache

    @property
    def _model_eval_step_fn(self):
        if not hasattr(self, "_model_eval_step_cache"):
            self._model_eval_step_cache = make_model_eval_step(self.net, self.criterion)
        return self._model_eval_step_cache

    def eval_modified(self, epoch: int, store: bool = True, on_train_data: bool = False,
                      k: int = 25, final: bool = False):
        cfg = self.cfg
        step_fn = self._sae_eval_step_fn
        ds = self.train_ds if on_train_data else self.val_ds
        # everything accumulates ON DEVICE; the single host readback happens once per
        # epoch after the batch loop (a per-batch float() would sync ~13 scalars every
        # step and stall the prefetch pipeline)
        sums = None  # pytree of metric sums
        freq_sum = None  # [U] sum of per-batch activation frequencies
        correct = None
        dead_acc = None
        top_state = init_topk(k, self.num_units, largest=True)
        small_state = init_topk(k, self.num_units, largest=False)
        num_batches = 0
        bs = cfg.eval_batch_size or self._auto_eval_batch_size()
        for b in self._batches(ds, bs, shuffle=False):
            m, arrays = step_fn(
                self.ts.params, self.frozen_params, self.net_state, b.images, b.labels
            )
            num_batches += 1
            sums = m if sums is None else jax.tree.map(jnp.add, sums, m)
            freq_sum = arrays["freq"] if freq_sum is None else freq_sum + arrays["freq"]
            correct = arrays["correct"] if correct is None else correct + arrays["correct"]
            dead_acc = metrics.update_dead_accumulator(dead_acc, arrays["dead"])
            start_idx = jnp.int32((num_batches - 1) * bs)
            top_state = update_topk(top_state, arrays["topk_acts"], start_idx, b.indices)
            small_state = update_topk(small_state, arrays["topk_acts"], start_idx, b.indices)
        if num_batches == 0:
            raise ValueError("Empty evaluation dataset")
        host = jax.device_get(
            {"sums": sums, "freq_sum": freq_sum, "correct": correct,
             "dead_acc": dead_acc, "top": top_state, "small": small_state}
        )
        dead_acc, top_state, small_state = host["dead_acc"], host["top"], host["small"]
        means = {key: float(v) / num_batches for key, v in host["sums"].items()}
        # exact accuracy, like the reference (:669-672, 997)
        means["accuracy"] = int(host["correct"]) / (num_batches * bs)
        means["perc_dead_units"] = float(np.sum(dead_acc) / dead_acc.shape[0])
        self.logger.log_eval(epoch, means)

        # per-batch-mean activation FREQUENCY per unit (model_pipeline.py:815-818, 1007)
        freq = np.asarray(host["freq_sum"], np.float64) / num_batches
        self._channel_frequency_figure(freq, epoch)
        if final:
            self._final_eval_figures(ds, top_state, small_state, dead_acc, epoch)

        # per-unit max/min sample indices for MIS (model_pipeline.py:948-961)
        fn_dir = os.path.join(self.paths["evaluation_results"], "filename_indices")
        os.makedirs(fn_dir, exist_ok=True)
        np.savez(
            os.path.join(fn_dir, f"{self.run_id}_epoch_{epoch}.npz"),
            max_filename_indices=np.asarray(top_state.filename_indices),
            min_filename_indices=np.asarray(small_state.filename_indices),
            dead_units=np.asarray(dead_acc),
            # per-unit activation frequency (batch-mean), persisted for the
            # HTML feature report (eval_tools/report.py) — the reference only
            # renders it into the histogram figure
            activity_freq=freq.astype(np.float32),
        )

        if store:
            row = {
                "lambda_sparse": cfg.sae_lambda_sparse,
                "expansion_factor": cfg.sae_expansion_factor,
                "batch_size": cfg.sae_batch_size,
                "optimizer_name": cfg.sae_optimizer_name,
                "learning_rate": cfg.sae_learning_rate,
                "rec_loss": means.get("sae_rec_loss"),
                "l1_loss": means.get("sae_l1_loss"),
                "nrmse_loss": means.get("sae_nrmse_loss"),
                "rmse_loss": means.get("sae_rmse_loss"),
                "aux_loss": means.get("sae_aux_loss"),
                "rel_sparsity": means.get("sparsity"),
                "var_expl": means.get("var_expl"),
                "perc_dead_units": means.get("perc_dead_units"),
                "loss_diff": means.get("loss_diff"),
                "median_mis": None,
                "epochs": epoch,
            }
            folder = self.paths["evaluation_results"]
            results_store.store_run_result(folder, f"{self.run_id}_epoch_{epoch}", row)
            results_store.merge_results(folder)
        return means

    def _auto_eval_batch_size(self) -> int:
        """sae_batch_size, clamped so the stock eval step's [B*H*W, latents] f32
        intermediate stays under ~2 GB — at 16k latents a 256-image conv batch would
        need ~13 GB of HBM just for that matrix. Explicit cfg.eval_batch_size wins."""
        from sparse_vision_tpu.models.backbone import layer_dimensions

        bs = self.cfg.sae_batch_size
        try:
            shape = layer_dimensions(self.net, self.cfg.dataset_name)[self.cfg.sae_layer]
        except Exception:
            return bs
        tokens_per_image = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
        budget = 2 << 30  # bytes for the [B*H*W, latents] f32 block
        max_bs = max(1, budget // max(tokens_per_image * self.num_units * 4, 1))
        if max_bs < bs:
            bs = int(max_bs)
            if not getattr(self, "_eval_bs_warned", False):
                self._eval_bs_warned = True
                print(
                    f"[eval] batch size clamped to {bs} "
                    f"({tokens_per_image} tokens/image x {self.num_units} latents); "
                    "set eval_batch_size to override"
                )
        return bs

    # ------------------------------------------------------------------
    # eval-epoch figures (reference model_pipeline.py:1046-1068, utils.py:1496-1784,
    # 1934-1994 — rendered per eval epoch / in the final epoch, logged to W&B)
    # ------------------------------------------------------------------
    def _channel_frequency_figure(self, freq: np.ndarray, epoch: int,
                                  model_key: str = "sae") -> None:
        """Histogram of per-unit activation FREQUENCY (how often each channel is
        active), the reference's live per-eval-epoch figure (model_pipeline.py:1046-1068):
        non-zero frequencies in 40 bins over [0, 1], never-active units as a red bar."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            zero = freq[freq == 0]
            nonzero = freq[freq != 0]
            fig, ax = plt.subplots(figsize=(8, 4))
            ax.hist(nonzero, bins=40, range=[0, 1], edgecolor="black")
            ax.bar(0, len(zero), width=0.025, color="red", edgecolor="black",
                   align="edge", label="Zero Values")
            ax.set_title(
                f"Frequency of how often a channel is active, "
                f"{self.cfg.sae_layer}, epoch {epoch}"
            )
            ax.set_xlabel("Frequency of activation")
            ax.set_ylabel("No. of channels")
            ax.legend()
            name = "channel_frequency_histograms"
            out_dir = os.path.join(self.paths["evaluation_results"], name)
            os.makedirs(out_dir, exist_ok=True)
            fig.savefig(os.path.join(out_dir, f"{self.run_id}_epoch_{epoch}.png"), dpi=120)
            self.logger.log_figure(f"{name}/{self.cfg.sae_layer}_{model_key}", fig, epoch)
            plt.close(fig)
        except Exception as e:  # plotting must never fail a run
            print(f"[eval] channel-frequency figure skipped: {e}")

    def _select_figure_units(self, dead_acc: np.ndarray, n: int = 10) -> np.ndarray:
        """First n units that are not dead (reference model_pipeline.py:1506-1520),
        padded with dead units when fewer than n are alive."""
        alive = np.flatnonzero(~np.asarray(dead_acc, bool))
        dead = np.flatnonzero(np.asarray(dead_acc, bool))
        return np.concatenate([alive, dead])[:n].astype(np.int64)

    def _final_eval_figures(self, ds, top_state, small_state, dead_acc, epoch: int,
                            model_key: str = "sae") -> None:
        """Last-epoch figure set: per-unit top-k/bottom-k activating-sample grids
        (utils.py:1496-1784) and streaming per-unit activation histograms with fixed
        bins from the recorded top/small values, filled by one extra inference pass
        (model_pipeline.py:1488-1541, utils.py:1934-1994).

        ``model_key`` follows the reference's (layer, model_key) figure naming:
        "sae" for the spliced SAE's latents, "original" for the original model's
        channels (model_pipeline.py:108-116 model_layer_list)."""
        from sparse_vision_tpu.eval_tools.viz import gather_topk_images, show_top_k_samples
        from sparse_vision_tpu.ops.histograms import (
            init_histogram,
            plot_histograms,
            update_histogram,
        )

        units = self._select_figure_units(dead_acc, n=10)
        k = top_state.values.shape[0]
        n_show = max(1, int(np.sqrt(k)))  # reference: n=int(np.sqrt(self.k))
        out_dir = self.paths["evaluation_results"]
        try:
            import matplotlib

            matplotlib.use("Agg")

            for state, tag in ((top_state, "top"), (small_state, "small")):
                images = gather_topk_images(
                    ds, np.asarray(state.dataset_indices)[:n_show], units
                )
                values = {int(u): np.asarray(state.values)[:n_show, u] for u in units}
                path = os.path.join(
                    out_dir, "top_k_samples",
                    f"{self.run_id}_{tag}_k_samples_epoch_{epoch}.png",
                )
                show_top_k_samples(
                    images, values, path,
                    title=f"{tag}-{n_show} activating samples, "
                          f"({self.cfg.sae_layer}, {model_key}), epoch {epoch}",
                )
                # wandb.Image accepts the saved file path directly
                self.logger.log_figure(f"top_k_samples/{tag}", path, epoch)
        except Exception as e:
            print(f"[eval] top-k sample grids skipped: {e}")

        try:
            # fixed per-unit ranges from the recorded extrema (model_pipeline.py:1497-1531)
            unit_idx = jnp.asarray(units)
            mins = jnp.asarray(np.asarray(small_state.values)[0, units], jnp.float32)
            maxs = jnp.asarray(np.asarray(top_state.values)[0, units], jnp.float32)
            hstate = init_histogram(100, mins, maxs)

            @jax.jit
            def hist_update(hs, acts):
                return update_histogram(hs, acts[:, unit_idx])

            if model_key == "original":
                mstep = self._model_topk_eval_step_fn
                params = self.mts.params if hasattr(self, "mts") else self.frozen_params
                net_state = self.mts.net_state if hasattr(self, "mts") else self.net_state

                def batch_acts(b):
                    _, arrays, _ = mstep(params, net_state, b.images, b.labels)
                    return arrays["topk_acts"]
            else:
                sstep = self._sae_eval_step_fn

                def batch_acts(b):
                    _, arrays = sstep(
                        self.ts.params, self.frozen_params, self.net_state,
                        b.images, b.labels,
                    )
                    return arrays["topk_acts"]

            # "an extra round of inference to get the activation histogram"
            # (model_pipeline.py:1490-1540)
            ebs = self.cfg.eval_batch_size or self._auto_eval_batch_size()
            for b in self._batches(ds, ebs, shuffle=False):
                hstate = hist_update(hstate, batch_acts(b))
            path = os.path.join(
                out_dir, "activation_histograms",
                f"{self.run_id}_epoch_{epoch}.png",
            )
            plot_histograms(
                hstate, units, path,
                title=f"Histograms of neuron activations, "
                      f"({self.cfg.sae_layer}, {model_key}), epoch {epoch}",
            )
            self.logger.log_figure(
                f"activation_histograms/{self.cfg.sae_layer}_{model_key}", path, epoch
            )
        except Exception as e:
            print(f"[eval] activation histograms skipped: {e}")

    # ------------------------------------------------------------------
    # MIS collection epoch (mode 5; reference epoch("mis"), model_pipeline.py:500-503,
    # 948-979: k = n_mis * (k_mis + 1) = 200 on TRAIN data)
    # ------------------------------------------------------------------
    def mis_epoch(self, n_mis: int = 20, k_mis: int = 9):
        k = n_mis * (k_mis + 1)
        if self.cfg.use_sae:
            return self.eval_modified(
                epoch=self.cfg.sae_checkpoint_epoch, store=False, on_train_data=True, k=k
            )
        # original-model MIS collection: same epoch over the backbone layer's
        # channel-averaged activations (model_pipeline.py:344-345 collects top-k for
        # the original layer when no SAE is in play)
        return self.eval_original(
            epoch=self.cfg.sae_checkpoint_epoch, on_train_data=True, k=k,
            collect_topk=True,
        )

    # ------------------------------------------------------------------
    # original-model training / eval (modes 1-2)
    # ------------------------------------------------------------------
    def train_original(self):
        cfg = self.cfg
        step_fn = make_model_train_step(self.net, self.tx, self.criterion)
        # resume epoch numbering from the restored checkpoint so reruns don't
        # silently re-train on top of trained weights under the same epoch labels
        start = self._model_ckpt_epoch
        if start >= cfg.model_epochs:
            print(f"Original model already trained to epoch {start}; nothing to do.")
            return self.mts._replace(
                params=self.frozen_params, net_state=self.net_state
            )
        for _ in range(start):  # advance the per-epoch LR schedule to the resume point
            self.mts = self.mts._replace(opt_state=optim.advance_epoch(self.mts.opt_state))
        for epoch in range(start, cfg.model_epochs):
            self.eval_original(epoch) if epoch == 0 else None
            for b in self._batches(
                self.train_ds, cfg.batch_size, shuffle=True, seed=cfg.seed + epoch
            ):
                self.mts, m = step_fn(self.mts, b.images, b.labels)
                self.logger.log_train(int(self.mts.step), m)
            # per-epoch LR schedule step (reference: model_pipeline.py:963-965)
            self.mts = self.mts._replace(opt_state=optim.advance_epoch(self.mts.opt_state))
            ckpt.save_checkpoint(
                self.paths["model_weights"], epoch + 1,
                {"params": self.mts.params, "net_state": self.mts.net_state},
            )
            self.eval_original(epoch + 1)
        # expose trained weights as the frozen backbone for subsequent SAE stages
        self.frozen_params = self.mts.params
        self.net_state = self.mts.net_state
        return self.mts

    @property
    def _model_topk_eval_step_fn(self):
        # model eval step that also channel-averages the tapped backbone layer for
        # top-k collection (built once; cache key includes the layer implicitly
        # because cfg is immutable per Pipeline)
        if not hasattr(self, "_model_topk_eval_step_cache"):
            self._model_topk_eval_step_cache = make_model_eval_step(
                self.net, self.criterion, topk_layer=self.cfg.sae_layer
            )
        return self._model_topk_eval_step_cache

    def eval_original(self, epoch: int = 0, on_train_data: bool = False, k: int = 25,
                      collect_topk: bool = False, final: bool = False):
        """Original-model eval epoch (reference mode original_model=True,
        training=False). With ``collect_topk`` it also streams per-unit top-k/small-k
        over the channel-averaged activations of the backbone layer named by
        cfg.sae_layer — the reference's original-model MIS/top-k collection
        (model_pipeline.py:344-345; sae_layer parameter reuse
        specify_parameters.py:245-247) — and saves the filename-indices npz that
        compute_mis_for_run scores."""
        cfg = self.cfg
        if collect_topk and self.num_units == 0:
            raise ValueError(
                f"Top-k collection needs sae_layer to name a backbone layer "
                f"(got {cfg.sae_layer!r}; available: {self.net.stage_names})."
            )
        step_fn = self._model_topk_eval_step_fn if collect_topk else self._model_eval_step_fn
        params = self.mts.params if hasattr(self, "mts") else self.frozen_params
        net_state = self.mts.net_state if hasattr(self, "mts") else self.net_state
        ds = self.train_ds if on_train_data else self.val_ds
        sums = None  # device-side sums; one host readback per epoch
        num_batches = 0
        freq_sum = None
        dead_acc = None
        if collect_topk:
            top_state = init_topk(k, self.num_units, largest=True)
            small_state = init_topk(k, self.num_units, largest=False)
        for b in self._batches(ds, cfg.batch_size, shuffle=False):
            m, arrays, _ = step_fn(params, net_state, b.images, b.labels)
            num_batches += 1
            sums = m if sums is None else jax.tree.map(jnp.add, sums, m)
            if collect_topk:
                freq_sum = arrays["freq"] if freq_sum is None else freq_sum + arrays["freq"]
                dead_acc = metrics.update_dead_accumulator(dead_acc, arrays["dead"])
                start_idx = jnp.int32((num_batches - 1) * cfg.batch_size)
                top_state = update_topk(top_state, arrays["topk_acts"], start_idx, b.indices)
                small_state = update_topk(small_state, arrays["topk_acts"], start_idx, b.indices)
        if num_batches == 0:
            raise ValueError("Empty evaluation dataset")
        host = jax.device_get(
            {"sums": sums, "freq_sum": freq_sum, "dead_acc": dead_acc,
             "top": top_state, "small": small_state}
            if collect_topk else {"sums": sums}
        )
        means = {key: float(v) / num_batches for key, v in host["sums"].items()}
        self.logger.log_eval(epoch, means)
        if collect_topk:
            dead_acc, top_state, small_state = (
                host["dead_acc"], host["top"], host["small"]
            )
            freq = np.asarray(host["freq_sum"], np.float64) / num_batches
            self._channel_frequency_figure(freq, epoch, model_key="original")
            if final:
                self._final_eval_figures(
                    ds, top_state, small_state, dead_acc, epoch, model_key="original"
                )
            # per-unit max/min sample indices for MIS (model_pipeline.py:948-961)
            # + dead-unit mask (:967-979), same contract as eval_modified so
            # compute_mis_for_run scores original-layer channels unchanged
            fn_dir = os.path.join(self.paths["evaluation_results"], "filename_indices")
            os.makedirs(fn_dir, exist_ok=True)
            np.savez(
                os.path.join(fn_dir, f"{self.run_id}_epoch_{epoch}.npz"),
                max_filename_indices=np.asarray(top_state.filename_indices),
                min_filename_indices=np.asarray(small_state.filename_indices),
                dead_units=np.asarray(dead_acc),
                activity_freq=freq.astype(np.float32),
            )
        return means
