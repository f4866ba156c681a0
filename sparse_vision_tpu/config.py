"""Typed run configuration + sweep expansion.

Replaces the reference's positional 24-field CSV schema (specify_parameters.py:250-293,
main.py:86-111, execute_project.py:40-65 — including ``eval("True")`` string-to-bool)
with a typed dataclass, while keeping a loss-free conversion to/from the legacy line
format so sweeps written for the reference still run.
"""

from __future__ import annotations

import dataclasses
import itertools
import json
from dataclasses import dataclass, field
from typing import Any, Iterator

# Field order of a legacy parameters.txt line (specify_parameters.py:250-272 + the
# trailing sae_checkpoint_epoch appended at :287-293).
LEGACY_FIELDS = (
    "model_name",
    "sae_model_name",
    "sae_layer",
    "directory_path",
    "wandb_status",
    "model_epochs",
    "model_learning_rate",
    "batch_size",
    "model_optimizer_name",
    "sae_epochs",
    "sae_learning_rate",
    "sae_optimizer_name",
    "sae_batch_size",
    "sae_lambda_sparse",
    "sae_expansion_factor",
    "dataset_name",
    "training",
    "original_model",
    "model_criterion_name",
    "sae_criterion_name",
    "dead_neurons_steps",
    "mis",
    "compute_ie",
    "sae_checkpoint_epoch",
)


# Field order of a legacy parameters_eval.txt line (specify_parameters.py:296-312):
# the 24-field schema minus sae_lambda_sparse, sae_expansion_factor, training,
# criteria, mis, and compute_ie — one line identifies a SWEEP's results file, not a
# single run.
LEGACY_EVAL_FIELDS = (
    "model_name",
    "sae_model_name",
    "sae_layer",
    "directory_path",
    "wandb_status",
    "model_epochs",
    "model_learning_rate",
    "batch_size",
    "model_optimizer_name",
    "sae_epochs",
    "sae_learning_rate",
    "sae_optimizer_name",
    "sae_batch_size",
    "dataset_name",
    "original_model",
    "dead_neurons_steps",
    "sae_checkpoint_epoch",
)


def _fmt_legacy(v: Any) -> str:
    if isinstance(v, bool):
        return "True" if v else "False"
    return str(v)


def _parse_bool(s: str) -> bool:
    # The reference uses eval("True") (execute_project.py:40-64); we parse strictly.
    if s in ("True", "true", "1"):
        return True
    if s in ("False", "false", "0"):
        return False
    raise ValueError(f"Not a boolean literal: {s!r}")


@dataclass(frozen=True)
class RunConfig:
    """One run of the pipeline — the typed equivalent of one parameters.txt line."""

    # --- reference-parity fields ---
    model_name: str = "custom_mlp_9"
    sae_model_name: str = "sae_mlp"
    sae_layer: str = "fc1"
    directory_path: str = "runs"
    wandb_status: bool = False
    model_epochs: int = 1
    model_learning_rate: float = 1e-3
    batch_size: int = 64
    model_optimizer_name: str = "adam"
    sae_epochs: int = 1
    sae_learning_rate: float = 1e-3
    sae_optimizer_name: str = "constrained_adam"
    sae_batch_size: int = 64
    sae_lambda_sparse: float = 0.1
    sae_expansion_factor: int = 2
    dataset_name: str = "mnist"
    training: bool = True
    original_model: bool = False
    model_criterion_name: str = "cross_entropy"
    sae_criterion_name: str = "sae_loss"
    dead_neurons_steps: int = 200
    mis: str = "0"  # "0" | "1" (collect indices) | "2" (score)
    compute_ie: str = "0"  # "0" | "1" | "2" | "3" | "4i" (i indexes the threshold grid)
    sae_checkpoint_epoch: int = 0

    # --- TPU-native extensions (no reference equivalent) ---
    data_dir: str = ""  # where dataset files live; "" -> synthetic data
    mesh_shape: tuple = ()  # e.g. (8,) for 1-D data-parallel; () -> all devices on 'data'
    # active latents per token for sae_model_name="topk_sae" (Gao et al. 2024;
    # beyond-reference variant — sparsity via the activation, train with lambda=0).
    # sae_model_name="batch_topk_sae" (Bussmann et al. 2024) reuses it as the
    # PER-TOKEN AVERAGE budget: training keeps the T*k largest activations over
    # the whole batch; inference gates with an EMA-estimated scalar threshold
    # (models/sae.batch_topk_sae_apply)
    sae_topk: int = 32
    # AuxK dead-latent auxiliary loss for the TopK family (Gao et al. 2024 §A.2;
    # models/sae.topk_aux_loss): reconstruct the main residual with the top-k_aux
    # currently-dead latents, weighted by sae_aux_alpha (the paper's 1/32).
    # 0 = off (the pinned default). Measured motivation: batch_topk at 16k latents
    # with pure MSE converged to 81% dead units (convergence_variants_v5e.json).
    sae_aux_k: int = 0
    sae_aux_alpha: float = 0.03125
    # JumpReLU STE kernel bandwidth ε and threshold init θ0 (Rajamanoharan et al.
    # 2024 defaults, sized for NORMALIZED activations). The STE gradient only fires
    # within ε/2 of a threshold — on raw vision activations (GoogLeNet mixed3a
    # pre-activations are O(1-100)) both must scale with the activation
    # distribution or the thresholds never move (models/sae.py JUMPRELU_BANDWIDTH
    # note; measured on-chip: L0 frozen regardless of lambda at the defaults)
    jumprelu_bandwidth: float = 1e-3
    jumprelu_threshold_init: float = 1e-3
    # latent-prefix fractions for sae_model_name="matryoshka_sae" (Bussmann et al.
    # 2024; beyond-reference variant — each prefix of the dictionary must
    # reconstruct the input, so early latents learn coarse features). CSV of
    # fractions in (0, 1]; the last prefix is always the full dictionary.
    sae_matryoshka_prefixes: str = "0.0625,0.25,1.0"
    # opt-in: select TopK latents with the TPU-native approximate top-k
    # (lax.approx_max_k, recall_target 0.95 — measured recall 0.98, 11x faster than
    # the exact sort at [16k, 16k] on v5e; models/sae.topk_sae_apply docstring)
    sae_topk_approx: bool = False
    # matmul dtype inside the fused Pallas kernels (accumulation always f32);
    # "float32" trades ~2x throughput for exact-f32 parity with the stock path
    compute_dtype: str = "bfloat16"
    seed: int = 0
    use_pallas: bool = True  # use fused Pallas SAE kernels where available
    log_every: int = 100  # console log cadence (reference: utils.py:1259)
    profile_dir: str = ""  # non-empty -> jax.profiler.trace of each train epoch
    # restrict ImageNet to one wordnet class — the reference hardcoded a
    # flamingo-only filter as a live experiment artifact (utils.py:2163-2168);
    # here it is an explicit opt-in
    imagenet_class_filter: str = ""
    # train the SAE from a pre-dumped activation cache (built automatically on first
    # use) instead of recomputing the backbone forward every step — the production
    # ImageNet path (data/activation_cache.py)
    use_activation_cache: bool = False
    cache_tokens_per_step: int = 4096
    # end-to-end finetune after SAE training (arXiv:2503.17272, PAPERS.md): N
    # short epochs minimizing KL(spliced || original) through the splice —
    # directly improves the thesis' fidelity metrics (KLD/%same/loss_diff);
    # sae_e2e_alpha_mse anchors with the reconstruction MSE (0 = pure KL)
    sae_e2e_finetune_epochs: int = 0
    sae_e2e_alpha_mse: float = 0.0
    # transcoder runs (sae_model_name="transcoder"): the layer whose activations
    # the dictionary PREDICTS; sae_layer is the layer it reads. Both layers must
    # share spatial dims (per-token map between channel spaces); see
    # train/transcoder.py
    transcoder_target_layer: str = ""
    # crosscoder runs (sae_model_name="crosscoder"): comma-separated ADDITIONAL
    # layers beyond sae_layer that share the one sparse code; all layers must
    # share spatial dims and be listed in network depth order with sae_layer
    # shallowest (the eval splice replaces the deepest layer's activation).
    # See models/crosscoder.py + train/crosscoder.py
    crosscoder_layers: str = ""
    # on-disk dtype of the activation cache ("float32" | "bfloat16" | "int8");
    # bfloat16 halves cache bytes + host<->device transfer and matches the fused
    # kernels' matmul dtype (the production setting; docs/NORTHSTAR.md dumps bf16).
    # int8 halves AGAIN (symmetric per-shard per-channel quantization,
    # data/activation_cache.quantize_int8; the train step dequantizes on device)
    cache_dtype: str = "float32"
    # overlap the activation dump with the FIRST training epoch: training consumes
    # each cache shard as soon as its atomic write completes while the dump keeps
    # writing later shards (on-disk cache stays byte-identical; the streamed epoch
    # runs in dump order instead of shuffled). Sequential dump-then-train remains
    # the default for reproducibility.
    overlap_dump_train: bool = False
    # image-decode worker threads: -1 auto (min(16, cpus)), 0 synchronous — the
    # reference uses 5-8 DataLoader workers (utils.py:354, 540-547)
    data_workers: int = -1
    # initialize the SAE from a weight file instead of random init: native .npz or a
    # reference-format torch .pth (either key convention — utils.py:197-225), e.g.
    # the reference author's published SAE checkpoints (train/sae_io.py)
    sae_weights_path: str = ""
    # image batch size for eval/MIS epochs; 0 -> sae_batch_size. The stock (unfused)
    # eval step materializes the [B*H*W, latents] matrix — at 16k latents that is
    # ~13 GB for a 256-image conv batch, so large-latent evals need a smaller batch
    eval_batch_size: int = 0
    # input normalization for SAE-family training ("none" | "rms"): "rms"
    # divides every token by the cache's sqrt(mean(x^2)) (per layer; recorded in
    # the cache meta as token_rms) before the dictionary and rescales the
    # reconstruction before the splice, so lambda/lr recipes transfer across
    # activation distributions. Vision taps vary by ORDERS OF MAGNITUDE across
    # layers (measured here: mixed3a std ~3.3 vs mixed4e std ~0.003 on the
    # stand-in backbone) and the crosscoder's cat space mixes them in one loss —
    # per-layer RMS normalization is the standard SAE-practice fix (Anthropic
    # crosscoders; saprmarks/dictionary_learning "normalize_activations").
    # Requires use_activation_cache (the scale comes from the cache) and is
    # incompatible with overlap_dump_train (the scale is only known once the
    # dump finishes). Reported rec/l1/rmse metrics are in NORMALIZED units;
    # KLD/%same/loss_diff splice at the raw scale (exact rescale).
    sae_input_norm: str = "none"
    # edge-IE (compute_ie="3") feature count per layer: the top-|node IE| features
    # enter the edge matrices (the reference hand-lists indices instead,
    # compute_ie.py:81-88). Production scale is hundreds/layer (bench_ie.py
    # IE_SCALE=full runs 256); the feature-chunked cotangent path bounds HBM
    ie_top_features: int = 16
    # cotangent chunk size for the edge-IE backward (interp/circuit.py)
    ie_cotangent_chunk: int = 64

    @property
    def use_sae(self) -> bool:
        return not self.original_model

    @property
    def matryoshka_prefix_fractions(self) -> tuple:
        return tuple(float(f) for f in self.sae_matryoshka_prefixes.split(",") if f)

    @property
    def crosscoder_layer_list(self) -> tuple:
        """The ADDITIONAL crosscoder layers (sae_layer is the anchor and is not
        repeated here)."""
        return tuple(s.strip() for s in self.crosscoder_layers.split(",") if s.strip())

    # ---- legacy conversion -------------------------------------------------
    @classmethod
    def from_legacy_line(cls, line: str, **overrides: Any) -> "RunConfig":
        """Parse one comma-separated parameters.txt line (reference: main.py:86-111)."""
        values = [v.strip() for v in line.strip().split(",")]
        if len(values) != len(LEGACY_FIELDS):
            raise ValueError(
                f"Expected {len(LEGACY_FIELDS)} fields, got {len(values)}: {line!r}"
            )
        raw = dict(zip(LEGACY_FIELDS, values))
        kwargs: dict[str, Any] = dict(
            model_name=raw["model_name"],
            sae_model_name=raw["sae_model_name"],
            sae_layer=raw["sae_layer"],
            directory_path=raw["directory_path"],
            wandb_status=_parse_bool(raw["wandb_status"]),
            model_epochs=int(raw["model_epochs"]),
            model_learning_rate=float(raw["model_learning_rate"]),
            batch_size=int(raw["batch_size"]),
            model_optimizer_name=raw["model_optimizer_name"],
            sae_epochs=int(raw["sae_epochs"]),
            sae_learning_rate=float(raw["sae_learning_rate"]),
            sae_optimizer_name=raw["sae_optimizer_name"],
            sae_batch_size=int(raw["sae_batch_size"]),
            sae_lambda_sparse=float(raw["sae_lambda_sparse"]),
            sae_expansion_factor=int(raw["sae_expansion_factor"]),
            dataset_name=raw["dataset_name"],
            training=_parse_bool(raw["training"]),
            original_model=_parse_bool(raw["original_model"]),
            model_criterion_name=raw["model_criterion_name"],
            sae_criterion_name=raw["sae_criterion_name"],
            dead_neurons_steps=int(raw["dead_neurons_steps"]),
            mis=raw["mis"],
            compute_ie=raw["compute_ie"],
            sae_checkpoint_epoch=int(raw["sae_checkpoint_epoch"]),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @classmethod
    def from_legacy_eval_line(cls, line: str, **overrides: Any) -> "RunConfig":
        """Parse one 17-field parameters_eval.txt line (the reference's separate
        eval-sweep spec: specify_parameters.py:296-322, consumed by main.py:117-155).
        Eval-only fields default to a frozen-SAE evaluation run."""
        values = [v.strip() for v in line.strip().split(",")]
        if len(values) != len(LEGACY_EVAL_FIELDS):
            raise ValueError(
                f"Expected {len(LEGACY_EVAL_FIELDS)} fields, got {len(values)}: {line!r}"
            )
        raw = dict(zip(LEGACY_EVAL_FIELDS, values))
        kwargs: dict[str, Any] = dict(
            model_name=raw["model_name"],
            sae_model_name=raw["sae_model_name"],
            sae_layer=raw["sae_layer"],
            directory_path=raw["directory_path"],
            wandb_status=_parse_bool(raw["wandb_status"]),
            model_epochs=int(raw["model_epochs"]),
            model_learning_rate=float(raw["model_learning_rate"]),
            batch_size=int(raw["batch_size"]),
            model_optimizer_name=raw["model_optimizer_name"],
            sae_epochs=int(raw["sae_epochs"]),
            sae_learning_rate=float(raw["sae_learning_rate"]),
            sae_optimizer_name=raw["sae_optimizer_name"],
            sae_batch_size=int(raw["sae_batch_size"]),
            dataset_name=raw["dataset_name"],
            original_model=_parse_bool(raw["original_model"]),
            dead_neurons_steps=int(raw["dead_neurons_steps"]),
            sae_checkpoint_epoch=int(raw["sae_checkpoint_epoch"]),
            training=False,
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    def to_legacy_line(self) -> str:
        return ",".join(_fmt_legacy(getattr(self, f)) for f in LEGACY_FIELDS)

    def to_legacy_eval_line(self) -> str:
        return ",".join(_fmt_legacy(getattr(self, f)) for f in LEGACY_EVAL_FIELDS)

    # ---- json --------------------------------------------------------------
    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["mesh_shape"] = list(self.mesh_shape)
        return json.dumps(d, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "RunConfig":
        d = json.loads(s)
        d["mesh_shape"] = tuple(d.get("mesh_shape", ()))
        return cls(**d)


@dataclass
class Sweep:
    """Cartesian-product sweep over RunConfig fields.

    Typed replacement for specify_parameters.py (reference: :250-293); validation rules
    mirrored from :222-236 (e.g. MIS/IE only meaningful with a frozen SAE, not during
    original-model training).
    """

    axes: dict = field(default_factory=dict)  # field name -> list of values
    base: RunConfig = field(default_factory=RunConfig)

    def __iter__(self) -> Iterator[RunConfig]:
        names = list(self.axes)
        for combo in itertools.product(*(self.axes[n] for n in names)):
            cfg = dataclasses.replace(self.base, **dict(zip(names, combo)))
            self.validate(cfg)
            yield cfg

    @staticmethod
    def validate(cfg: RunConfig) -> None:
        if cfg.original_model and cfg.compute_ie != "0":
            # reference guard: specify_parameters.py:229-230
            raise ValueError("IE can only be computed for the SAE model, not the original model.")
        if cfg.compute_ie != "0" and cfg.training:
            raise ValueError("IE is computed on a frozen SAE, not during training.")
        if cfg.mis != "0" and cfg.training:
            raise ValueError("MIS is computed on a frozen SAE, not during training.")

    def write_jsonl(self, path: str) -> int:
        n = 0
        with open(path, "w") as f:
            for cfg in self:
                f.write(cfg.to_json() + "\n")
                n += 1
        return n

    def write_legacy(self, path: str) -> int:
        n = 0
        with open(path, "w") as f:
            for cfg in self:
                f.write(cfg.to_legacy_line() + "\n")
                n += 1
        return n

    def write_legacy_eval(self, path: str) -> int:
        """Write the companion eval-sweep file (the parameters_eval.txt role,
        specify_parameters.py:296-322): the DISTINCT 17-field combos of the sweep —
        per-λ/per-k runs of one sweep share one results CSV, so they collapse to one
        eval line."""
        seen: list[str] = []
        for cfg in self:
            line = cfg.to_legacy_eval_line()
            if line not in seen:
                seen.append(line)
        with open(path, "w") as f:
            for line in seen:
                f.write(line + "\n")
        return len(seen)


def read_jsonl(path: str) -> list[RunConfig]:
    with open(path) as f:
        return [RunConfig.from_json(line) for line in f if line.strip()]


# Image sizes per dataset, stored channels-last (reference get_img_size, utils.py:139-149,
# stores them channels-first).
IMG_SIZES = {
    "tiny_imagenet": (64, 64, 3),
    "cifar_10": (32, 32, 3),
    "mnist": (28, 28, 1),
    # the lucent-InceptionV1 crop the data pipeline actually produces
    # (utils.py:318-329: Resize 256 -> CenterCrop 229)
    "imagenet": (229, 229, 3),
    "synthetic": (28, 28, 1),
}

NUM_CLASSES = {
    "tiny_imagenet": 200,
    "cifar_10": 10,
    "mnist": 10,
    "imagenet": 1000,
    "synthetic": 10,
}


def is_vit_family(model_name: str) -> bool:
    """True for the ViT/CLIP tower specs (optionally '_split'-suffixed)."""
    base = model_name[:-6] if model_name.endswith("_split") else model_name
    return base.startswith("vit_") or base.startswith("clip_vit")


def get_img_size(dataset_name: str, model_name: str | None = None) -> tuple:
    """Input image shape, channels-last. Per-dataset by default (reference
    get_img_size, utils.py:139-149); MODEL-aware for the ViT/CLIP family on
    ImageNet: the 229px crop is a lucent-InceptionV1 convention
    (utils.py:318-329) that no 224-trained transformer accepts — ViT/CLIP
    towers get the HF-processor 224px convention instead (the per-backbone
    preprocessing precedent is the reference's own InceptionV1 pipeline)."""
    if dataset_name not in IMG_SIZES:
        raise ValueError(f"Unsupported dataset: {dataset_name}")
    size = IMG_SIZES[dataset_name]
    if model_name and is_vit_family(model_name) and size[0] == 229:
        return (224, 224, 3)
    return size
