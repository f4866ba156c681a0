"""Weight-only SAE export/import with legacy torch key migration.

Reference parity: ``save_model_weights`` / ``load_pretrained_model``
(/root/reference/utils.py:187-225). The reference stores torch ``state_dict``s and
migrates the older ``W_enc/W_dec`` key convention into ``encoder.weight``/
``decoder.weight`` (with transposes) on load. Here:

- native save format: ``.npz`` of this framework's parameter pytree (math-convention
  layout — W_enc [d, h], W_dec [h, d]; see models/sae.py docstring)
- import accepts three layouts and normalizes all of them to the native pytree:
  1. native ``.npz``
  2. torch ``.pth``/``.pt`` state_dicts with nn.Linear keys
     (``encoder.weight`` [h, d], ``decoder.weight`` [d, h] — sae_mlp.py:26-40;
     ``W_gate`` [h, d] + ``decoder.*`` — gated_sae.py:11-26)
  3. torch state_dicts in the reference's LEGACY ``W_enc/W_dec`` convention
     (utils.py:210-221: ``encoder.weight = W_enc.T`` ⇒ stored W_enc is [d, h],
     stored W_dec is [h, d] — coincident with the native layout)
- export back to torch: ``to_torch_state_dict`` produces the reference's nn.Linear
  key layout so weights trained here load straight into the reference's models.
- SAELens interop (beyond-reference — the community publishing format for
  SAEs: a directory of ``cfg.json`` + ``sae_weights.safetensors``):
  ``save_sae_saelens`` / ``load_sae_saelens``. SAELens stores ``W_enc``
  [d_in, d_sae] and ``W_dec`` [d_sae, d_in] — exactly this framework's math
  convention, so weights map key-for-key; gated maps ``W_gate <-> W_enc``
  (SAELens shares the gate weight), jumprelu maps ``log_threshold <->
  threshold`` (SAELens stores the linear threshold). ``load_sae_weights`` /
  ``import_any`` accept ``.safetensors`` paths directly.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

# native parameter keys per SAE variant (models/sae.py init_* functions)
_NATIVE_KEYS = {
    "sae_mlp": ("W_enc", "b_enc", "W_dec", "b_dec"),
    "gated_sae": ("W_gate", "b_gate", "b_mag", "r_mag", "W_dec", "b_dec"),
    "jumprelu_sae": ("W_enc", "b_enc", "W_dec", "b_dec", "log_threshold"),
    "topk_sae": ("W_enc", "b_enc", "W_dec", "b_dec"),
    # scalar inference threshold, EMA-estimated during training (models/sae.py)
    "batch_topk_sae": ("W_enc", "b_enc", "W_dec", "b_dec", "threshold"),
    # nesting lives in the loss only — parameter layout identical to sae_mlp
    "matryoshka_sae": ("W_enc", "b_enc", "W_dec", "b_dec"),
}


def save_sae_weights(params: dict, folder: str, file_name: str = "model_weights") -> str:
    """Weight-only save to ``<folder>/<file_name>.npz`` (the reference's
    save_model_weights role, utils.py:187-195). Atomic: temp + os.replace."""
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, f"{file_name}.npz")
    tmp = path + ".tmp.npz"
    np.savez(tmp, **{k: np.asarray(v) for k, v in params.items()})
    os.replace(tmp, path)
    return path


def to_torch_state_dict(params: dict, sae_model_name: str) -> dict:
    """Native pytree -> reference torch nn.Linear key layout (numpy values;
    callers torch.save after mapping through torch.from_numpy if needed)."""
    p = {k: np.asarray(v) for k, v in params.items()}
    if sae_model_name == "crosscoder":
        # per-layer nn.Linear layout (no reference counterpart — the variant is
        # beyond-reference; keys follow the flat native scheme, transposed)
        out = {"b_enc": p["b_enc"]}
        n = sum(1 for k in p if k.startswith("W_enc_"))
        for i in range(n):
            out[f"encoder_{i}.weight"] = p[f"W_enc_{i}"].T  # [h, d_i]
            out[f"decoder_{i}.weight"] = p[f"W_dec_{i}"].T  # [d_i, h]
            out[f"decoder_{i}.bias"] = p[f"b_dec_{i}"]
        return out
    if sae_model_name == "gated_sae":
        return {
            "W_gate": p["W_gate"].T,  # torch stores [h, d]
            "b_gate": p["b_gate"],
            "b_mag": p["b_mag"],
            "r_mag": p["r_mag"],
            "decoder.weight": p["W_dec"].T,  # torch nn.Linear(h, d): [d, h]
            "decoder.bias": p["b_dec"],
        }
    out = {
        "encoder.weight": p["W_enc"].T,  # torch nn.Linear(d, h): [h, d]
        "encoder.bias": p["b_enc"],
        "decoder.weight": p["W_dec"].T,
        "decoder.bias": p["b_dec"],
    }
    if sae_model_name == "jumprelu_sae" and "log_threshold" in p:
        out["log_threshold"] = p["log_threshold"]
    if sae_model_name == "batch_topk_sae" and "threshold" in p:
        out["threshold"] = p["threshold"]
    return out


def _normalize_state_dict(sd: dict, sae_model_name: str) -> dict:
    """Torch state_dict (either key convention) -> native pytree layout.

    Mirrors the reference's load-time migration (utils.py:210-221), extended with the
    inverse transposes into the math-convention layout."""
    sd = dict(sd)
    out: dict = {}
    if sae_model_name == "crosscoder":
        out["b_enc"] = np.asarray(sd["b_enc"])
        n = sum(1 for k in sd if k.startswith("encoder_") and k.endswith(".weight"))
        for i in range(n):
            out[f"W_enc_{i}"] = np.asarray(sd[f"encoder_{i}.weight"]).T
            out[f"W_dec_{i}"] = np.asarray(sd[f"decoder_{i}.weight"]).T
            out[f"b_dec_{i}"] = np.asarray(sd[f"decoder_{i}.bias"])
        return out
    if sae_model_name == "gated_sae":
        out["W_gate"] = np.asarray(sd["W_gate"]).T  # [h, d] -> [d, h]
        out["b_gate"] = np.asarray(sd["b_gate"])
        out["b_mag"] = np.asarray(sd["b_mag"])
        out["r_mag"] = np.asarray(sd["r_mag"])
    else:
        if "encoder.weight" in sd:  # torch nn.Linear convention
            out["W_enc"] = np.asarray(sd["encoder.weight"]).T
            out["b_enc"] = np.asarray(sd["encoder.bias"])
        else:  # legacy W_enc convention: stored [d, h], native already
            out["W_enc"] = np.asarray(sd["W_enc"])
            out["b_enc"] = np.asarray(sd["b_enc"])
        if sae_model_name == "jumprelu_sae" and "log_threshold" in sd:
            out["log_threshold"] = np.asarray(sd["log_threshold"])
        if sae_model_name == "batch_topk_sae" and "threshold" in sd:
            out["threshold"] = np.asarray(sd["threshold"])
    if "decoder.weight" in sd:
        out["W_dec"] = np.asarray(sd["decoder.weight"]).T
        out["b_dec"] = np.asarray(sd["decoder.bias"])
    else:  # legacy: stored W_dec is [h, d], native already
        out["W_dec"] = np.asarray(sd["W_dec"])
        out["b_dec"] = np.asarray(sd["b_dec"])
    return out


# this framework's variant names <-> SAELens cfg.json "architecture" values
_SAELENS_ARCH = {
    "sae_mlp": "standard",
    "gated_sae": "gated",
    "jumprelu_sae": "jumprelu",
    "topk_sae": "topk",
    # the community-standard conversion (BatchTopK paper code, SAELens): a
    # trained BatchTopK SAE publishes as a JumpReLU with the scalar threshold
    # broadcast per latent — its exact inference form
    "batch_topk_sae": "jumprelu",
    # nesting lives in the loss; published weights are a standard SAE
    "matryoshka_sae": "standard",
}
_ARCH_TO_NATIVE = {"standard": "sae_mlp", "gated": "gated_sae",
                   "jumprelu": "jumprelu_sae", "topk": "topk_sae"}
SAELENS_WEIGHTS_FILE = "sae_weights.safetensors"
SAELENS_CFG_FILE = "cfg.json"


def _to_saelens_tensors(params: dict, sae_model_name: str) -> dict:
    """Native pytree -> SAELens tensor dict. The W_enc/W_dec orientation is
    IDENTICAL (W_enc [d_in, d_sae], W_dec [d_sae, d_in] — SAELens's
    TrainingSAE layout matches this repo's math convention); only the gated
    gate-weight name and the jumprelu threshold parameterization differ."""
    p = {k: np.asarray(v) for k, v in params.items()}
    if sae_model_name == "gated_sae":
        return {"W_enc": p["W_gate"], "b_gate": p["b_gate"],
                "b_mag": p["b_mag"], "r_mag": p["r_mag"],
                "W_dec": p["W_dec"], "b_dec": p["b_dec"]}
    out = {"W_enc": p["W_enc"], "b_enc": p["b_enc"],
           "W_dec": p["W_dec"], "b_dec": p["b_dec"]}
    if sae_model_name == "jumprelu_sae":
        out["threshold"] = np.exp(p["log_threshold"])
    if sae_model_name == "batch_topk_sae":
        h = p["b_enc"].shape[0]
        out["threshold"] = np.full((h,), p["threshold"], p["threshold"].dtype)
    return out


def _from_saelens_tensors(tensors: dict, sae_model_name: str) -> dict:
    t = {k: np.asarray(v) for k, v in tensors.items()}
    if sae_model_name == "gated_sae":
        return {"W_gate": t["W_enc"], "b_gate": t["b_gate"],
                "b_mag": t["b_mag"], "r_mag": t["r_mag"],
                "W_dec": t["W_dec"], "b_dec": t["b_dec"]}
    out = {"W_enc": t["W_enc"], "b_enc": t["b_enc"],
           "W_dec": t["W_dec"], "b_dec": t["b_dec"]}
    if sae_model_name == "jumprelu_sae" and "threshold" in t:
        thr = t["threshold"]
        if np.any(thr <= 0):
            raise ValueError("SAELens jumprelu threshold must be positive to "
                             "map into log_threshold")
        out["log_threshold"] = np.log(thr)
    if sae_model_name == "batch_topk_sae" and "threshold" in t:
        thr = np.asarray(t["threshold"])
        # published jumprelu artifacts store a per-latent threshold; importing
        # into batch_topk needs the scalar form (all equal, the export above)
        if thr.ndim and not np.all(thr == thr.flat[0]):
            raise ValueError(
                "per-latent SAELens thresholds differ; load as jumprelu_sae "
                "instead of batch_topk_sae"
            )
        out["threshold"] = np.asarray(thr.flat[0] if thr.ndim else thr)
    return out


def save_sae_saelens(params: dict, sae_model_name: str, folder: str,
                     extra_cfg: dict | None = None) -> str:
    """Export to the SAELens publishing layout: ``<folder>/cfg.json`` +
    ``<folder>/sae_weights.safetensors``. Returns the folder path."""
    import json

    from safetensors.numpy import save_file

    if sae_model_name not in _SAELENS_ARCH:
        raise ValueError(f"no SAELens mapping for {sae_model_name!r}")
    tensors = _to_saelens_tensors(params, sae_model_name)
    os.makedirs(folder, exist_ok=True)
    d_in, d_sae = (int(tensors["W_dec"].shape[1]), int(tensors["W_dec"].shape[0]))
    cfg = {
        "architecture": _SAELENS_ARCH[sae_model_name],
        "d_in": d_in,
        "d_sae": d_sae,
        "dtype": str(tensors["W_dec"].dtype),
        # every variant here centers the input on b_dec (models/sae.py)
        "apply_b_dec_to_input": True,
        **(extra_cfg or {}),
    }
    wpath = os.path.join(folder, SAELENS_WEIGHTS_FILE)
    save_file(tensors, wpath + ".tmp")
    os.replace(wpath + ".tmp", wpath)
    cpath = os.path.join(folder, SAELENS_CFG_FILE)
    with open(cpath + ".tmp", "w") as f:
        json.dump(cfg, f, indent=1)
    os.replace(cpath + ".tmp", cpath)
    return folder


def load_sae_saelens(path: str, sae_model_name: str | None = None) -> tuple:
    """Load a SAELens artifact (directory with cfg.json + safetensors, or a
    bare .safetensors file) -> ``(native params pytree, cfg dict)``. The
    variant comes from cfg.json's "architecture" unless given explicitly."""
    import json

    from safetensors.numpy import load_file

    cfg: dict = {}
    if os.path.isdir(path):
        cpath = os.path.join(path, SAELENS_CFG_FILE)
        if os.path.exists(cpath):
            with open(cpath) as f:
                cfg = json.load(f)
        path = os.path.join(path, SAELENS_WEIGHTS_FILE)
    if sae_model_name is None:
        arch = cfg.get("architecture", "standard")
        if arch not in _ARCH_TO_NATIVE:
            raise ValueError(f"unknown SAELens architecture {arch!r}")
        sae_model_name = _ARCH_TO_NATIVE[arch]
    tensors = load_file(path)
    tree = _from_saelens_tensors(tensors, sae_model_name)
    return {k: jnp.asarray(v) for k, v in tree.items()}, cfg


def load_sae_weights(path: str, sae_model_name: str = "sae_mlp") -> dict:
    """Load SAE weights from a native ``.npz``, a reference-format torch
    ``.pth``/``.pt`` file, OR a SAELens ``.safetensors`` file / artifact
    directory, returning the native jnp parameter pytree
    (reference: load_pretrained_model, utils.py:197-225)."""
    if path.endswith(".safetensors") or (
        os.path.isdir(path)
        and os.path.exists(os.path.join(path, SAELENS_WEIGHTS_FILE))
    ):
        return load_sae_saelens(path, sae_model_name)[0]
    if path.endswith(".npz"):
        with np.load(path) as z:
            raw = {k: z[k] for k in z.files}
        missing = set(_NATIVE_KEYS.get(sae_model_name, ())) - set(raw)
        # thresholds optional when importing relu-SAE weights into
        # jumprelu/batch_topk (defaults filled by import_any)
        missing -= {"log_threshold", "threshold"}
        if missing:
            raise KeyError(f"{path} missing native keys {sorted(missing)}")
        tree = raw
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
        tree = _normalize_state_dict(sd, sae_model_name)
    return {k: jnp.asarray(v) for k, v in tree.items()}


def validate_shapes(params: dict, like: dict, path: str = "") -> None:
    """Raise if an imported tree's shapes don't match a freshly-initialized one."""
    for k, v in like.items():
        if k not in params:
            raise KeyError(f"imported weights{f' ({path})' if path else ''} missing {k!r}")
        if tuple(np.shape(params[k])) != tuple(np.shape(v)):
            raise ValueError(
                f"shape mismatch for {k!r}: imported {np.shape(params[k])} "
                f"vs expected {np.shape(v)}"
            )


def import_any(path: str, sae_model_name: str, like: dict) -> dict:
    """Load + validate against an expected parameter tree (the Pipeline entry point)."""
    params = load_sae_weights(path, sae_model_name)
    # tolerate missing thresholds when importing plain-relu weights
    if sae_model_name == "jumprelu_sae" and "log_threshold" not in params:
        params["log_threshold"] = jnp.asarray(like["log_threshold"])
    if sae_model_name == "batch_topk_sae" and "threshold" not in params:
        params["threshold"] = jnp.asarray(like["threshold"])
    validate_shapes(params, like, path)
    return params
