"""Versioned AOT serving artifacts (jax.export / StableHLO).

The reference has no deployment story at all — every evaluation re-imports the
model code and re-loads torch checkpoints in-process (SURVEY.md §0; reference
execute_project.py device pick + model_pipeline instantiation). This subsystem
is TPU-native-new: a trained run is exported ONCE into a self-contained,
serialized StableHLO module with the weights baked in as constants, so a
serving host needs neither the framework's Python model code nor checkpoint
plumbing — only jax + the artifact directory. The module is portable across
processes and (when exported with ``platforms=('tpu','cpu')``) across backends,
and replays through XLA's AOT path with zero retracing of Python.

Artifact layout (one directory):

- ``module.stablehlo`` — ``jax.export.Exported.serialize()`` bytes
- ``meta.json`` — artifact version, kind, framework provenance, per-example
  input spec, batch mode (``"poly"`` or a fixed int), output names, and any
  exporter extras (model/sae identity) for audit.

Both files are published atomically (temp + ``os.replace``), matching the
repo-wide shared-filesystem convention (eval_tools/results.py).
"""

from __future__ import annotations

import json
import os
import tempfile

ARTIFACT_VERSION = 1
MODULE_FILE = "module.stablehlo"
META_FILE = "meta.json"


def _atomic_write(path: str, data: bytes) -> None:
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp_artifact_")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_artifact(path: str, exported, meta: dict) -> str:
    """Serialize an ``jax.export.Exported`` plus metadata into ``path``.

    ``meta`` carries the exporter's fields (kind, input_shape, input_dtype,
    batch, outputs, extras); provenance fields are stamped here so every
    artifact records what produced it.
    """
    import jax

    os.makedirs(path, exist_ok=True)
    full = {
        "artifact_version": ARTIFACT_VERSION,
        "framework": "sparse_vision_tpu",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        **meta,
    }
    _atomic_write(os.path.join(path, MODULE_FILE), exported.serialize())
    _atomic_write(
        os.path.join(path, META_FILE),
        json.dumps(full, indent=2, sort_keys=True).encode(),
    )
    return path


def load_artifact(path: str):
    """Load ``(exported, meta)`` from an artifact directory.

    Raises ``ValueError`` on a missing/foreign directory or an artifact-version
    mismatch — serving hosts must fail loudly rather than run a module whose
    calling convention this code no longer understands.
    """
    from jax import export

    meta_path = os.path.join(path, META_FILE)
    module_path = os.path.join(path, MODULE_FILE)
    if not (os.path.exists(meta_path) and os.path.exists(module_path)):
        raise ValueError(f"{path!r} is not a serving artifact directory")
    with open(meta_path) as f:
        meta = json.load(f)
    ver = meta.get("artifact_version")
    if ver != ARTIFACT_VERSION:
        raise ValueError(
            f"artifact version {ver!r} unsupported (this build reads "
            f"{ARTIFACT_VERSION}); re-export the run"
        )
    with open(module_path, "rb") as f:
        exported = export.deserialize(f.read())
    return exported, meta
