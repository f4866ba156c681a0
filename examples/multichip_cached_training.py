"""Multi-chip production training example: the activation-cache path over a device
mesh, in both parallelism regimes, on synthetic data (runs anywhere — on a machine
without 8 real chips it provisions a virtual 8-device CPU mesh):

  1. data parallel, mesh_shape=(8,): tokens shard over chips, the fused step runs
     under shard_map, gradients/metrics reduce over ICI
  2. tensor parallel, mesh_shape=(2, 4): the 16k-latent dimension would not fit one
     chip at the largest expansion factors — params + Adam moments + dead accumulator
     shard over the 'model' axis via GSPMD (parallel/tensor_parallel.py)

    python examples/multichip_cached_training.py /tmp/sv_multichip
"""

import os
import sys

# provision a virtual CPU mesh BEFORE any backend-initializing jax call
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

# honor JAX_PLATFORMS even when a site hook registered another default platform
# plugin at interpreter startup (same workaround as cli.py / __graft_entry__.py)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if len(jax.devices()) < 8:
    raise SystemExit("need 8 devices; run with JAX_PLATFORMS=cpu for the virtual mesh")

from sparse_vision_tpu.config import RunConfig  # noqa: E402
from sparse_vision_tpu.train.pipeline import Pipeline  # noqa: E402

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sv_multichip"

for mesh_shape, tag in [((8,), "data-parallel"), ((2, 4), "tensor-parallel")]:
    cfg = RunConfig(
        directory_path=os.path.join(root, tag),
        dataset_name="synthetic",
        sae_epochs=1,
        sae_batch_size=64,
        sae_expansion_factor=2,
        dead_neurons_steps=10_000,
        use_activation_cache=True,
        cache_tokens_per_step=128,
        mesh_shape=mesh_shape,
        log_every=1000,
    )
    pipe = Pipeline(cfg)
    result = pipe.run()
    w_dec = pipe.ts.params["W_dec"]
    shards = sorted({s.data.shape for s in w_dec.addressable_shards})
    print(
        f"{tag} mesh {mesh_shape}: rec_loss={result['sae_rec_loss']:.4f} "
        f"W_dec global {tuple(w_dec.shape)} shard(s) {shards}"
    )
print("multichip example OK")
