"""Crosscoder quickstart: ONE sparse code over three consecutive layers, plus
the model-diffing readout (Lindsey et al. 2024 "Sparse Crosscoders for
Cross-Layer Features and Model Diffing" — here on a vision MLP).

The L aligned token caches come from ONE backbone pass
(dump_activations_multi). After training, each latent's per-layer decoder-norm
profile says WHERE the feature lives: flat profile = shared feature,
concentrated profile = layer-specific (models/crosscoder.py).

    JAX_PLATFORMS=cpu python examples/crosscoder_diffing.py [workdir]

Runs on synthetic data / CPU in ~1 min.
"""

import os
import sys
import tempfile

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested

pin_cpu_if_requested()  # site-hook quirk: see utils/platform.py

import numpy as np

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.train.pipeline import Pipeline

workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="svt_cc_")

cfg = RunConfig(
    model_name="custom_mlp_3",            # fc1 [64] -> fc2 [32] -> fc3 [16]
    sae_model_name="crosscoder",
    sae_layer="fc1",                       # anchor: sets h = 64 * expansion
    crosscoder_layers="fc2,fc3",           # additional layers sharing the code
    dataset_name="synthetic", directory_path=workdir,
    batch_size=64, sae_batch_size=64, sae_epochs=3,
    sae_optimizer_name="adam",             # plain adam: decoder norms stay free
    sae_expansion_factor=2,
    sae_lambda_sparse=0.05, dead_neurons_steps=100,
    use_activation_cache=True, cache_tokens_per_step=64, log_every=1000,
)

pipe = Pipeline(cfg)
before = pipe.eval_modified(epoch=0, store=False)
result = pipe.run()
print("\nCrosscoder over fc1 + fc2 + fc3 (one shared code):")
print(f"  summed per-layer MSE: {before['sae_rec_loss']:.4f} -> "
      f"{result['sae_rec_loss']:.4f}")
print(f"  spliced-model KLD vs original: {result['kld']:.5f}, "
      f"%same classification: {result['perc_same']:.3f}")

# the diffing readout: per-latent per-layer decoder-norm shares
import pandas as pd

folder = pipe.paths["sae_weights"]
csv = [f for f in os.listdir(folder) if f.endswith("_decoder_norms.csv")][0]
df = pd.read_csv(os.path.join(folder, csv))
shares = df[["share_fc1", "share_fc2", "share_fc3"]].to_numpy()
# a feature is "shared" when no single layer holds >60% of its decoder mass
shared = (shares.max(axis=1) < 0.6).sum()
specific = {l: int(((shares.argmax(axis=1) == i) & (shares.max(axis=1) >= 0.6)).sum())
            for i, l in enumerate(("fc1", "fc2", "fc3"))}
print(f"  latents: {len(df)} total; {shared} shared (<60% mass in any layer), "
      f"layer-specific: {specific}")
assert np.isfinite(shares).all()
print("OK")
