"""Transcoder quickstart: learn a sparse dictionary that maps fc1's activations
to fc2's (Dunefsky et al. 2024 "Transcoders find interpretable LLM feature
circuits" — here on a vision MLP), then inspect the spliced model's fidelity.

The paired training data (aligned [T, d_in] / [T, d_out] token caches) comes
from ONE backbone pass via dump_activations_multi — the framework's standard
multi-layer dump.

    JAX_PLATFORMS=cpu python examples/train_transcoder.py [workdir]

Runs on synthetic data / CPU in ~1 min.
"""

import sys
import tempfile

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested

pin_cpu_if_requested()  # site-hook quirk: see utils/platform.py

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.train.pipeline import Pipeline

workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="svt_tc_")

cfg = RunConfig(
    model_name="custom_mlp_8",            # fc1 [32] -> act1 -> fc2 [16] -> ...
    sae_model_name="transcoder",
    sae_layer="fc1",                       # the layer the transcoder READS
    transcoder_target_layer="fc2",         # the layer it PREDICTS
    dataset_name="synthetic", directory_path=workdir,
    batch_size=64, sae_batch_size=64, sae_epochs=3,
    sae_optimizer_name="constrained_adam", sae_expansion_factor=4,
    sae_lambda_sparse=0.05, dead_neurons_steps=100,
    use_activation_cache=True, cache_tokens_per_step=64, log_every=1000,
)

pipe = Pipeline(cfg)
before = pipe.eval_modified(epoch=0, store=False)
result = pipe.run()
print("\nTranscoder fc1 -> fc2 (replaces the act1/fc2 segment):")
print(f"  target-layer MSE: {before['sae_rec_loss']:.4f} -> {result['sae_rec_loss']:.4f}")
print(f"  target variance explained: {before['var_expl']:.3f} -> {result['var_expl']:.3f}")
print(f"  spliced-model KLD vs original: {result['kld']:.5f}, "
      f"%same classification: {result['perc_same']:.3f}")
print("OK")
