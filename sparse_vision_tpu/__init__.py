"""sparse-vision-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
the jasper3100/sparse-vision reference (training & evaluating sparse autoencoders on
intermediate activations of vision models, and discovering sparse feature circuits via
attribution-patching indirect effects).

Design conventions (TPU-first, deliberately different from the PyTorch reference):

- Activations are NHWC (channels on TPU lanes). The reference is NCHW; our data layer
  and backbones produce NHWC, and every parity test transposes accordingly.
- Conv feature maps are treated as token sets: ``[B, H, W, C] -> [B*H*W, C]``. This is the
  same token set as the reference's ``(b c h w) -> (b h w) c`` rearrange
  (reference: utils.py:2770-2774), but NHWC makes the reshape a free relayout on TPU.
- SAEs are pure functions over explicit parameter pytrees (dicts of arrays); the backbone
  is a Flax module whose apply returns ``(logits, taps)``. No forward hooks, no mutation
  (reference equivalent: model_pipeline.py:363-487 forward-hook machinery).
- Training steps are single jitted/pjit-sharded functions carrying
  ``(params, opt_state, dead-neuron counters, rng, step)``; the dead-neuron resample is a
  pure function executed under ``lax.cond`` on the step counter (reference:
  sae_mlp.py:79-184 in-place surgery + model_pipeline.py:771-794 schedule).
- Multi-chip scaling is a ``jax.sharding.Mesh`` with batch/token sharding over the 'data'
  axis and optional SAE-hidden sharding over 'model'; reductions ride XLA collectives.
  (The reference is single-device; its only concurrency is a cluster job array —
  see SURVEY.md §2.2.)
"""

__version__ = "0.1.0"
