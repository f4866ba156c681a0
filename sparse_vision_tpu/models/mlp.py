"""CustomMLP family — layer-for-layer equivalents of the reference's 10 MLP variants
(models/custom_mlp.py) plus the spliced-SAE demonstration model (CustomMLP9_SAE_fc1,
custom_mlp.py:230-281), built on the SeqNet tap/splice engine.

Stage naming matches the reference module names (fc1, act1, ...) so sae_layer strings
from legacy configs resolve unchanged. Tapping ``fc1`` yields the PRE-activation linear
output, exactly like a forward hook on the fc1 module.
"""

from __future__ import annotations

import jax

from sparse_vision_tpu.models.layers import SeqNet, flatten, linear, relu

# hidden widths per variant (reference custom_mlp.py; None entries = no activations)
MLP_SPECS = {
    "custom_mlp_1": ([256, 256], True),
    "custom_mlp_2": ([1024, 512, 256, 128], True),
    "custom_mlp_3": ([64, 32, 16], True),
    "custom_mlp_4": ([32, 16, 16], True),
    "custom_mlp_5": ([10, 10, 10], True),
    "custom_mlp_6": ([64, 32, 5, 16], True),
    "custom_mlp_7": ([32, 16, 16], False),  # same as 4 but without activations
    "custom_mlp_8": ([32, 16], True),
    "custom_mlp_9": ([16], True),
    "custom_mlp_10": ([10], True),
}


def make_mlp(name: str, num_classes: int = 10) -> SeqNet:
    widths, with_act = MLP_SPECS[name]
    stages = [flatten("flatten")]
    for i, w in enumerate(widths, start=1):
        stages.append(linear(f"fc{i}", w))
        if with_act:
            stages.append(relu(f"act{i}"))
    stages.append(linear(f"fc{len(widths) + 1}", num_classes))
    return SeqNet(stages)


def make_mlp9_with_sae(num_classes: int = 10) -> SeqNet:
    """CustomMLP9 with an SAE physically spliced after fc1 (custom_mlp.py:230-281).

    Used by the hook-vs-splice equivalence check (model_pipeline.py:1228): running
    custom_mlp_9 with a functional splice must equal running this model with the SAE
    weights baked in. Parameters: fc1, sae_encoder, sae_decoder, act1, fc2. The SAE
    centering (x - b_dec) is part of the forward.
    """
    import jax.numpy as jnp

    from sparse_vision_tpu.models.layers import Stage, linear

    def sae_block(name: str, hidden: int) -> Stage:
        def init(key, in_shape):
            import math

            (d,) = in_shape
            kw1, kb1, kw2, kb2 = jax.random.split(key, 4)
            b1 = 1.0 / math.sqrt(d)
            b2 = 1.0 / math.sqrt(hidden)
            params = {
                "W_enc": jax.random.uniform(kw1, (d, hidden), jnp.float32, -b1, b1),
                "b_enc": jax.random.uniform(kb1, (hidden,), jnp.float32, -b1, b1),
                "W_dec": jax.random.uniform(kw2, (hidden, d), jnp.float32, -b2, b2),
                "b_dec": jax.random.uniform(kb2, (d,), jnp.float32, -b2, b2),
            }
            return params, None, (d,)

        def apply(params, state, x, train):
            x_cent = x - params["b_dec"]
            enc = jax.nn.relu(x_cent @ params["W_enc"] + params["b_enc"])
            dec = enc @ params["W_dec"] + params["b_dec"]
            return dec, state, {"encoded": enc}

        return Stage(name, init, apply)

    return SeqNet(
        [
            flatten("flatten"),
            linear("fc1", 16),
            sae_block("sae_fc1", hidden=16),
            relu("act1"),
            linear("fc2", num_classes),
        ]
    )
