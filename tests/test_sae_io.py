"""Weight-only SAE export/import (VERDICT r1 item 8).

Reference parity target: save_model_weights / load_pretrained_model incl. the legacy
W_enc -> encoder.weight.T key migration (/root/reference/utils.py:187-225)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sparse_vision_tpu.models.sae import (
    gated_sae_apply,
    init_gated_sae,
    init_sae,
    init_sae_mlp,
    sae_mlp_apply,
)
from sparse_vision_tpu.train.sae_io import (
    import_any,
    load_sae_weights,
    save_sae_weights,
    to_torch_state_dict,
)

D, K = 16, 4


def test_npz_round_trip(tmp_path):
    params = init_sae_mlp(jax.random.key(0), D, K)
    path = save_sae_weights(params, str(tmp_path / "w"))
    loaded = load_sae_weights(path, "sae_mlp")
    for k in params:
        np.testing.assert_array_equal(np.asarray(loaded[k]), np.asarray(params[k]))


def test_torch_linear_convention_import(tmp_path):
    """A state_dict saved by the reference's SaeMLP (nn.Linear keys,
    sae_mlp.py:26-40) loads and computes the same reconstruction."""
    h = D * K
    rng = np.random.default_rng(0)
    sd = {
        "encoder.weight": torch.from_numpy(rng.normal(size=(h, D)).astype(np.float32)),
        "encoder.bias": torch.from_numpy(rng.normal(size=(h,)).astype(np.float32)),
        "decoder.weight": torch.from_numpy(rng.normal(size=(D, h)).astype(np.float32)),
        "decoder.bias": torch.from_numpy(rng.normal(size=(D,)).astype(np.float32)),
    }
    p = str(tmp_path / "ref_model_weights.pth")
    torch.save(sd, p)
    params = load_sae_weights(p, "sae_mlp")

    x = rng.normal(size=(8, D)).astype(np.float32)
    # torch forward (reference sae_mlp.py:42-53)
    xt = torch.from_numpy(x)
    x_cent = xt - sd["decoder.bias"]
    pre = torch.nn.functional.linear(x_cent, sd["encoder.weight"], sd["encoder.bias"])
    post = torch.relu(pre)
    recon_t = torch.nn.functional.linear(post, sd["decoder.weight"], sd["decoder.bias"])

    post_j, recon_j, pre_j = sae_mlp_apply(params, jnp.asarray(x))
    # tolerance covers matmul accumulation-order differences between backends
    np.testing.assert_allclose(np.asarray(recon_j), recon_t.numpy(), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(post_j), post.numpy(), rtol=2e-4, atol=1e-4)


def test_legacy_w_enc_convention_import(tmp_path):
    """The older W_enc/W_dec layout the reference migrates on load
    (utils.py:210-221): stored W_enc is [d, h] (= encoder.weight.T)."""
    h = D * K
    rng = np.random.default_rng(1)
    w_enc = rng.normal(size=(D, h)).astype(np.float32)
    w_dec = rng.normal(size=(h, D)).astype(np.float32)
    b_enc = rng.normal(size=(h,)).astype(np.float32)
    b_dec = rng.normal(size=(D,)).astype(np.float32)
    sd = {k: torch.from_numpy(v) for k, v in
          dict(W_enc=w_enc, b_enc=b_enc, W_dec=w_dec, b_dec=b_dec).items()}
    p = str(tmp_path / "legacy.pth")
    torch.save(sd, p)
    params = load_sae_weights(p, "sae_mlp")
    np.testing.assert_array_equal(np.asarray(params["W_enc"]), w_enc)
    np.testing.assert_array_equal(np.asarray(params["W_dec"]), w_dec)
    np.testing.assert_array_equal(np.asarray(params["b_enc"]), b_enc)
    np.testing.assert_array_equal(np.asarray(params["b_dec"]), b_dec)


def test_gated_torch_round_trip(tmp_path):
    """Export to the reference's GatedSae key layout and re-import: identity, and the
    torch-layout shapes match gated_sae.py:11-26."""
    params = init_gated_sae(jax.random.key(2), D, K)
    sd = to_torch_state_dict(params, "gated_sae")
    assert sd["W_gate"].shape == (D * K, D)  # torch [h, d]
    assert sd["decoder.weight"].shape == (D, D * K)  # torch nn.Linear(h, d)
    p = str(tmp_path / "gated.pth")
    # np.array copy: jax buffers are read-only and torch.from_numpy on a
    # non-writable array warns (undefined behavior on write)
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, p)
    loaded = load_sae_weights(p, "gated_sae")
    for k in params:
        np.testing.assert_allclose(np.asarray(loaded[k]), np.asarray(params[k]), rtol=1e-6)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(8, D)).astype(np.float32))
    enc_a, dec_a, *_ = gated_sae_apply(params, x)
    enc_b, dec_b, *_ = gated_sae_apply(loaded, x)
    np.testing.assert_allclose(np.asarray(dec_a), np.asarray(dec_b), rtol=1e-6)


def test_import_any_validates_shapes(tmp_path):
    params = init_sae_mlp(jax.random.key(0), D, K)
    wrong = init_sae_mlp(jax.random.key(0), D, K + 1)
    path = save_sae_weights(wrong, str(tmp_path / "w"))
    with pytest.raises(ValueError, match="shape mismatch"):
        import_any(path, "sae_mlp", like=params)


def test_pipeline_trains_then_exports_and_reimports(tmp_path):
    """e2e: training writes the sae_weights folder (.npz + torch .pth); a new run with
    sae_weights_path starts from those exact weights."""
    import glob
    import os

    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        directory_path=str(tmp_path), dataset_name="synthetic", sae_epochs=1,
        sae_batch_size=64, sae_expansion_factor=2, dead_neurons_steps=10_000,
        log_every=1000,
    )
    pipe = Pipeline(cfg)
    pipe.train_sae()
    npz = glob.glob(os.path.join(pipe.paths["sae_weights"], "*_model_weights.npz"))
    pth = glob.glob(os.path.join(pipe.paths["sae_weights"], "*_model_weights.pth"))
    assert npz and pth

    cfg2 = RunConfig(
        directory_path=str(tmp_path / "fresh"), dataset_name="synthetic",
        sae_weights_path=npz[0], training=False, log_every=1000,
    )
    pipe2 = Pipeline(cfg2)
    for k in pipe.ts.params:
        np.testing.assert_array_equal(
            np.asarray(pipe2.ts.params[k]), np.asarray(pipe.ts.params[k])
        )
    # and the torch export loads back to the same weights too
    cfg3 = RunConfig(
        directory_path=str(tmp_path / "fresh2"), dataset_name="synthetic",
        sae_weights_path=pth[0], training=False, log_every=1000,
    )
    pipe3 = Pipeline(cfg3)
    for k in pipe.ts.params:
        np.testing.assert_allclose(
            np.asarray(pipe3.ts.params[k]), np.asarray(pipe.ts.params[k]), rtol=1e-6
        )


# ---- SAELens interop (community publishing format) --------------------------


@pytest.mark.parametrize("name", ["sae_mlp", "gated_sae", "jumprelu_sae",
                                  "topk_sae"])
def test_saelens_round_trip(tmp_path, name):
    from sparse_vision_tpu.train.sae_io import (
        load_sae_saelens,
        save_sae_saelens,
    )

    params = init_sae(name, jax.random.key(0), 16, 4)
    folder = save_sae_saelens(params, name, str(tmp_path / "saelens"))
    # cfg.json carries the SAELens identity fields
    import json

    with open(f"{folder}/cfg.json") as f:
        cfg = json.load(f)
    assert cfg["d_in"] == 16 and cfg["d_sae"] == 64
    assert cfg["apply_b_dec_to_input"] is True
    # architecture inferred from cfg.json — no explicit variant needed
    loaded, cfg2 = load_sae_saelens(folder)
    assert cfg2 == cfg
    assert set(loaded) == set(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(loaded[k]),
                                   np.asarray(params[k]), rtol=1e-6, atol=0)


def test_saelens_published_layout_loads_with_native_math(tmp_path):
    """A file in the layout SAELens itself publishes (W_enc [d_in, d_sae],
    W_dec [d_sae, d_in], linear jumprelu threshold) must load into params that
    reproduce the standard SAE math — pins the no-transpose mapping."""
    from safetensors.numpy import save_file

    from sparse_vision_tpu.models.sae import sae_mlp_apply
    from sparse_vision_tpu.train.sae_io import load_sae_saelens

    rng = np.random.RandomState(0)
    d, h = 8, 32
    tensors = {
        "W_enc": rng.randn(d, h).astype(np.float32),
        "b_enc": rng.randn(h).astype(np.float32),
        "W_dec": rng.randn(h, d).astype(np.float32),
        "b_dec": rng.randn(d).astype(np.float32),
    }
    path = str(tmp_path / "w.safetensors")
    save_file(tensors, path)
    params, cfg = load_sae_saelens(path, "sae_mlp")
    assert cfg == {}  # bare file: no cfg.json
    x = jnp.asarray(rng.randn(5, d).astype(np.float32))
    encoded, decoded, _ = sae_mlp_apply(params, x)
    xc = np.asarray(x) - tensors["b_dec"]
    want_enc = np.maximum(xc @ tensors["W_enc"] + tensors["b_enc"], 0.0)
    want_dec = want_enc @ tensors["W_dec"] + tensors["b_dec"]
    np.testing.assert_allclose(np.asarray(encoded), want_enc, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(decoded), want_dec, rtol=1e-5,
                               atol=1e-6)


def test_saelens_jumprelu_threshold_mapping(tmp_path):
    from sparse_vision_tpu.train.sae_io import (
        load_sae_saelens,
        save_sae_saelens,
    )

    params = init_sae("jumprelu_sae", jax.random.key(1), 8, 2)
    folder = save_sae_saelens(params, "jumprelu_sae", str(tmp_path / "jr"))
    loaded, cfg = load_sae_saelens(folder)
    assert cfg["architecture"] == "jumprelu"
    np.testing.assert_allclose(np.asarray(loaded["log_threshold"]),
                               np.asarray(params["log_threshold"]),
                               rtol=1e-6, atol=1e-7)


def test_saelens_import_any_and_pipeline_path(tmp_path):
    """import_any (the Pipeline's sae_weights_path entry) accepts a SAELens
    artifact directory and validates shapes."""
    from sparse_vision_tpu.train.sae_io import import_any, save_sae_saelens

    params = init_sae("sae_mlp", jax.random.key(2), 16, 4)
    folder = save_sae_saelens(params, "sae_mlp", str(tmp_path / "art"))
    like = init_sae("sae_mlp", jax.random.key(3), 16, 4)
    got = import_any(folder, "sae_mlp", like)
    np.testing.assert_allclose(np.asarray(got["W_dec"]),
                               np.asarray(params["W_dec"]), rtol=1e-6, atol=0)
    wrong = init_sae("sae_mlp", jax.random.key(3), 16, 8)
    with pytest.raises(ValueError, match="shape mismatch"):
        import_any(folder, "sae_mlp", wrong)
