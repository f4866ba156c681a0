"""Multi-chip fused training + activation cache tests (8-device CPU mesh).

The sharded fused step must match the single-device fused step EXACTLY (f32,
interpret-mode kernels): pmean of local-mean grads == global-mean grads with equal
shards, dead masks AND-reduce, resample decisions replicate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_vision_tpu.data.activation_cache import ActivationCache, dump_activations
from sparse_vision_tpu.models.sae import init_sae
from sparse_vision_tpu.ops import optim
from sparse_vision_tpu.parallel.mesh import make_mesh
from sparse_vision_tpu.parallel.sharded_steps import (
    make_sharded_fused_train_step,
    put_sharded,
)
from sparse_vision_tpu.train.steps import (
    init_sae_train_state,
    make_sae_train_step_from_acts,
)

C, K, T = 128, 2, 256
FUSED_OPTS = dict(tile_t=32, tile_h=128, compute_dtype=jnp.float32, interpret=True)


def test_sharded_fused_matches_single_device(cpu_devices):
    mesh = make_mesh((8,))
    params = init_sae("sae_mlp", jax.random.key(0), C, K)
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    acts = jax.random.normal(jax.random.key(1), (T, C))

    ts_single = init_sae_train_state(params, tx, C * K)
    single = make_sae_train_step_from_acts(
        "sae_mlp", 0.5, tx, 50, K, fused=True, fused_opts=FUSED_OPTS
    )
    ts_shard = init_sae_train_state(params, tx, C * K)
    sharded = make_sharded_fused_train_step(mesh, 0.5, tx, 50, K, fused_opts=FUSED_OPTS)
    ts_shard, acts_sharded = put_sharded(mesh, ts_shard, acts)

    for step in range(3):
        ts_single, m_single = single(ts_single, acts)
        ts_shard, m_shard = sharded(ts_shard, acts_sharded)
        for k in ["sae_loss", "sae_rec_loss", "sae_l1_loss", "perc_dead"]:
            np.testing.assert_allclose(
                float(m_shard[k]), float(m_single[k]), rtol=1e-5, err_msg=f"{k}@{step}"
            )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        ts_shard.params, ts_single.params,
    )
    assert int(ts_shard.step) == int(ts_single.step) == 3
    np.testing.assert_array_equal(
        np.asarray(ts_shard.dead_acc), np.asarray(ts_single.dead_acc)
    )


def test_activation_cache_roundtrip(tmp_path):
    from sparse_vision_tpu.data.datasets import make_synthetic
    from sparse_vision_tpu.models.backbone import make_backbone
    from sparse_vision_tpu.models.sae import tokens_from_act

    net = make_backbone("custom_cnn_1", "cifar_10")
    params, state = net.init(jax.random.key(0), (32, 32, 3))
    ds = make_synthetic(num_samples=24, img_size=(32, 32, 3))

    meta = dump_activations(
        net, params, state, ds, "relu1", str(tmp_path), batch_size=8,
        shard_tokens=4096,
    )
    # 24 images, conv1 output 32x32x32 -> 24*1024 = 24576 tokens of dim 32
    assert meta["dim"] == 32 and meta["total_tokens"] == 24 * 32 * 32
    assert meta["num_shards"] == 6  # 24576 / 4096

    cache = ActivationCache(str(tmp_path))
    got = np.concatenate(list(cache.batches(4096, shuffle=False)), axis=0)
    assert got.shape == (24576, 32)

    # golden: first batch's tokens straight from the backbone
    _, taps, _ = net.apply(params, ds.images[:8], state=state, stop_at="relu1")
    tok, _ = tokens_from_act(taps["relu1"])
    np.testing.assert_allclose(got[: tok.shape[0]], np.asarray(tok), rtol=1e-6)

    # prefetch path equals non-prefetch path, shuffled order deterministic by seed
    a = np.concatenate(list(cache.batches(2048, shuffle=True, seed=3)), axis=0)
    b = np.concatenate(
        list(cache.batches(2048, shuffle=True, seed=3, prefetch=False)), axis=0
    )
    np.testing.assert_array_equal(a, b)


def test_cache_feeds_fused_training(tmp_path, cpu_devices):
    """End-to-end production path: dump cache -> sharded fused training over it."""
    from sparse_vision_tpu.data.datasets import make_synthetic
    from sparse_vision_tpu.models.backbone import make_backbone

    net = make_backbone("custom_cnn_1", "cifar_10")
    params, state = net.init(jax.random.key(0), (32, 32, 3))
    ds = make_synthetic(num_samples=16, img_size=(32, 32, 3))
    dump_activations(net, params, state, ds, "relu1", str(tmp_path), batch_size=8,
                     shard_tokens=4096)
    cache = ActivationCache(str(tmp_path))

    mesh = make_mesh((8,))
    sae_params = init_sae("sae_mlp", jax.random.key(1), cache.dim, 2)
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts = init_sae_train_state(sae_params, tx, cache.dim * 2)
    step = make_sharded_fused_train_step(mesh, 0.1, tx, 1000, 2, fused_opts=FUSED_OPTS)

    losses = []
    for _ in range(2):
        for tok in cache.batches(2048, shuffle=True, seed=0):
            ts_in, tok_in = put_sharded(mesh, ts, jnp.asarray(tok))
            ts, m = step(ts_in, tok_in)
            losses.append(float(m["sae_loss"]))
    assert losses[-1] < losses[0]  # it learns


def test_sharded_resample_crosses_boundary_with_parity(cpu_devices):
    """Run ENOUGH steps to trigger the dead-neuron resample (n=2 -> resample at step
    5) on both the sharded and single-device paths; dead masks, resample surgery, and
    subsequent training must stay in exact agreement (replicated rng/step => identical
    resample decisions and draws on every chip)."""
    from sparse_vision_tpu.ops.resample import should_resample

    assert bool(should_resample(jnp.int32(5), 2))  # the window we cross

    mesh = make_mesh((8,))
    params = init_sae("sae_mlp", jax.random.key(0), C, K)
    # bias encoder down so some latents are genuinely dead and get resampled
    params = {**params, "b_enc": params["b_enc"] - 2.0}
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    acts = jax.random.normal(jax.random.key(1), (T, C))

    ts_single = init_sae_train_state(params, tx, C * K)
    single = make_sae_train_step_from_acts(
        "sae_mlp", 0.5, tx, 2, K, fused=True, fused_opts=FUSED_OPTS
    )
    ts_shard = init_sae_train_state(params, tx, C * K)
    sharded = make_sharded_fused_train_step(mesh, 0.5, tx, 2, K, fused_opts=FUSED_OPTS)
    ts_shard, acts_sharded = put_sharded(mesh, ts_shard, acts)

    resampled_any = False
    for step in range(7):
        before = np.asarray(ts_single.params["W_enc"])
        ts_single, m_single = single(ts_single, acts)
        ts_shard, m_shard = sharded(ts_shard, acts_sharded)
        if not np.array_equal(before, np.asarray(ts_single.params["W_enc"])) and \
           bool(should_resample(jnp.int32(step + 1), 2)):
            resampled_any = True
        np.testing.assert_allclose(
            float(m_shard["perc_dead"]), float(m_single["perc_dead"]),
            rtol=1e-6, err_msg=f"step {step}",
        )
    assert resampled_any or float(m_single["perc_dead"]) == 0.0
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        ts_shard.params, ts_single.params,
    )
    np.testing.assert_array_equal(
        np.asarray(ts_shard.dead_acc), np.asarray(ts_single.dead_acc)
    )


def test_pipeline_cached_sharded_matches_single_device(tmp_path_factory, cpu_devices):
    """The PRODUCTION path: RunConfig(mesh_shape=(8,), use_activation_cache=True)
    drives the sharded step from the Pipeline itself and matches the single-device
    cached run (same seed → same cache, same token order, same resample schedule)."""
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    def run(mesh_shape):
        d = tmp_path_factory.mktemp(f"mesh{len(mesh_shape)}")
        cfg = RunConfig(
            model_name="custom_mlp_9", sae_model_name="sae_mlp", sae_layer="fc1",
            directory_path=str(d), dataset_name="synthetic",
            model_epochs=1, model_learning_rate=1e-2, batch_size=64,
            model_optimizer_name="adam",
            sae_epochs=2, sae_learning_rate=1e-3,
            sae_optimizer_name="constrained_adam", sae_batch_size=64,
            sae_lambda_sparse=0.1, sae_expansion_factor=2,
            dead_neurons_steps=3,  # resample boundary inside the 8-step run
            use_activation_cache=True, cache_tokens_per_step=128,
            mesh_shape=mesh_shape, log_every=1000,
            original_model=False, training=True,
        )
        pipe = Pipeline(cfg)
        res = pipe.train_sae()
        return pipe, res

    pipe1, res1 = run(())
    pipe8, res8 = run((8,))
    assert int(pipe1.ts.step) == int(pipe8.ts.step) > 0
    for k in ("sae_rec_loss", "sae_loss", "perc_dead_units"):
        np.testing.assert_allclose(res8[k], res1[k], rtol=1e-4, err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        pipe8.ts.params, pipe1.ts.params,
    )
    np.testing.assert_array_equal(
        np.asarray(pipe8.ts.dead_acc), np.asarray(pipe1.ts.dead_acc)
    )


def test_sharded_step_gated_and_jumprelu(cpu_devices):
    """The generalized sharded step dispatches gated/jumprelu losses (stock path per
    chip) and matches the single-device step."""
    mesh = make_mesh((8,))
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    acts = jax.random.normal(jax.random.key(1), (T, C))
    for name in ("gated_sae", "jumprelu_sae"):
        params = init_sae(name, jax.random.key(0), C, K)
        ts_single = init_sae_train_state(params, tx, C * K)
        single = make_sae_train_step_from_acts(name, 0.5, tx, 50, K, fused=False)
        ts_shard = init_sae_train_state(params, tx, C * K)
        sharded = make_sharded_fused_train_step(
            mesh, 0.5, tx, 50, K, fused=False, sae_model_name=name
        )
        ts_shard, acts_sharded = put_sharded(mesh, ts_shard, acts)
        for step in range(2):
            ts_single, m_single = single(ts_single, acts)
            ts_shard, m_shard = sharded(ts_shard, acts_sharded)
            np.testing.assert_allclose(
                float(m_shard["sae_loss"]), float(m_single["sae_loss"]),
                rtol=1e-5, err_msg=f"{name}@{step}",
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            ),
            ts_shard.params, ts_single.params,
        )


def test_bf16_activation_cache(tmp_path):
    """bfloat16 cache storage: half the bytes, exact bf16 roundtrip through all three
    read paths, and it feeds the fused train step directly."""
    import ml_dtypes

    from sparse_vision_tpu.data.datasets import make_synthetic
    from sparse_vision_tpu.models.backbone import make_backbone

    net = make_backbone("custom_cnn_1", "cifar_10")
    params, state = net.init(jax.random.key(0), (32, 32, 3))
    ds = make_synthetic(num_samples=8, img_size=(32, 32, 3))
    meta = dump_activations(net, params, state, ds, "relu1", str(tmp_path),
                            batch_size=4, shard_tokens=2048,
                            dtype=ml_dtypes.bfloat16)
    assert meta["dtype"] == "bfloat16"
    cache = ActivationCache(str(tmp_path))
    a = np.concatenate(list(cache.batches(1024, prefetch=False)))
    assert a.dtype == ml_dtypes.bfloat16
    b = np.concatenate([np.array(x) for x in cache.batches(1024, prefetch=True)])
    np.testing.assert_array_equal(a.view(np.uint16), b.view(np.uint16))

    # fused step consumes bf16 tokens directly (operand cast is a no-op)
    sae_params = init_sae("sae_mlp", jax.random.key(1), cache.dim, 2)
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts = init_sae_train_state(sae_params, tx, cache.dim * 2)
    step = make_sae_train_step_from_acts("sae_mlp", 0.1, tx, 1000, 2, fused=True,
                                         fused_opts=FUSED_OPTS)
    ts, m = step(ts, jnp.asarray(a[:1024]))
    assert np.isfinite(float(m["sae_loss"]))


def test_dump_activations_sharded_matches_single_device(tmp_path, cpu_devices):
    """The activation-dump tap pass under a data mesh writes the SAME cache as the
    single-device dump (per-sample conv/BN math is batch-independent)."""
    from sparse_vision_tpu.data.datasets import make_synthetic
    from sparse_vision_tpu.models.backbone import init_backbone, make_backbone
    from sparse_vision_tpu.parallel.mesh import data_sharding

    net = make_backbone("custom_cnn_1", "cifar_10")
    ds = make_synthetic(num_samples=128, seed=0, img_size=(32, 32, 3), num_classes=10)
    params, state = init_backbone(net, jax.random.key(0), "cifar_10")

    d1 = str(tmp_path / "single")
    d8 = str(tmp_path / "mesh8")
    meta1 = dump_activations(net, params, state, ds, "conv2", d1, batch_size=32)
    mesh = make_mesh((8,))
    meta8 = dump_activations(net, params, state, ds, "conv2", d8, batch_size=32,
                             sharding=data_sharding(mesh))
    assert meta1["total_tokens"] == meta8["total_tokens"] > 0
    c1, c8 = ActivationCache(d1), ActivationCache(d8)
    for a, b in zip(c1.batches(512, shuffle=False), c8.batches(512, shuffle=False)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
