"""Multi-chip data-parallel SAE training on the 8-device CPU mesh: the sharded step
must produce the same numbers as the single-device step (SURVEY.md §2.2 TPU-native
equivalents; the reference has no distributed runtime to compare against)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sparse_vision_tpu.models.backbone import init_backbone, make_backbone
from sparse_vision_tpu.models.sae import init_sae
from sparse_vision_tpu.ops import optim
from sparse_vision_tpu.ops.losses import get_criterion
from sparse_vision_tpu.parallel.mesh import data_sharding, make_mesh, sae_param_sharding
from sparse_vision_tpu.train.steps import init_sae_train_state, make_sae_train_step


def _setup(rng, layer="fc1", d=16, k=4):
    net = make_backbone("custom_mlp_9", "mnist")
    frozen, state = init_backbone(net, jax.random.key(0), "mnist")
    sae_params = init_sae("sae_mlp", jax.random.key(1), d, k)
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts = init_sae_train_state(sae_params, tx, d * k)
    step = make_sae_train_step(
        net, layer, "sae_mlp", 0.1, tx, 1000, k, get_criterion("cross_entropy")
    )
    x = rng.normal(size=(64, 28, 28, 1)).astype(np.float32)
    y = rng.integers(0, 10, size=(64,))
    return net, frozen, state, ts, step, x, y


def test_data_parallel_matches_single_device(rng, cpu_devices):
    net, frozen, state, ts, step, x, y = _setup(rng)

    # single-device reference
    ts1, m1 = step(ts, frozen, state, jnp.asarray(x), jnp.asarray(y))

    # 8-way data parallel
    mesh = make_mesh((8,))
    bsh = data_sharding(mesh)
    xb = jax.device_put(jnp.asarray(x), bsh)
    yb = jax.device_put(jnp.asarray(y), bsh)
    rep = NamedSharding(mesh, P())
    ts_r = jax.device_put(ts, rep)
    frozen_r = jax.device_put(frozen, rep)
    ts8, m8 = step(ts_r, frozen_r, state, xb, yb)

    np.testing.assert_allclose(float(m8["sae_loss"]), float(m1["sae_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m8["kld"]), float(m1["kld"]), rtol=1e-4, atol=1e-6)
    for n in ts1.params:
        np.testing.assert_allclose(
            np.asarray(ts8.params[n]), np.asarray(ts1.params[n]), atol=1e-5,
            err_msg=f"param {n}",
        )
    np.testing.assert_array_equal(np.asarray(ts8.dead_acc), np.asarray(ts1.dead_acc))


def test_tensor_parallel_latents_compile_and_match(rng, cpu_devices):
    """2-D mesh (data=4, model=2): SAE latent dim sharded over 'model'."""
    net, frozen, state, ts, step, x, y = _setup(rng)
    ts1, m1 = step(ts, frozen, state, jnp.asarray(x), jnp.asarray(y))

    mesh = make_mesh((4, 2))
    bsh = NamedSharding(mesh, P("data"))
    psh = sae_param_sharding(mesh, ts.params)
    rep = NamedSharding(mesh, P())
    ts_s = ts._replace(
        params=jax.device_put(ts.params, psh),
        opt_state=jax.device_put(ts.opt_state, rep),
        dead_acc=jax.device_put(ts.dead_acc, NamedSharding(mesh, P("model"))),
    )
    frozen_r = jax.device_put(frozen, rep)
    ts2, m2 = step(
        ts_s, frozen_r, state,
        jax.device_put(jnp.asarray(x), bsh), jax.device_put(jnp.asarray(y), bsh),
    )
    np.testing.assert_allclose(float(m2["sae_loss"]), float(m1["sae_loss"]), rtol=1e-5)
    for n in ts1.params:
        np.testing.assert_allclose(
            np.asarray(ts2.params[n]), np.asarray(ts1.params[n]), atol=1e-5,
            err_msg=f"param {n}",
        )


def test_resample_under_sharding(rng, cpu_devices):
    """Scheduled dead-neuron resample must execute correctly with sharded batch."""
    net, frozen, state, ts, step_unused, x, y = _setup(rng)
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    # dead_neurons_steps=1 -> resample triggers at step 3 (2n+1)
    step = make_sae_train_step(
        net, "fc1", "sae_mlp", 0.1, tx, 1, 4, get_criterion("cross_entropy")
    )
    mesh = make_mesh((8,))
    bsh = data_sharding(mesh)
    rep = NamedSharding(mesh, P())
    ts = jax.device_put(ts, rep)
    frozen = jax.device_put(frozen, rep)
    xb = jax.device_put(jnp.asarray(x), bsh)
    yb = jax.device_put(jnp.asarray(y), bsh)
    for _ in range(4):
        ts, m = step(ts, frozen, state, xb, yb)
    assert int(ts.step) == 4
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(ts.params["W_dec"]), axis=1), 1.0, atol=1e-5
    )


def test_distributed_single_process_noop(cpu_devices):
    from sparse_vision_tpu.parallel import distributed

    assert distributed.initialize() == 1  # single process: no-op
    mesh = distributed.global_data_mesh()
    assert mesh.shape["data"] == 8
    assert distributed.process_local_batch_slice(64) == 64


def test_distributed_two_process_smoke(tmp_path):
    """jax.distributed across two REAL processes on localhost (the DCN tier's
    coordination path): initialize() reports process_count==2 and a cross-process
    allgather/psum returns both hosts' contributions. This is the multi-host claim
    in README/MIGRATION actually running with num_processes > 1."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    script = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from sparse_vision_tpu.parallel import distributed
n = distributed.initialize(coordinator_address=sys.argv[1], num_processes=2,
                           process_id=int(sys.argv[2]))
assert n == 2, n
import jax.numpy as jnp
from jax.experimental import multihost_utils
got = multihost_utils.process_allgather(jnp.array([jax.process_index() + 1.0]))
total = float(got.sum())
assert sorted(got.ravel().tolist()) == [1.0, 2.0], got
print(f"proc {sys.argv[2]} OK total={total}")
"""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=root + os.pathsep + os.environ.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen([sys.executable, "-c", script, coord, str(i)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}: {err[-2000:]}"
        assert f"proc {i} OK total=3.0" in out
