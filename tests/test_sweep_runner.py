"""Sweep-runner tests: host assignment determinism + subprocess execution of a tiny
sweep with result aggregation through per-run files."""

import os

from sparse_vision_tpu.config import RunConfig, Sweep
from sparse_vision_tpu.parallel.sweep_runner import assign_to_host, run_sweep_local


def test_assign_to_host_partitions_exactly():
    cfgs = [RunConfig(seed=i) for i in range(10)]
    shards = [assign_to_host(cfgs, 3, h) for h in range(3)]
    assert sorted(c.seed for s in shards for c in s) == list(range(10))
    assert [len(s) for s in shards] == [4, 3, 3]
    # deterministic
    assert [c.seed for c in assign_to_host(cfgs, 3, 1)] == [1, 4, 7]


def test_run_sweep_local_subprocesses(tmp_path):
    base = RunConfig(
        model_name="custom_mlp_9", sae_layer="fc1", dataset_name="synthetic",
        directory_path=str(tmp_path / "runs"), sae_epochs=1, sae_batch_size=64,
        dead_neurons_steps=100, log_every=1000,
    )
    cfgs = list(Sweep(axes={"sae_lambda_sparse": [0.1, 1.0]}, base=base))
    results = run_sweep_local(cfgs, max_workers=1, env={"JAX_PLATFORMS": "cpu"})
    for r in results:
        assert r.returncode == 0, r.stdout_tail
    csv_path = os.path.join(
        str(tmp_path / "runs"), "custom_mlp_9", "synthetic",
        "evaluation_results_sae_mlp", "sae_eval_results.csv",
    )
    assert os.path.exists(csv_path)
    with open(csv_path) as f:
        assert len(f.read().strip().splitlines()) == 3  # header + 2 runs
