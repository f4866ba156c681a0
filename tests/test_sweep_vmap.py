"""Vmapped hyperparameter sweeps (train/sweep_vmap.py): N same-shape SAEs in one
jitted step must be indistinguishable from N independent runs.

The reference's sweep is N independent cluster jobs over parameters.txt lines
(README.md:13-15, main.py:63-113); here the jobs fuse into one batched step, so
the tests pin (a) bitwise step-level parity per combo incl. a resample boundary,
(b) every SAE variant running under the sweep step, (c) end-to-end artifact
parity (checkpoints, results rows) against individual Pipeline runs."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.models.sae import init_sae
from sparse_vision_tpu.ops import optim
from sparse_vision_tpu.train.steps import (
    init_sae_train_state,
    make_sae_train_step_from_acts,
)
from sparse_vision_tpu.train.sweep_vmap import (
    make_sae_sweep_step,
    stack_sae_states,
    train_sae_sweep_cached,
    unstack_sae_state,
)

D, EF = 16, 4
H = D * EF


def _run_individual(sae_name, lam, lr, seed, acts, optimizer, ndead, **kw):
    tx = optim.get_optimizer(optimizer, lr)
    p = init_sae(sae_name, jax.random.key(seed), D, EF)
    ts = init_sae_train_state(p, tx, H, seed=seed)
    step = make_sae_train_step_from_acts(sae_name, lam, tx, ndead, EF, **kw)
    for a in acts:
        ts, m = step(ts, jnp.asarray(a))
    return ts, m


def _run_sweep(sae_name, lambdas, lrs, seeds, acts, optimizer, ndead, **kw):
    states = []
    for lam, lr, sd in zip(lambdas, lrs, seeds):
        tx = optim.get_optimizer(optimizer, lr)
        p = init_sae(sae_name, jax.random.key(sd), D, EF)
        states.append(init_sae_train_state(p, tx, H, seed=sd))
    ss = stack_sae_states(states)
    step = make_sae_sweep_step(sae_name, lambdas, lrs, optimizer, ndead, EF, **kw)
    for a in acts:
        ss, m = step(ss, jnp.asarray(a))
    return ss, m


def test_sweep_step_bitwise_parity_across_resample():
    """9 steps with dead_neurons_steps=4 crosses the resample at step 2n+1=9
    (ops/resample.should_resample); params, dead_acc, and rng streams must match
    the independent runs bit for bit."""
    lambdas, lrs, seeds = [0.1, 0.5, 0.1], [1e-3, 1e-3, 3e-3], [0, 0, 7]
    acts = np.random.RandomState(0).randn(9, 64, D).astype(np.float32)
    ss, _ = _run_sweep("sae_mlp", lambdas, lrs, seeds, acts, "constrained_adam", 4)
    for i, (lam, lr, sd) in enumerate(zip(lambdas, lrs, seeds)):
        ts, _ = _run_individual("sae_mlp", lam, lr, sd, acts, "constrained_adam", 4)
        si = unstack_sae_state(ss, i)
        for k in ts.params:
            np.testing.assert_array_equal(
                np.asarray(ts.params[k]), np.asarray(si.params[k]), err_msg=f"{i}/{k}"
            )
        np.testing.assert_array_equal(np.asarray(ts.dead_acc), np.asarray(si.dead_acc))
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(ts.rng)),
            np.asarray(jax.random.key_data(si.rng)),
        )
        assert int(ts.step) == int(si.step) == 9


@pytest.mark.parametrize(
    "sae_name,kw",
    [
        ("gated_sae", {}),
        ("jumprelu_sae", {"jumprelu_bandwidth": 1e-3}),
        ("topk_sae", {"topk": 4}),
        ("matryoshka_sae", {"matryoshka_prefixes": (0.25, 1.0)}),
    ],
)
def test_sweep_step_all_variants_match_single_runs(sae_name, kw):
    lambdas, lrs, seeds = [0.05, 0.2], [1e-3, 2e-3], [1, 2]
    acts = np.random.RandomState(1).randn(3, 32, D).astype(np.float32)
    ss, ms = _run_sweep(sae_name, lambdas, lrs, seeds, acts, "adam", 100, **kw)
    assert ms["sae_loss"].shape == (2,)
    for i, (lam, lr, sd) in enumerate(zip(lambdas, lrs, seeds)):
        ts, m = _run_individual(sae_name, lam, lr, sd, acts, "adam", 100, **kw)
        si = unstack_sae_state(ss, i)
        for k in ts.params:
            np.testing.assert_allclose(
                np.asarray(ts.params[k]), np.asarray(si.params[k]),
                rtol=1e-6, atol=1e-7, err_msg=f"{i}/{k}",
            )
        np.testing.assert_allclose(
            float(m["sae_loss"]), float(ms["sae_loss"][i]), rtol=1e-6
        )


def _base_cfg(tmp_path, **kw):
    defaults = dict(
        model_name="custom_mlp_9",
        sae_model_name="sae_mlp",
        sae_layer="fc1",
        directory_path=str(tmp_path),
        dataset_name="synthetic",
        batch_size=64,
        sae_epochs=1,
        sae_learning_rate=1e-3,
        sae_optimizer_name="constrained_adam",
        sae_batch_size=64,
        sae_lambda_sparse=0.1,
        sae_expansion_factor=2,
        dead_neurons_steps=10_000,
        log_every=1000,
        original_model=False,
        training=True,
        use_activation_cache=True,
        cache_tokens_per_step=64,
    )
    defaults.update(kw)
    return RunConfig(**defaults)


def test_sweep_cached_e2e_matches_individual_runs(tmp_path):
    """Full orchestrator vs two individual train_sae_cached runs: same final
    eval rows, same checkpoint params (the sweep shares one cache + backbone,
    combos differ in lambda so their individual runs share the data order)."""
    from sparse_vision_tpu.eval_tools.results import read_results
    from sparse_vision_tpu.train import checkpoint as ckpt
    from sparse_vision_tpu.train.pipeline import Pipeline

    overrides = [{"sae_lambda_sparse": 0.05}, {"sae_lambda_sparse": 0.3}]

    sweep_cfg = _base_cfg(tmp_path / "sweep")
    sweep_results = train_sae_sweep_cached(sweep_cfg, overrides)
    assert len(sweep_results) == 2

    individual_results = []
    indiv_pipes = []
    for ov in overrides:
        cfg = dataclasses.replace(_base_cfg(tmp_path / "indiv"), **ov)
        pipe = Pipeline(cfg)
        individual_results.append(pipe.train_sae())
        indiv_pipes.append(pipe)

    for r_sweep, r_ind in zip(sweep_results, individual_results):
        for k in ("sae_rec_loss", "sae_loss", "sparsity", "perc_dead_units", "kld"):
            np.testing.assert_allclose(
                float(r_sweep[k]), float(r_ind[k]), rtol=1e-5, atol=1e-7,
                err_msg=k,
            )

    # checkpoints: per-combo dirs exist and params match the individual runs'
    for ov, ind_pipe in zip(overrides, indiv_pipes):
        cfg_s = dataclasses.replace(
            _base_cfg(tmp_path / "sweep"), sae_checkpoint_epoch=1, **ov
        )
        pipe_s = Pipeline(cfg_s)  # restores the sweep's epoch-1 checkpoint
        assert ckpt.latest_epoch(pipe_s._sae_ckpt_dir()) == 1
        assert int(pipe_s.ts.step) == int(ind_pipe.ts.step)
        for k in pipe_s.ts.params:
            np.testing.assert_allclose(
                np.asarray(pipe_s.ts.params[k]),
                np.asarray(ind_pipe.ts.params[k]),
                rtol=1e-6, atol=1e-7, err_msg=f"{ov}/{k}",
            )

    # results CSV has one epoch-1 row per combo
    csv_path = os.path.join(
        Pipeline(_base_cfg(tmp_path / "sweep")).paths["evaluation_results"],
        "sae_eval_results.csv",
    )
    rows = read_results(csv_path)
    lambdas = sorted(float(r["lambda_sparse"]) for r in rows if r["epochs"] == 1)
    assert lambdas == [0.05, 0.3]


@pytest.mark.parametrize(
    "sae_name,kw",
    [
        ("sae_mlp", {}),
        ("gated_sae", {}),
        ("matryoshka_sae", {"matryoshka_prefixes": (0.25, 1.0)}),
    ],
)
def test_sweep_step_fused_matches_stock(sae_name, kw):
    """fused=True (interpret-mode Pallas under vmap) matches the stock sweep step
    per combo — the large-SAE sweep configuration."""
    lambdas, lrs, seeds = [0.05, 0.2], [1e-3, 2e-3], [1, 2]
    # fused-kernel tile quanta: latent tiles are 128-lane aligned (same shapes as
    # tests/test_fused_sae.py)
    c, ef = 128, 4  # h = 512
    fused_opts = {"interpret": True, "compute_dtype": jnp.float32,
                  "tile_t": 32, "tile_h": 128}
    acts = np.random.RandomState(3).randn(2, 64, c).astype(np.float32)

    def run(fused):
        states = []
        for lam, lr, sd in zip(lambdas, lrs, seeds):
            tx = optim.get_optimizer("adam", lr)
            p = init_sae(sae_name, jax.random.key(sd), c, ef)
            states.append(init_sae_train_state(p, tx, c * ef, seed=sd))
        ss = stack_sae_states(states)
        step = make_sae_sweep_step(
            sae_name, lambdas, lrs, "adam", 100, ef,
            fused=fused, fused_opts=fused_opts if fused else None, **kw,
        )
        for a in acts:
            ss, m = step(ss, jnp.asarray(a))
        return ss, m

    ss_f, m_f = run(True)
    ss_s, m_s = run(False)
    for i in range(2):
        sf, sst = unstack_sae_state(ss_f, i), unstack_sae_state(ss_s, i)
        for k in sf.params:
            # tolerance note: a pre-activation sitting exactly at the ReLU
            # boundary can flip between the two float implementations, moving
            # ONE weight by ~1e-5 after the Adam step — real kernel bugs
            # diverge everywhere, not 1 element in 65k
            np.testing.assert_allclose(
                np.asarray(sf.params[k]), np.asarray(sst.params[k]),
                rtol=2e-3, atol=5e-5, err_msg=f"{i}/{k}",
            )
    np.testing.assert_allclose(
        np.asarray(m_f["sae_loss"]), np.asarray(m_s["sae_loss"]), rtol=1e-5
    )


def test_group_sweepable_partitions():
    """Grouping: cached SAE-train entries differing only in sweepable fields fuse;
    eval/MIS/live-train/singleton entries run individually, order preserved."""
    from sparse_vision_tpu.train.sweep_vmap import group_sweepable

    base = _base_cfg("/tmp/unused")
    cfgs = [
        dataclasses.replace(base, sae_lambda_sparse=0.1),
        dataclasses.replace(base, sae_lambda_sparse=0.2),
        dataclasses.replace(base, training=False),  # eval entry: never grouped
        dataclasses.replace(base, sae_expansion_factor=4),  # different shape
        dataclasses.replace(base, sae_lambda_sparse=0.3, sae_learning_rate=2e-3),
    ]
    groups, singles = group_sweepable(cfgs)
    assert len(groups) == 1
    gbase, overrides = groups[0]
    assert [ov["sae_lambda_sparse"] for ov in overrides] == [0.1, 0.2, 0.3]
    assert overrides[2]["sae_learning_rate"] == 2e-3
    assert len(singles) == 2
    assert singles[0].training is False
    assert singles[1].sae_expansion_factor == 4

    # live-training (no cache) entries never group
    live = [
        dataclasses.replace(base, use_activation_cache=False, sae_lambda_sparse=lv)
        for lv in (0.1, 0.2)
    ]
    g2, s2 = group_sweepable(live)
    assert not g2 and len(s2) == 2

    # seed-only sweeps have COLLIDING run identities (the parameter string
    # excludes seed, utils/paths.py) — they must fall back to individual runs
    # instead of tripping the orchestrator's duplicate guard
    seeds = [dataclasses.replace(base, seed=s) for s in (0, 1, 2)]
    g3, s3 = group_sweepable(seeds)
    assert not g3 and len(s3) == 3

    # crosscoder entries group (train_crosscoder_sweep_cached) — except under a
    # mesh, where they run individually on their TP/GSPMD paths
    cc = [
        dataclasses.replace(base, sae_model_name="crosscoder",
                            crosscoder_layers="fc2,fc3", sae_optimizer_name="adam",
                            sae_lambda_sparse=lv)
        for lv in (0.1, 0.2)
    ]
    g4, s4 = group_sweepable(cc)
    assert len(g4) == 1 and not s4
    cc_mesh = [dataclasses.replace(c, mesh_shape=(8,)) for c in cc]
    g5, s5 = group_sweepable(cc_mesh)
    assert not g5 and len(s5) == 2


def test_cli_vmap_sweep(tmp_path):
    """--run_pipeline --parameters --vmap_sweep trains grouped combos in one
    vmapped sweep and still runs the leftover eval entry individually."""
    from sparse_vision_tpu.cli import main as cli_main
    from sparse_vision_tpu.eval_tools.results import read_results
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfgs = [
        _base_cfg(tmp_path, sae_lambda_sparse=0.05),
        _base_cfg(tmp_path, sae_lambda_sparse=0.3),
    ]
    params_path = str(tmp_path / "sweep.jsonl")
    with open(params_path, "w") as f:
        for c in cfgs:
            f.write(c.to_json() + "\n")
    rc = cli_main(["--run_pipeline", "--parameters", params_path, "--vmap_sweep"])
    assert rc == 0
    csv_path = os.path.join(
        Pipeline(cfgs[0]).paths["evaluation_results"], "sae_eval_results.csv"
    )
    rows = read_results(csv_path)
    lambdas = sorted(float(r["lambda_sparse"]) for r in rows if r["epochs"] == 1)
    assert lambdas == [0.05, 0.3]


def test_sweep_data_mesh_matches_unsharded(tmp_path):
    """mesh_shape=(8,): the sweep shards token blocks over 'data' via GSPMD with
    replicated stacked states, and matches the unsharded sweep's results."""
    overrides = [{"sae_lambda_sparse": 0.05}, {"sae_lambda_sparse": 0.3}]
    r_plain = train_sae_sweep_cached(_base_cfg(tmp_path / "plain"), overrides)
    r_mesh = train_sae_sweep_cached(
        _base_cfg(tmp_path / "mesh", mesh_shape=(8,)), overrides
    )
    for rp, rm in zip(r_plain, r_mesh):
        for k in ("sae_rec_loss", "sae_loss", "sparsity"):
            np.testing.assert_allclose(
                float(rm[k]), float(rp[k]), rtol=1e-4, err_msg=k
            )

    # tensor-parallel meshes cannot compose with the vmapped latent layout
    with pytest.raises(ValueError, match="tensor parallelism"):
        train_sae_sweep_cached(
            _base_cfg(tmp_path / "tp", mesh_shape=(2, 4)), overrides
        )


def test_sweep_checkpoint_resume_matches_straight_run(tmp_path):
    """A sweep resumed from its epoch-1 checkpoints (sae_checkpoint_epoch=1)
    matches the straight 2-epoch sweep — the per-combo Pipeline restore feeds
    stack_sae_states, which requires all combos at the same step."""
    overrides = [{"sae_lambda_sparse": 0.05}, {"sae_lambda_sparse": 0.3}]
    r_straight = train_sae_sweep_cached(
        _base_cfg(tmp_path / "straight", sae_epochs=2), overrides
    )
    train_sae_sweep_cached(_base_cfg(tmp_path / "resume", sae_epochs=1), overrides)
    r_resumed = train_sae_sweep_cached(
        _base_cfg(tmp_path / "resume", sae_epochs=2, sae_checkpoint_epoch=1),
        overrides,
    )
    for rs, rr in zip(r_straight, r_resumed):
        for k in ("sae_rec_loss", "sae_loss", "sparsity"):
            np.testing.assert_allclose(
                float(rr[k]), float(rs[k]), rtol=1e-5, atol=1e-7, err_msg=k
            )


def test_transcoder_sweep_matches_individual_runs(tmp_path):
    """Vmapped transcoder sweep (paired caches shared across combos) matches two
    individual transcoder Pipelines."""
    from sparse_vision_tpu.train.pipeline import Pipeline

    def tc_cfg(d, **kw):
        return _base_cfg(
            d, model_name="custom_mlp_8", sae_model_name="transcoder",
            sae_layer="fc1", transcoder_target_layer="fc2", **kw,
        )

    overrides = [{"sae_lambda_sparse": 0.05}, {"sae_lambda_sparse": 0.3}]
    sweep_results = train_sae_sweep_cached(tc_cfg(tmp_path / "sweep"), overrides)
    assert len(sweep_results) == 2

    ind = []
    for ov in overrides:
        p = Pipeline(dataclasses.replace(tc_cfg(tmp_path / "indiv"), **ov))
        ind.append(p.train_sae())
    for r_sweep, r_ind in zip(sweep_results, ind):
        for k in ("sae_rec_loss", "sae_loss", "sparsity", "kld"):
            np.testing.assert_allclose(
                float(r_sweep[k]), float(r_ind[k]), rtol=1e-5, atol=1e-7,
                err_msg=k,
            )


def test_sweep_validation():
    cfg = _base_cfg("/tmp/unused")
    with pytest.raises(ValueError, match="non-sweepable"):
        train_sae_sweep_cached(cfg, [{"sae_expansion_factor": 8}])
    with pytest.raises(ValueError, match="at least one"):
        train_sae_sweep_cached(cfg, [])
    with pytest.raises(ValueError, match="use_sae=True"):
        train_sae_sweep_cached(
            dataclasses.replace(cfg, training=False), [{"sae_lambda_sparse": 0.1}]
        )


def test_crosscoder_sweep_matches_individual_runs(tmp_path):
    """Vmapped crosscoder sweep (L aligned caches shared across combos) matches
    two individual crosscoder Pipelines, incl. per-combo diffing CSVs."""
    from sparse_vision_tpu.train.pipeline import Pipeline

    def cc_cfg(d, **kw):
        return _base_cfg(
            d, model_name="custom_mlp_3", sae_model_name="crosscoder",
            sae_layer="fc1", crosscoder_layers="fc2,fc3",
            sae_optimizer_name="adam", **kw,
        )

    overrides = [{"sae_lambda_sparse": 0.05}, {"sae_lambda_sparse": 0.3}]
    sweep_results = train_sae_sweep_cached(cc_cfg(tmp_path / "sweep"), overrides)
    assert len(sweep_results) == 2

    ind = []
    for ov in overrides:
        p = Pipeline(dataclasses.replace(cc_cfg(tmp_path / "indiv"), **ov))
        ind.append(p.train_sae())
    for r_sweep, r_ind in zip(sweep_results, ind):
        for k in ("sae_rec_loss", "sae_loss", "sparsity", "kld"):
            np.testing.assert_allclose(
                float(r_sweep[k]), float(r_ind[k]), rtol=1e-5, atol=1e-7,
                err_msg=k,
            )
    # each combo exported its own decoder-norm diffing CSV
    folder = os.path.join(
        str(tmp_path / "sweep"), "custom_mlp_3", "synthetic",
        "sae_weights_crosscoder",
    )
    csvs = [f for f in os.listdir(folder) if f.endswith("_decoder_norms.csv")]
    assert len(csvs) == 2, csvs
