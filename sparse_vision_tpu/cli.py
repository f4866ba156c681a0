"""Command-line entry point.

Replaces the reference's main.py (argparse with 24 positional-ish flags, main.py:9-43)
and its local/cluster split (main.py:63-113 local loop over parameters.txt lines;
:161-230 cluster mode running ONE combo):

  sparse-vision-tpu --run_pipeline --parameters sweep.jsonl          # all runs
  sparse-vision-tpu --run_pipeline --parameters sweep.jsonl --line 3 # one run (job arrays)
  sparse-vision-tpu --run_pipeline --config '{"dataset_name": "mnist", ...}'
  sparse-vision-tpu --run_evaluation --results_csv .../sae_eval_results.csv

Legacy ``parameters.txt`` files in the reference's 24-field comma format are accepted
transparently (config.RunConfig.from_legacy_line).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from sparse_vision_tpu.config import RunConfig, read_jsonl


def _load_parameters(path: str) -> list[RunConfig]:
    """Sweep file loader: JSONL of RunConfig, legacy 24-field parameters.txt lines,
    or legacy 17-field parameters_eval.txt lines (distinguished by field count)."""
    with open(path) as f:
        first = f.readline().strip()
    if first.startswith("{"):
        return read_jsonl(path)
    n_fields = len(first.split(","))
    parse = (RunConfig.from_legacy_eval_line if n_fields == 17
             else RunConfig.from_legacy_line)
    with open(path) as f:
        return [parse(line) for line in f if line.strip()]


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="sparse-vision-tpu", description=__doc__)
    p.add_argument("--run_pipeline", action="store_true",
                   help="run the training/eval/MIS/IE pipeline (reference main.py --run_pipeline)")
    p.add_argument("--run_evaluation", action="store_true",
                   help="post-hoc sweep evaluation: ranking + Pareto plots (reference main.py --run_evaluation)")
    p.add_argument("--parameters", type=str, default=None,
                   help="sweep file: JSONL of RunConfig or legacy 24-field parameters.txt")
    p.add_argument("--line", type=int, default=None,
                   help="run only this 0-based line of --parameters (cluster job arrays, main.py:161-230)")
    p.add_argument("--config", type=str, default=None,
                   help="single run as a JSON object of RunConfig fields")
    p.add_argument("--results_csv", type=str, default=None,
                   help="merged results CSV for --run_evaluation")
    p.add_argument("--out_dir", type=str, default=None,
                   help="output directory for evaluation artifacts")
    p.add_argument("--vmap_sweep", action="store_true",
                   help="with --run_pipeline --parameters: train sweep entries that "
                        "differ only in (sae_lambda_sparse, sae_learning_rate, seed) "
                        "together in ONE vmapped step off a shared activation cache "
                        "(train/sweep_vmap.py); other entries run individually")
    p.add_argument("--multilayer", type=str, default=None, metavar="LAYERS",
                   help="with --run_pipeline --config: train SAEs for a comma list "
                        "of layers (or 'circuit' = the registry's circuit layers; "
                        "or 'transcoders' = one transcoder per same-geometry "
                        "consecutive circuit pair) off ONE shared backbone pass "
                        "(train/multilayer.py); registry hyperparameters apply "
                        "per layer")
    p.add_argument("--export_serving", type=str, default=None, metavar="DIR",
                   help="with --config: export the run's weights as a versioned "
                        "AOT serving artifact (serve/exporter.py). To export a "
                        "trained run, set sae_checkpoint_epoch (or "
                        "sae_weights_path) in the config; composes with "
                        "--run_pipeline in one invocation (train, then export "
                        "the final epoch)")
    p.add_argument("--export_kind", type=str, default="feature_service",
                   choices=["feature_service", "backbone", "sae_encoder",
                            "steering_service"],
                   help="artifact kind for --export_serving")
    p.add_argument("--export_weights_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="bake the artifact's closed-over weights in this dtype "
                        "(bfloat16 = weight-only quantization, ~half the "
                        "module bytes; compute stays f32 via type promotion — "
                        "serve/exporter.py)")
    p.add_argument("--feature_report", type=str, default=None, metavar="OUT",
                   help="write a self-contained HTML feature report for the "
                        "--config run's latest evaluated epoch (composable "
                        "with --run_pipeline: train/eval, then report)")
    p.add_argument("--sparse_probing", type=str, default=None, metavar="KS",
                   help="run the sparse-probing evaluation tier for the --config "
                        "run: comma-separated k values (e.g. '1,2,5,16'); a dense "
                        "all-features probe is always included. Composable with "
                        "--run_pipeline: train/eval, then probe "
                        "(eval_tools/probing.py)")
    return p.parse_args(argv)


def _run_one(cfg: RunConfig) -> None:
    from sparse_vision_tpu.config import Sweep
    from sparse_vision_tpu.train.pipeline import Pipeline

    Sweep.validate(cfg)  # same guards as sweep expansion (specify_parameters.py:222-236)
    print(f"=== run: {cfg.to_json()}")
    Pipeline(cfg).run()


def main(argv=None) -> int:
    args = parse_args(argv)
    # Honor JAX_PLATFORMS even when a site hook registered a different default
    # platform plugin at interpreter startup (env var alone is consumed before the
    # hook runs; jax.config still wins as long as no backend is initialized) — but
    # ONLY when no one has pinned a platform yet. An in-process caller (tests, a
    # notebook) that already forced e.g. CPU must not be flipped back to the env's
    # platform: that silently moved every subsequent computation in the process
    # onto the env's accelerator (observed: CPU-forced tests running matmuls on
    # the TPU at its default bf16 precision after one cli_main call).
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        if jax.config.jax_platforms is None:
            jax.config.update("jax_platforms", plat)
    if not (args.run_pipeline or args.run_evaluation or args.export_serving
            or args.feature_report or args.sparse_probing):
        print("Nothing to do: pass --run_pipeline, --run_evaluation, "
              "--export_serving, --feature_report and/or --sparse_probing",
              file=sys.stderr)
        return 2

    if args.run_pipeline:
        if args.config:
            cfgs = [RunConfig(**json.loads(args.config))]
        elif args.parameters:
            cfgs = _load_parameters(args.parameters)
            if args.line is not None:
                cfgs = [cfgs[args.line]]
        else:
            print("--run_pipeline needs --parameters or --config", file=sys.stderr)
            return 2
        if args.multilayer is not None and args.multilayer.startswith("transcoders"):
            from sparse_vision_tpu.models.backbone import make_backbone
            from sparse_vision_tpu.train.multilayer import (
                train_transcoders_multilayer,
                transcoder_pairs,
            )

            _, _, layer_list = args.multilayer.partition(":")
            for cfg in cfgs:
                print(f"=== multilayer transcoder run: {cfg.to_json()}")
                pairs = None
                if layer_list:  # 'transcoders:l1,l2,l3' pairs up that chain
                    pairs = transcoder_pairs(
                        make_backbone(cfg.model_name, cfg.dataset_name),
                        cfg.dataset_name,
                        [l for l in layer_list.split(",") if l],
                    )
                train_transcoders_multilayer(cfg, pairs=pairs)
        elif args.multilayer is not None:
            from sparse_vision_tpu.train.multilayer import train_saes_multilayer

            layers = (None if args.multilayer == "circuit"
                      else [l for l in args.multilayer.split(",") if l])
            for cfg in cfgs:
                print(f"=== multilayer run: {cfg.to_json()}")
                train_saes_multilayer(cfg, layers=layers)
        elif args.vmap_sweep:
            from sparse_vision_tpu.config import Sweep
            from sparse_vision_tpu.train.sweep_vmap import (
                group_sweepable,
                train_sae_sweep_cached,
            )

            groups, singles = group_sweepable(cfgs)
            for base, overrides in groups:
                Sweep.validate(base)
                print(f"=== vmapped sweep ({len(overrides)} combos): {base.to_json()}")
                train_sae_sweep_cached(base, overrides)
            for cfg in singles:
                _run_one(cfg)
        else:
            for cfg in cfgs:
                _run_one(cfg)

    if args.export_serving:
        if not args.config:
            print("--export_serving needs --config", file=sys.stderr)
            return 2
        import dataclasses

        from sparse_vision_tpu.train.pipeline import Pipeline
        from sparse_vision_tpu.serve.exporter import export_from_pipeline

        cfg = RunConfig(**json.loads(args.config))
        if args.run_pipeline and cfg.use_sae and cfg.sae_checkpoint_epoch == 0:
            # train-then-export in one invocation: pick up the run just trained
            cfg = dataclasses.replace(cfg, sae_checkpoint_epoch=cfg.sae_epochs)
        import jax.numpy as _jnp

        wd = (_jnp.bfloat16 if args.export_weights_dtype == "bfloat16"
              else None)
        out = export_from_pipeline(Pipeline(cfg), args.export_serving,
                                   kind=args.export_kind, weights_dtype=wd)
        print(f"Exported {args.export_kind} serving artifact -> {out}")

    if args.sparse_probing:
        if not args.config:
            print("--sparse_probing needs --config", file=sys.stderr)
            return 2
        import dataclasses

        from sparse_vision_tpu.eval_tools.probing import compute_sparse_probing
        from sparse_vision_tpu.train.pipeline import Pipeline

        cfg = RunConfig(**json.loads(args.config))
        if args.run_pipeline and cfg.use_sae and cfg.sae_checkpoint_epoch == 0:
            # train-then-probe in one invocation: pick up the run just trained
            cfg = dataclasses.replace(cfg, sae_checkpoint_epoch=cfg.sae_epochs)
        elif cfg.use_sae and cfg.sae_checkpoint_epoch == 0 and not cfg.sae_weights_path:
            # without --run_pipeline there is nothing to restore: the probe
            # would score a randomly initialized SAE yet be filed under the
            # trained epoch's artifact name, overwriting real results
            print("--sparse_probing without --run_pipeline needs a trained "
                  "SAE: set sae_checkpoint_epoch > 0 (or sae_weights_path) "
                  "in the config", file=sys.stderr)
            return 2
        ks = [int(t) for t in args.sparse_probing.split(",")
              if t.strip().lstrip("-").isdigit() and int(t) > 0]
        compute_sparse_probing(Pipeline(cfg), ks=ks or (1, 2, 5, 16))

    if args.feature_report:
        if not args.config:
            print("--feature_report needs --config", file=sys.stderr)
            return 2
        from sparse_vision_tpu.eval_tools.report import write_feature_report
        from sparse_vision_tpu.utils.paths import folder_paths, run_id

        cfg = RunConfig(**json.loads(args.config))
        paths = folder_paths(cfg)
        out = write_feature_report(
            paths["evaluation_results"], run_id(cfg),
            args.feature_report,
            ie_dir=paths["ie_related_quantities"],
        )
        print(f"Wrote feature report -> {out}")

    if args.run_evaluation:
        from sparse_vision_tpu.eval_tools.ranking import (
            compute_sae_ranking,
            evaluate_sweep_config,
            plot_rec_loss_vs_sparsity,
            plot_rec_loss_vs_sparsity_all_epochs,
        )

        if args.parameters:
            # eval-sweep spec (the parameters_eval.txt role: main.py:117-155) — each
            # non-original-model entry maps to its sweep's merged results CSV through
            # the path scheme and gets rank table + single + all-epochs Pareto grids.
            # With --run_pipeline in the same invocation, the training sweep file
            # doubles as the eval spec: per-λ/per-k combos share one results folder,
            # so evaluate each distinct folder once.
            seen_folders: set = set()
            from sparse_vision_tpu.utils.paths import folder_paths

            failures = 0
            for cfg in _load_parameters(args.parameters):
                if cfg.original_model:
                    continue  # reference skips original-model lines (main.py:129-131)
                folder = folder_paths(cfg)["evaluation_results"]
                if folder in seen_folders:
                    continue
                seen_folders.add(folder)
                # one entry with a missing/short results CSV must not abort the
                # remaining sweep entries (mirrors the --results_csv path's
                # ValueError handling below)
                try:
                    out = evaluate_sweep_config(cfg)
                except (FileNotFoundError, ValueError) as e:
                    failures += 1
                    print(f"Sweep entry skipped ({folder}): {e}", file=sys.stderr)
                    continue
                print(f"Evaluated sweep -> {out['rank_table']}, "
                      f"{out['pareto']}, {out['pareto_all_epochs']}")
            if failures and not (len(seen_folders) - failures):
                return 1  # every entry failed: surface it to job arrays
        elif args.results_csv:
            out_dir = args.out_dir or os.path.dirname(args.results_csv)
            df = compute_sae_ranking(
                args.results_csv, os.path.join(out_dir, "sae_rank_table.csv")
            )
            plot_rec_loss_vs_sparsity(
                args.results_csv, os.path.join(out_dir, "pareto.png")
            )
            try:
                plot_rec_loss_vs_sparsity_all_epochs(
                    args.results_csv, os.path.join(out_dir, "pareto_all_epochs.png")
                )
            except ValueError as e:  # single-epoch CSVs have no grid to expand
                print(f"all-epochs grid skipped: {e}")
            print(df.head(10).to_string())
            print(f"Wrote sae_rank_table.csv and Pareto grids to {out_dir}")
        else:
            print("--run_evaluation needs --results_csv or --parameters",
                  file=sys.stderr)
            return 2
    return 0


def _main_entry() -> int:
    """Fresh-interpreter entry (``python -m sparse_vision_tpu.cli``, main.py,
    the ``sparse-vision-tpu`` console script): the JAX_PLATFORMS env var is
    authoritative (utils/platform.py explains the site-hook quirk). main()
    keeps the conservative don't-flip-a-pinned-platform rule for in-process
    callers (tests, notebooks)."""
    from sparse_vision_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    return main()


if __name__ == "__main__":
    raise SystemExit(_main_entry())
