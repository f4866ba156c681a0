"""Console + optional W&B logging.

Reference semantics (utils.py:1217-1334 print_and_log_results + execute_project.py:
146-184): train metrics logged per batch against a 'batch' x-axis, eval metrics per
epoch against an 'epoch' x-axis; console prints every `log_every` train steps
(reference prints every 100, utils.py:1259). W&B is optional and import-guarded.
"""

from __future__ import annotations

from typing import Optional


class RunLogger:
    def __init__(self, run_id: str, run_group: str = "", use_wandb: bool = False,
                 config: Optional[dict] = None, log_every: int = 100,
                 resume: bool = False):
        self.log_every = log_every
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                # resume="must" stitches a resumed run's history onto the same W&B
                # run id (reference: execute_project.py:67-76, 144-150)
                wandb.init(project="sparse-vision-tpu", name=run_id, id=run_id,
                           group=run_group or None, config=config or {},
                           resume="must" if resume else None)
                wandb.define_metric("batch")
                wandb.define_metric("epoch")
                wandb.define_metric("train/*", step_metric="batch")
                wandb.define_metric("eval/*", step_metric="epoch")
                self.wandb = wandb
            except Exception as e:  # wandb missing or offline — degrade to console
                print(f"[logger] W&B unavailable ({e}); console only")

    @staticmethod
    def _fmt(metrics: dict) -> str:
        return ", ".join(f"{k}={float(v):.5g}" for k, v in sorted(metrics.items()))

    def log_train(self, step: int, metrics: dict) -> None:
        if self.wandb is not None:
            self.wandb.log({f"train/{k}": float(v) for k, v in metrics.items()} | {"batch": step})
        if step % self.log_every == 0:
            print(f"[train step {step}] {self._fmt(metrics)}")

    def log_eval(self, epoch: int, metrics: dict) -> None:
        if self.wandb is not None:
            self.wandb.log({f"eval/{k}": float(v) for k, v in metrics.items()} | {"epoch": epoch})
        print(f"[eval epoch {epoch}] {self._fmt(metrics)}")

    def log_figure(self, name: str, fig, epoch: int) -> None:
        """Log a matplotlib figure under eval/<name> (reference logs every eval-epoch
        figure as a wandb.Image, e.g. model_pipeline.py:1063, utils.py:1990)."""
        if self.wandb is not None:
            self.wandb.log({f"eval/{name}": self.wandb.Image(fig), "epoch": epoch})

    def log_table(self, name: str, df) -> None:
        """Log a dataframe as a wandb.Table under eval/<name> (the reference logs the
        SAE rank table this way, evaluation.py:62-63; commit=False like the
        reference — the table flushes with the next commit or on finish())."""
        if self.wandb is not None:
            self.wandb.log(
                {f"eval/{name}": self.wandb.Table(dataframe=df)}, commit=False
            )

    def finish(self) -> None:
        if self.wandb is not None:
            self.wandb.finish()
