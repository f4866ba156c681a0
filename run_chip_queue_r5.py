"""Round-5 chip queue: the VERDICT-r4 evidence runs, in priority order.

Same machinery as run_chip_queue.py (fresh subprocess per step, bounded,
JSONL record in docs/chip_queue_results.jsonl, abort on a failed probe) with
the round-5 steps:

  heal_sweep      crosscoder lambda frontier on fresh rms-normalized caches
  flagship_*      the flagship artifact chain (run_flagship.py phases, each
                  its own bounded subprocess; phases are resumable via done
                  markers)
  heal_full       full crosscoder retrain at the sweep's lambda + diffing
                  readout (internally chunked into resumable subprocesses)
  conv_batch_topk the healed batch_topk 8-epoch quality row (rolling dead
                  window AuxK fix, train/steps.py)
  diag_batch_topk the dead-fraction mechanism trajectory
  sweep_real_*    real-cache lambda frontiers (sae_mlp/jumprelu/transcoder
                  + the rms-transfer transcoder grid)

    PYTHONPATH=/root/repo:$PYTHONPATH python run_chip_queue_r5.py [--only s]
"""

import sys

from run_chip_queue import run_step

# Order = VERDICT-r4 priority (re-planned mid-round-5 after measuring step
# rates: the original breadth-first order could not finish in the round's chip
# window). heal_sweep ran standalone (docs/crosscoder_lambda_sweep_r5.json;
# chip record in the JSONL) and flagship_registry resumes for free via its
# partial-rows file, so re-running the queue stays cheap.
# Order = this session's value-per-chip-minute after the 2026-08-20 host
# reboot wiped /tmp (caches/checkpoints/compile cache all regenerate): the
# northstar checkpoint first (it unblocks mis/probing/report/viz/finetune/
# steering — and MIS is VERDICT r4's only "Missing" item), then the crosscoder
# heal full retrain (sweep artifact already committed), then the batch_topk
# evidence pair, then the cheap flagship phases, then the long registry->ie
# tail and the real-cache frontiers (first casualties if the window closes).
STEPS = [
    ("probe", [sys.executable, "-c", "import jax; print(jax.devices())"], 360,
     None),
    ("flagship_northstar", [sys.executable, "run_flagship.py"], 7200,
     {"FLAG_ONLY": "northstar"}),
    ("flagship_mis", [sys.executable, "run_flagship.py"], 7200,
     {"FLAG_ONLY": "mis"}),  # also matches mis_orig: runs both MIS phases
    ("heal_full", [sys.executable, "run_crosscoder_heal.py"], 10800,
     {"HEAL_PHASE": "full"}),
    ("diag_batch_topk", [sys.executable, "diag_batch_topk.py"], 5400, None),
    ("conv_batch_topk", [sys.executable, "bench_convergence_variants.py"],
     7200, {"CONV_ONLY": "batch_topk"}),
    ("flagship_probing", [sys.executable, "run_flagship.py"], 3600,
     {"FLAG_ONLY": "probing"}),
    ("flagship_finetune", [sys.executable, "run_flagship.py"], 3600,
     {"FLAG_ONLY": "finetune"}),
    ("flagship_steering", [sys.executable, "run_flagship.py"], 1800,
     {"FLAG_ONLY": "steering"}),
    ("flagship_viz", [sys.executable, "run_flagship.py"], 3600,
     {"FLAG_ONLY": "viz"}),
    ("flagship_report", [sys.executable, "run_flagship.py"], 1800,
     {"FLAG_ONLY": "report"}),
    ("sweep_real_sae_mlp", [sys.executable, "bench_sweep_real.py"], 7200,
     {"SWEEP_ONLY": "sae_mlp"}),
    ("flagship_registry", [sys.executable, "run_flagship.py"], 10800,
     {"FLAG_ONLY": "registry"}),
    ("flagship_ie", [sys.executable, "run_flagship.py"], 7200,
     {"FLAG_ONLY": "ie"}),
    ("sweep_real_transcoder_rms", [sys.executable, "bench_sweep_real.py"],
     7200, {"SWEEP_ONLY": "transcoder_rms"}),
    ("sweep_real_jumprelu", [sys.executable, "bench_sweep_real.py"], 7200,
     {"SWEEP_ONLY": "jumprelu"}),
    ("sweep_real_transcoder_l1", [sys.executable, "bench_sweep_real.py"],
     7200, {"SWEEP_ONLY": "transcoder_l1"}),
    ("bench_headline", [sys.executable, "bench.py"], 1800, None),
]


def main() -> int:
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = sys.argv[2]
    for name, argv, timeout, extra in STEPS:
        if only and only not in name:
            continue
        ok = run_step(name, argv, timeout, extra)
        if name == "probe" and not ok:
            print("probe failed — tunnel unreachable; aborting the queue")
            return 1
    print("round-5 queue done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
