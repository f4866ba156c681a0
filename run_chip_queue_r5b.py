"""Round-5 follow-up queue (second half of the session's chip window).

The first r5 queue invocation hit the HTTP-413 CLIP-embedder failure in
flagship_mis and was drained via the /tmp/r5_stop sentinel; this driver picks
up the remaining evidence steps in priority order with the fixed runner:

  flagship_mis     re-run with weights-as-args CLIP embedder (+ mis_orig)
  diag_batch_topk  dead-fraction mechanism trajectory
  conv_batch_topk  healed rolling-dead-window AuxK quality row
  flagship probing/finetune/steering/viz/report
  sweep_real_sae_mlp (stretch — first casualty if the window closes)

Waits for a PID in /tmp/r5_queue.pid to exit first (never two chip programs
at once), then removes the sentinel so the runners execute.

    PYTHONPATH=/root/repo:$PYTHONPATH python run_chip_queue_r5b.py [--only s]
"""

import os
import sys
import time

from run_chip_queue import run_step

STEPS = [
    ("flagship_mis", [sys.executable, "run_flagship.py"], 7200,
     {"FLAG_ONLY": "mis"}),  # substring also matches mis_orig
    # resume the half-done full retrain (chunk 1 = epochs 0-6 completed before
    # the sentinel broke chunk 2's child; checkpoint epoch_6 is on disk) and
    # run the diffing + single-layer-control phases that never executed
    ("heal_resume", [sys.executable, "run_crosscoder_heal.py"], 7200,
     {"HEAL_PHASE": "full", "HEAL_START": "6", "HEAL_SKIP_SWEEP": "15"}),
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
]


def wait_for_prior_queue() -> None:
    pid_file = "/tmp/r5_queue.pid"
    if not os.path.exists(pid_file):
        return
    pid = int(open(pid_file).read().strip())
    while True:
        try:
            os.kill(pid, 0)
        except OSError:
            return
        time.sleep(20)


def main() -> int:
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = sys.argv[2]
    wait_for_prior_queue()
    if os.path.exists("/tmp/r5_stop"):
        os.remove("/tmp/r5_stop")
    for name, argv, timeout, extra in STEPS:
        if only and only not in name:
            continue
        run_step(name, argv, timeout, extra)
    print("round-5 follow-up queue done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
