"""Round-4 fix-up chip pass: re-run the steps the main queue failed (now
root-caused and fixed) plus the two measurements the contended morning run
made unrepresentative, appending to the same committed JSONL evidence file.

Order: probe gate, leak diagnostic, the three fixed benches, the AuxK+
calibration batch_topk convergence rerun (fresh run dir via CONV_TAG), the
chunked crosscoder rerun RESUMED from its epoch-24 checkpoint, then the two
re-measurements. One bounded subprocess per step (wedge prevention).

  PYTHONPATH=/root/repo:$PYTHONPATH python run_chip_requeue_r4.py [--only substr]
"""

import os
import sys

import run_chip_queue as q

REPO = os.path.dirname(os.path.abspath(__file__))

STEPS = [
    ("probe", [sys.executable, "-c", "import jax; print(jax.devices())"], 360),
    ("diag_axon_rss", [sys.executable, "diag_axon_rss.py"], 2400),
    ("bench_vit_circuit", [sys.executable, "bench_vit_circuit.py"], 3600),
    ("bench_clip_sae", [sys.executable, "bench_clip_sae.py"], 2400),
    ("bench_serve", [sys.executable, "bench_serve.py"], 2400),
    # AuxK + threshold calibration rerun: trains from scratch (epoch 0) in the
    # same run dir — the activation cache is reused, per-epoch checkpoints are
    # overwritten; 4-epoch chunks bound the leak with the slower aux step
    ("conv_batch_topk_aux", [sys.executable, "bench_convergence_variants.py"],
     10800, {"CONV_ONLY": "batch_topk", "CONV_CHUNK_EPOCHS": "4"}),
    # crosscoder: resume the OOM-killed run from its epoch-24 checkpoint and
    # finish 24->32 in one 8-epoch chunk
    ("conv_crosscoder_resume", [sys.executable, "bench_convergence_variants.py"],
     10800, {"CONV_ONLY": "crosscoder", "CONV_START": "24"}),
    # the lambda=5 transcoder row sits at L0=9,413 of 16,384 — effectively
    # dense; one tuned row toward the Pareto point (the jumprelu-tuning
    # precedent, docs/CONVERGENCE.md)
    ("conv_transcoder_l40", [sys.executable, "bench_convergence_variants.py"],
     10800, {"CONV_ONLY": "transcoder", "CONV_LAMBDA": "40"}),
    ("bench_tc_circuit", [sys.executable, "bench_tc_circuit.py"], 2400),
    ("bench_ie", [sys.executable, "bench_ie.py"], 3600),
]


def main():
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = sys.argv[2]
    for step in STEPS:
        name, argv, timeout = step[0], step[1], step[2]
        extra = step[3] if len(step) > 3 else None
        if only and only not in name:
            continue
        ok = q.run_step(name, argv, timeout, extra)
        if name == "probe" and not ok:
            print("probe failed — tunnel unreachable; aborting")
            return 1
    print(f"requeue done; records in {q.OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
