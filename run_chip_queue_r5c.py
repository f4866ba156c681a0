"""Round-5 tail queue (final stretch of the session's chip window).

Picks up the steps the r5b follow-up queue does not cover, in priority order:
the flagship registry -> ie chain (the last missing pieces of the flagship
artifact run — the HTML report's circuit section needs them), then the
remaining real-cache lambda frontiers.

Two scheduling guards protect the round boundary:
- waits for the PID in /tmp/r5b_queue.pid to exit first (never two chip
  programs at once), then removes any stop sentinel so the runners execute;
- R5C_DEADLINE (epoch seconds, default +infinity) — a step only STARTS if
  its realistic duration estimate fits before the deadline, so the chip is
  guaranteed idle when the round's driver bench runs. No step is ever
  killed mid-flight (the documented tunnel-wedge prevention); the kill
  bound stays the generous per-step timeout.

    PYTHONPATH=/root/repo:$PYTHONPATH python run_chip_queue_r5c.py [--only s]
"""

import os
import sys
import time

from run_chip_queue import run_step

# (name, argv, kill_bound_s, est_duration_s, extra_env)
STEPS = [
    # re-run after the DFT-matmul irfft2 fix (the r5b attempt failed with
    # UNIMPLEMENTED: jnp.fft has no lowering on this TPU runtime)
    ("flagship_viz2", [sys.executable, "run_flagship.py"], 3600, 1500,
     {"FLAG_ONLY": "viz"}),
    ("flagship_registry", [sys.executable, "run_flagship.py"], 10800, 4200,
     {"FLAG_ONLY": "registry"}),
    ("flagship_ie", [sys.executable, "run_flagship.py"], 7200, 3600,
     {"FLAG_ONLY": "ie"}),
    # report re-run AFTER ie so the committed HTML gains the circuit section
    ("flagship_report2", [sys.executable, "run_flagship.py"], 1800, 900,
     {"FLAG_ONLY": "report", "FLAG_FORCE": "1"}),
    ("sweep_real_transcoder_rms", [sys.executable, "bench_sweep_real.py"],
     5400, 3600, {"SWEEP_ONLY": "transcoder_rms"}),
    ("sweep_real_jumprelu", [sys.executable, "bench_sweep_real.py"], 5400,
     3600, {"SWEEP_ONLY": "jumprelu"}),
    ("sweep_real_transcoder_l1", [sys.executable, "bench_sweep_real.py"],
     5400, 3600, {"SWEEP_ONLY": "transcoder_l1"}),
]


def wait_for_prior_queue() -> None:
    pid_file = "/tmp/r5b_queue.pid"
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
    deadline = float(os.environ.get("R5C_DEADLINE", "inf"))
    wait_for_prior_queue()
    if os.path.exists("/tmp/r5_stop"):
        os.remove("/tmp/r5_stop")
    for name, argv, timeout, est, extra in STEPS:
        if only and only not in name:
            continue
        if time.time() + est > deadline:
            print(f"[{name}] skipped: est {est}s does not fit before "
                  f"R5C_DEADLINE (chip must be idle for the round driver)")
            continue
        run_step(name, argv, timeout, extra)
    print("round-5 tail queue done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
