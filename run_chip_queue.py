"""Run every queued chip measurement in one command, in dependency order,
with per-step bounds and a JSONL record — the recovery plan for tunnel-wedge
sessions (memory/round3c-session.md).

Each step runs in a FRESH subprocess (one-program-at-a-time: a timeout kills
between compiles, not mid-compile — the documented wedge prevention) with a
generous per-step timeout, and its stdout tail + parsed JSON lines append to
``chip_queue_results.jsonl``. Steps that fail or time out are recorded and the
queue continues. Safe to re-run: the persistent jax compile cache makes repeat
steps fast.

    PYTHONPATH=/root/repo:$PYTHONPATH python run_chip_queue.py [--only substr]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
# committed evidence: every PARITY.md perf row cites a record in this file
# (round-3 verdict item 5 — the queue's numbers must be auditable artifacts)
OUT = os.environ.get(
    "CHIP_QUEUE_OUT", os.path.join(REPO, "docs", "chip_queue_results.jsonl")
)

# (name, argv, timeout_s) — order: cheap reachability first, then the headline,
# then per-feature benches, then the long full-chain rehearsals
STEPS = [
    ("probe", [sys.executable, "-c", "import jax; print(jax.devices())"], 360),
    ("bench_headline", [sys.executable, "bench.py"], 1800),
    ("bench_tp", [sys.executable, "bench_tp.py"], 3600),
    ("bench_sweep", [sys.executable, "bench_sweep.py"], 3600),
    ("bench_batch_topk", [sys.executable, "bench_batch_topk.py"], 2400),
    ("bench_transcoder", [sys.executable, "bench_transcoder.py"], 2400),
    ("bench_crosscoder", [sys.executable, "bench_crosscoder.py"], 2400),
    ("parity_transcoder", [sys.executable, "chip_parity.py", "transcoder"], 2400),
    ("parity_crosscoder", [sys.executable, "chip_parity.py", "crosscoder"], 2400),
    ("parity_vmap_sweep", [sys.executable, "chip_parity.py", "vmap_sweep"], 2400),
    ("bench_ie", [sys.executable, "bench_ie.py"], 3600),
    ("bench_vit_circuit", [sys.executable, "bench_vit_circuit.py"], 3600),
    ("bench_clip_sae", [sys.executable, "bench_clip_sae.py"], 2400),
    ("bench_tc_circuit", [sys.executable, "bench_tc_circuit.py"], 2400),
    ("bench_serve", [sys.executable, "bench_serve.py"], 2400),
    ("conv_batch_topk", [sys.executable, "bench_convergence_variants.py"], 5400,
     {"CONV_ONLY": "batch_topk"}),
    ("conv_matryoshka", [sys.executable, "bench_convergence_variants.py"], 5400,
     {"CONV_ONLY": "matryoshka"}),
    ("conv_transcoder", [sys.executable, "bench_convergence_variants.py"], 5400,
     {"CONV_ONLY": "transcoder"}),
    ("conv_crosscoder", [sys.executable, "bench_convergence_variants.py"], 7200,
     {"CONV_ONLY": "crosscoder"}),
    ("conv_clip_sae", [sys.executable, "bench_convergence_variants.py"], 7200,
     {"CONV_ONLY": "clip_sae"}),
    ("bench_northstar", [sys.executable, "bench_northstar.py"], 5400),
    ("northstar_int8", [sys.executable, "bench_northstar.py"], 5400,
     {"NORTHSTAR_INT8": "1"}),
    ("northstar_overlap", [sys.executable, "bench_northstar.py"], 5400,
     {"NORTHSTAR_OVERLAP": "1"}),
]


def run_step(name, argv, timeout, extra_env=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("SVT_TPU_PROBE_TIMEOUT", "300")
    if extra_env:
        env.update(extra_env)
    t0 = time.time()
    try:
        r = subprocess.run(
            argv, cwd=REPO, env=env, timeout=timeout,
            capture_output=True, text=True,
        )
        status = "ok" if r.returncode == 0 else f"rc={r.returncode}"
        out = r.stdout
        err = r.stderr[-1500:]
    except subprocess.TimeoutExpired as e:
        status, out, err = "timeout", (e.stdout or ""), (e.stderr or "")[-1500:]
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        if isinstance(err, bytes):
            err = err.decode(errors="replace")
    json_lines = [
        ln for ln in out.splitlines() if ln.startswith("{") and ln.endswith("}")
    ]
    rec = {
        "step": name,
        "status": status,
        "seconds": round(time.time() - t0, 1),
        "json": [json.loads(ln) for ln in json_lines if _loads_ok(ln)],
        "stdout_tail": out[-1200:],
        "stderr_tail": err,
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[{name}] {status} in {rec['seconds']}s; "
          f"{len(rec['json'])} JSON line(s)")
    for j in rec["json"]:
        print("   ", json.dumps(j))
    return status == "ok"


def _loads_ok(ln):
    try:
        json.loads(ln)
        return True
    except Exception:
        return False


def main():
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = sys.argv[2]
    for step in STEPS:
        name, argv, timeout = step[0], step[1], step[2]
        extra = step[3] if len(step) > 3 else None
        if only and only not in name:
            continue
        ok = run_step(name, argv, timeout, extra)
        if name == "probe" and not ok:
            print("probe failed — tunnel unreachable; aborting the queue "
                  "(results so far in chip_queue_results.jsonl)")
            return 1
    print(f"queue done; records in {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
