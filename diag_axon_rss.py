"""Diagnose the axon remote-backend host-RSS growth (chip_queue round 4).

Measured symptom: cached SAE training grows host RSS ~linearly with dispatch
count on the `axon` backend (~3 GB/epoch at crosscoder scale; the identical
loop on the CPU backend is flat). This script isolates the growth per phase:

  A. dispatch-only          jitted train step on a DEVICE-RESIDENT batch
  B. transfer+dispatch      same step, fresh host->device jnp.asarray per step
  C. transfer+gc            B plus an explicit del + gc.collect() every step
  D. transfer+sync          B plus jax.block_until_ready every step

Prints one JSON line per phase: {"phase", "steps", "rss_start_mb",
"rss_end_mb", "mb_per_step"}. Bounded (~2-3 min). Run ALONE on the chip.
"""

import gc
import json
import os
import resource
import time

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested, probe_tpu_or_pin_cpu

probe_tpu_or_pin_cpu("diag_axon_rss")
pin_cpu_if_requested()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SVT_JAX_CACHE", os.path.expanduser("~/.cache/svt_jax")),
)

D = int(os.environ.get("DIAG_D", "768"))
H_EXP = int(os.environ.get("DIAG_EF", "8"))
T = int(os.environ.get("DIAG_T", "16384"))
STEPS = int(os.environ.get("DIAG_STEPS", "60"))


def rss_mb() -> float:
    # CURRENT rss (not ru_maxrss's high-water mark): a gc in one phase must not
    # hide the next phase's growth behind the old maximum
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    from sparse_vision_tpu.models.sae import init_sae
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    params = init_sae("sae_mlp", jax.random.key(0), D, H_EXP)
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts0 = init_sae_train_state(params, tx, D * H_EXP)
    fused = jax.default_backend() != "cpu"
    step = make_sae_train_step_from_acts("sae_mlp", 5.0, tx, 10_000, H_EXP,
                                         fused=fused)
    host_batches = [
        np.random.default_rng(i).standard_normal((T, D), dtype=np.float32)
        for i in range(4)
    ]
    dev_batch = jnp.asarray(host_batches[0])
    ts = ts0
    ts, _ = step(ts, dev_batch)  # compile
    jax.block_until_ready(ts.params["b_enc"])

    def run(phase, body):
        nonlocal ts
        gc.collect()
        r0 = rss_mb()
        t0 = time.perf_counter()
        for i in range(STEPS):
            body(i)
        jax.block_until_ready(ts.params["b_enc"])
        r1 = rss_mb()
        print(json.dumps({
            "phase": phase, "steps": STEPS,
            "rss_start_mb": round(r0, 1), "rss_end_mb": round(r1, 1),
            "mb_per_step": round((r1 - r0) / STEPS, 2),
            "sec_per_step": round((time.perf_counter() - t0) / STEPS, 3),
        }), flush=True)

    def a(i):
        nonlocal ts
        ts, _ = step(ts, dev_batch)

    def b(i):
        nonlocal ts
        x = jnp.asarray(host_batches[i % 4])
        ts, _ = step(ts, x)

    def c(i):
        nonlocal ts
        x = jnp.asarray(host_batches[i % 4])
        ts, _ = step(ts, x)
        del x
        gc.collect()

    def d(i):
        nonlocal ts
        x = jnp.asarray(host_batches[i % 4])
        ts, m = step(ts, x)
        jax.block_until_ready(m["sae_loss"])

    run("A_dispatch_only", a)
    run("B_transfer_dispatch", b)
    run("C_transfer_gc", c)
    run("D_transfer_sync", d)


if __name__ == "__main__":
    main()
