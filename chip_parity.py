"""Compiled fused-vs-stock trajectory parity on the REAL chip for the Pallas
paths that so far only have interpret-mode parity tests: the transcoder and
crosscoder kernels (ops/fused_transcoder.py, ops/fused_crosscoder.py) and the
vmap-of-pallas fused sweep step (train/sweep_vmap.py).

Interpret mode cannot catch grid-accumulation bugs (an output block written
across non-consecutive grid steps compiles but silently corrupts — see the
Pallas grid rule in ops/fused_sae.py), so every fused kernel here gets a
compiled multi-step trajectory check against the stock-XLA math, resample
crossing included. float32 compute on both sides; the residual difference is
the TPU's f32 dot rounding, typically ~1e-5 relative over 30 steps (the fused
matryoshka kernel's measured figure, PARITY.md).

Run ONE check per invocation so a queue timeout kills between remote compiles,
not mid-compile (the documented tunnel-wedge prevention, CLAUDE.md):

    PYTHONPATH=/root/repo:$PYTHONPATH python chip_parity.py transcoder
    python chip_parity.py crosscoder
    python chip_parity.py vmap_sweep
    python chip_parity.py all        # local/CPU debugging only
"""

import json
import os
import sys

from sparse_vision_tpu.utils.platform import (
    pin_cpu_if_requested,
    probe_tpu_or_pin_cpu,
)

probe_tpu_or_pin_cpu("chip_parity")
pin_cpu_if_requested()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SVT_JAX_CACHE", os.path.expanduser("~/.cache/svt_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
# Parity needs BOTH sides computing real f32: the TPU's DEFAULT matmul
# precision rounds f32 operands to bf16 on the MXU, so the stock-XLA side
# would carry ~4e-3 relative rounding per step that the f32 Pallas side does
# not — 30 adam steps amplify that into percent-level param drift that is
# pure MXU rounding, not kernel error (measured round 3: 0.8%/1.0%/14% at
# DEFAULT vs the kernel-bug-free diffs below at HIGHEST).
jax.config.update("jax_default_matmul_precision", "highest")

REL_TOL = 3e-3  # grid-accumulation corruption is orders of magnitude worse
# single-step param tolerance: one step has no trajectory amplification, so
# the kernels must match stock to near-f32-rounding — this is the direct
# kernel-correctness statement; the trajectory bound above additionally
# absorbs 20-30 adam steps compounding benign rounding differences
REL_TOL_STEP1 = 1e-3  # summation-order rounding alone reads ~2e-4 step-1
# the crosscoder's stock side sums L per-layer matmuls where the fused kernel
# contracts ONE concatenated axis — a different (still f32) summation order,
# so its 30-step param drift runs ~3x the same-order transcoder's (measured
# 4.5e-3 vs 5.6e-4 at HIGHEST precision, loss diff 3e-7 both)
REL_TOL_TRAJ = {"fused_crosscoder_trajectory": 1e-2}

ON_TPU = jax.default_backend() != "cpu"
# CPU fallback = smoke test of the script itself (interpret kernels, toy
# shapes); the parity statement requires the chip.
FUSED_OPTS = (
    {"compute_dtype": jnp.float32}
    if ON_TPU
    else {"compute_dtype": jnp.float32, "interpret": True,
          "tile_t": 32, "tile_h": 128}
)


def _max_rel(a: dict, b: dict) -> float:
    """Max per-array diff normalized by the array's magnitude SCALE (not
    elementwise: a bias entry of 1e-4 with a 1e-6 rounding wobble is not a 1%
    error, while grid-accumulation corruption shows up as O(1) of the scale)."""
    worst = 0.0
    for k in a:
        x, y = np.asarray(a[k], np.float64), np.asarray(b[k], np.float64)
        scale = max(float(np.max(np.abs(y))), 1e-6)
        worst = max(worst, float(np.max(np.abs(x - y))) / scale)
    return worst


def _report(name: str, rel_params: float, rel_loss: float, steps: int,
            rel_step1: float = None) -> bool:
    tol_traj = REL_TOL_TRAJ.get(name, REL_TOL)
    ok = rel_params < tol_traj and rel_loss < REL_TOL
    if rel_step1 is not None:
        ok = ok and rel_step1 < REL_TOL_STEP1
    print(json.dumps({
        "metric": f"chip_parity_{name}",
        "backend": jax.default_backend(),
        "steps": steps,
        "max_rel_param_diff": float(rel_params),
        "max_rel_param_diff_step1": (
            None if rel_step1 is None else float(rel_step1)),
        "max_rel_loss_diff": float(rel_loss),
        "tol": tol_traj,
        "tol_step1": None if rel_step1 is None else REL_TOL_STEP1,
        "ok": ok,
    }))
    return ok


def check_transcoder() -> bool:
    """30 compiled steps at a fuseable shape (T=2048, 256 -> 4096 latents ->
    480), constrained_adam, resample crossing at step 25 (dead_neurons_steps=12)."""
    from sparse_vision_tpu.models.sae import init_transcoder
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import init_sae_train_state
    from sparse_vision_tpu.train.transcoder import (
        make_transcoder_multi_step,
        make_transcoder_train_step_from_acts,
    )

    K, T, C_IN, EF, C_OUT = ((30, 2048, 256, 16, 480) if ON_TPU
                             else (6, 64, 128, 4, 96))
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(K, T, C_IN).astype(np.float32))
    ys = jnp.asarray(rng.randn(K, T, C_OUT).astype(np.float32))

    def run(fused, xs_, ys_):
        tx = optim.get_optimizer("constrained_adam", 1e-3)
        params = init_transcoder(jax.random.key(0), C_IN, EF, C_OUT)
        ts = init_sae_train_state(params, tx, C_IN * EF, seed=0)
        step = make_transcoder_train_step_from_acts(
            0.1, tx, 12, EF, fused=fused,
            fused_opts=FUSED_OPTS if fused else None,
        )
        ts, ms = make_transcoder_multi_step(step)(ts, xs_, ys_)
        print(f"transcoder {'fused' if fused else 'stock'} "
              f"({xs_.shape[0]} steps) done: loss={float(ms['sae_loss'][-1]):.6f}")
        return jax.device_get(ts.params), np.asarray(ms["sae_loss"])

    rel1 = _max_rel(run(True, xs[:1], ys[:1])[0], run(False, xs[:1], ys[:1])[0])
    p_f, l_f = run(True, xs, ys)
    p_s, l_s = run(False, xs, ys)
    rel_loss = float(np.max(np.abs(l_f - l_s) / (np.abs(l_s) + 1e-6)))
    return _report("fused_transcoder_trajectory", _max_rel(p_f, p_s), rel_loss,
                   K, rel1)


def check_crosscoder() -> bool:
    """30 compiled steps of the 3-layer cat-space kernels (dims 256/192/128,
    h=2048), plain adam (the variant's contract), resample crossing at 25."""
    from sparse_vision_tpu.models.crosscoder import init_crosscoder
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.crosscoder import (
        make_crosscoder_multi_step,
        make_crosscoder_train_step_from_acts,
    )
    from sparse_vision_tpu.train.steps import init_sae_train_state

    K, T, DIMS, EF = ((30, 2048, (256, 192, 128), 8) if ON_TPU
                      else (6, 64, (128, 96, 64), 4))
    rng = np.random.RandomState(1)
    stacks = tuple(
        jnp.asarray(rng.randn(K, T, d).astype(np.float32)) for d in DIMS
    )

    def run(fused, stacks_):
        tx = optim.get_optimizer("adam", 1e-3)
        params = init_crosscoder(jax.random.key(0), DIMS, EF)
        ts = init_sae_train_state(params, tx, DIMS[0] * EF, seed=0)
        step = make_crosscoder_train_step_from_acts(
            0.05, tx, 12, EF, fused=fused,
            fused_opts=FUSED_OPTS if fused else None,
        )
        ts, ms = make_crosscoder_multi_step(step)(ts, stacks_)
        print(f"crosscoder {'fused' if fused else 'stock'} "
              f"({stacks_[0].shape[0]} steps) done: "
              f"loss={float(ms['sae_loss'][-1]):.6f}")
        return jax.device_get(ts.params), np.asarray(ms["sae_loss"])

    one = tuple(s[:1] for s in stacks)
    rel1 = _max_rel(run(True, one)[0], run(False, one)[0])
    p_f, l_f = run(True, stacks)
    p_s, l_s = run(False, stacks)
    rel_loss = float(np.max(np.abs(l_f - l_s) / (np.abs(l_s) + 1e-6)))
    return _report("fused_crosscoder_trajectory", _max_rel(p_f, p_s), rel_loss,
                   K, rel1)


def check_vmap_sweep() -> bool:
    """20 compiled steps of the 4-combo vmapped sweep, fused (vmap of
    pallas_call: combo axis = outer grid dim) vs stock, resample crossing at 17
    (dead_neurons_steps=8)."""
    from sparse_vision_tpu.models.sae import init_sae_mlp
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import init_sae_train_state
    from sparse_vision_tpu.train.sweep_vmap import (
        make_sae_sweep_step,
        stack_sae_states,
        unstack_sae_state,
    )

    K, T, D, EF = (20, 2048, 256, 8) if ON_TPU else (6, 64, 128, 4)
    lambdas, lrs = [0.1, 0.5, 0.1, 1.0], [1e-3, 1e-3, 3e-3, 1e-3]
    rng = np.random.RandomState(2)
    acts = rng.randn(K, T, D).astype(np.float32)

    def run(fused, acts_):
        states = []
        for i, lr in enumerate(lrs):
            tx = optim.get_optimizer("constrained_adam", lr)
            params = init_sae_mlp(jax.random.key(i), D, EF)
            states.append(init_sae_train_state(params, tx, D * EF, seed=i))
        ss = stack_sae_states(states)
        step = make_sae_sweep_step(
            "sae_mlp", lambdas, lrs, "constrained_adam", 8, EF, fused=fused,
            fused_opts=FUSED_OPTS if fused else None,
        )
        for a in acts_:
            ss, ms = step(ss, jnp.asarray(a))
        print(f"vmap_sweep {'fused' if fused else 'stock'} "
              f"({len(acts_)} steps) done: "
              f"loss={[round(float(v), 6) for v in ms['sae_loss']]}")
        return ss, np.asarray(ms["sae_loss"])

    def worst_rel(ss_f, ss_s):
        worst = 0.0
        for i in range(len(lambdas)):
            p_f = jax.device_get(unstack_sae_state(ss_f, i).params)
            p_s = jax.device_get(unstack_sae_state(ss_s, i).params)
            worst = max(worst, _max_rel(p_f, p_s))
        return worst

    rel1 = worst_rel(run(True, acts[:1])[0], run(False, acts[:1])[0])
    ss_f, l_f = run(True, acts)
    ss_s, l_s = run(False, acts)
    rel_loss = float(np.max(np.abs(l_f - l_s) / (np.abs(l_s) + 1e-6)))
    return _report("fused_vmap_sweep_trajectory", worst_rel(ss_f, ss_s),
                   rel_loss, K, rel1)


CHECKS = {
    "transcoder": check_transcoder,
    "crosscoder": check_crosscoder,
    "vmap_sweep": check_vmap_sweep,
}


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(CHECKS) if which == "all" else [which]
    ok = True
    for name in names:
        ok = CHECKS[name]() and ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
