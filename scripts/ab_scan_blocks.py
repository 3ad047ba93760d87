#!/usr/bin/env python
"""A/B: blocks_impl="loop" (12 unrolled Blocks) vs "scan" (stacked params).

VERDICT r4 item 1(a): the round-4 xprof capture attributed 6.20 ms/step to
the 12 per-block weight-grad GEMMs with their bf16+SR optimizer epilogues
fused in, running at 39-50% MXU on the 768-wide dW shapes (PARITY.md
"Profile attribution"), vs a measured 185-202 TFLOP/s isolation rate for
the same GEMM shapes. Hypothesis: a scan-over-blocks graph — ONE dW GEMM
instance inside the reverse scan writing stacked [12, ...] grads, and ONE
stacked optimizer fusion instead of 48 per-block ones — reschedules that
time. This script measures the hypothesis end to end: the full production
train step (mel + mixup + fwd/bwd + fused AdamW + bf16+SR params) at the
bench.py configuration, N steps inside one jit (amortizes the ~35 ms
axon dispatch RTT), best of 3 trials each.

Run on the real chip:  python scripts/ab_scan_blocks.py [--steps 60]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def measure(blocks_impl: str = "loop", steps: int = 60, trials: int = 3,
            **cfg_overrides):
    """Full production train step at the bench.py configuration; shared by
    scripts/ab_ln_qkv.py (pass fuse_ln_qkv=True etc. via cfg_overrides)."""
    from passt_tpu.models.passt import PaSSTConfig
    from passt_tpu.ops.frontend import MelConfig
    from passt_tpu.train.steps import create_train_state, make_optimizer, make_train_step

    batch_size = 12
    cfg = PaSSTConfig(
        dtype="bfloat16", s_patchout_t=40, s_patchout_f=4,
        blocks_impl=blocks_impl, **cfg_overrides,
    )
    mel_cfg = MelConfig(fmin_aug_range=10, fmax_aug_range=2000)
    tx = make_optimizer(lr=2e-5, steps_per_epoch=1000, moments_dtype="bfloat16_sr")
    model, state = create_train_state(
        cfg, tx, jax.random.PRNGKey(0), param_dtype="bfloat16_sr"
    )
    raw_step = make_train_step(
        model, tx, mel_cfg, loss_type="multilabel", use_mixup=True, jit=False,
        param_sr=True,
    )
    rng_np = np.random.default_rng(0)
    wave = jnp.asarray(rng_np.standard_normal((batch_size, 320000)).astype(np.float32))
    target = jnp.asarray(
        (rng_np.uniform(size=(batch_size, 527)) < 0.05).astype(np.float32)
    )
    base_rng = jax.random.PRNGKey(42)

    def run_n(state, wave, target):
        def body(_, carry):
            st, loss_acc = carry
            st, metrics = raw_step(st, {"wave": wave, "target": target}, base_rng)
            return st, loss_acc + metrics["loss"]

        return jax.lax.fori_loop(0, steps, body, (state, jnp.float32(0.0)))

    fn = jax.jit(run_n, donate_argnums=(0,))
    t0 = time.perf_counter()
    state, loss0 = fn(state, wave, target)
    float(loss0)
    compile_s = time.perf_counter() - t0
    best_dt = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        state, loss_sum = fn(state, wave, target)
        final_loss = float(loss_sum)  # forces full sync
        best_dt = min(best_dt, time.perf_counter() - t0)
    ms_per_step = best_dt / steps * 1e3
    return {
        "blocks_impl": blocks_impl,
        **cfg_overrides,
        "ms_per_step": round(ms_per_step, 3),
        "specs_per_sec": round(steps * batch_size / best_dt, 2),
        "compile_s": round(compile_s, 1),
        "mean_loss": round(final_loss / steps, 4),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--impls", default="loop,scan")
    args = p.parse_args(argv)
    results = []
    for impl in args.impls.split(","):
        r = measure(impl, args.steps)
        print(json.dumps(r), flush=True)
        results.append(r)
    if len(results) == 2:
        a, b = results
        print(
            json.dumps(
                {
                    "delta_ms": round(b["ms_per_step"] - a["ms_per_step"], 3),
                    "speedup": round(a["ms_per_step"] / b["ms_per_step"], 4),
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
