"""A/B: bf16 parameter STORAGE vs fp32 master weights — the last unmeasured
HBM lever on the production train step.

The step already computes fwd/bwd in bf16 (model.dtype=bfloat16 casts each
fp32 weight on use), so fp32 storage costs pure HBM bandwidth, 4 B/param
per touch: fwd read + bwd (dx) read + dW write (fp32 cotangent) +
optimizer read g / read p / write p. Storing params in bf16 halves all
six streams — ~171 MB x 6 ~= 1.0 GB/step for PaSST-S's 86 M params,
~1.7 ms at the chip's ~600 GB/s — at the numerical price that updates
(lr~1e-5 x unit-scale steps vs bf16's 2^-8 mantissa at weight scale
~1e-1) mostly round to zero under nearest rounding. Stochastic rounding
(unbiased, the same machinery as the optimizer's nu, train/optim.py)
fixes retention; this script measures what each variant is WORTH:

  fp32      — production baseline (bench.py config)
  bf16      — bf16 param storage, nearest-rounded apply (perf upper bound,
              numerically WRONG for small-lr training; never ship)
  bf16_sr   — bf16 param storage via the SHIPPED path
              (trainer.param_dtype="bfloat16_sr": create_train_state
              param_dtype + make_train_step(param_sr=True) — fp32 add +
              stochastic-rounded store fused into the update loops)

Measured 2026-08-19 on the idle chip (B=12, best of 3 x 60 steps):
  fp32      27.91 ms/step = 430.0 specs/s
  bf16      28.80 ms/step = 416.7 specs/s  (nearest apply; also WRONG)
  bf16_sr   27.38 ms/step = 438.3 specs/s  (pre-fusion probe: SR as an
            extra pass after optax.apply_updates — the shipped fused
            variant below removes that pass's read+write)

Run on the REAL chip with nothing else running:
  python -u scripts/ab_param_dtype.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B = 12
STEPS = 60


def build(param_mode: str):
    from passt_tpu.models.passt import PaSSTConfig
    from passt_tpu.ops.frontend import MelConfig
    from passt_tpu.train.steps import create_train_state, make_optimizer, make_train_step

    cfg = PaSSTConfig(dtype="bfloat16", s_patchout_t=40, s_patchout_f=4)
    mel_cfg = MelConfig(fmin_aug_range=10, fmax_aug_range=2000)
    tx = make_optimizer(lr=2e-5, steps_per_epoch=1000, moments_dtype="bfloat16_sr")
    model, state = create_train_state(
        cfg, tx, jax.random.PRNGKey(0),
        param_dtype=None if param_mode == "fp32" else "bfloat16_sr",
    )

    step = make_train_step(
        model, tx, mel_cfg, loss_type="multilabel", use_mixup=True, jit=False,
        param_sr=param_mode == "bf16_sr",
    )
    return state, step


def time_variant(param_mode: str):
    state, step = build(param_mode)
    rng_np = np.random.default_rng(0)
    wave = jnp.asarray(rng_np.standard_normal((B, 320000)).astype(np.float32))
    target = jnp.asarray((rng_np.uniform(size=(B, 527)) < 0.05).astype(np.float32))
    base_rng = jax.random.PRNGKey(42)

    def run_n(state, wave, target):
        def body(_, carry):
            st, acc = carry
            st, metrics = step(st, {"wave": wave, "target": target}, base_rng)
            return st, acc + metrics["loss"]

        return jax.lax.fori_loop(0, STEPS, body, (state, jnp.float32(0.0)))

    fn = jax.jit(run_n, donate_argnums=(0,))
    state, loss = fn(state, wave, target)
    float(loss)  # warmup + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, loss = fn(state, wave, target)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best * 1e3


def main():
    print("devices:", jax.devices())
    results = {}
    for mode in ("fp32", "bf16", "bf16_sr"):
        ms = time_variant(mode)
        results[mode] = ms
        print(f"{mode:8s}: {ms:7.2f} ms/step = {B / (ms / 1e3):6.1f} specs/s")
    base = results["fp32"]
    for mode in ("bf16", "bf16_sr"):
        print(f"{mode}: {base - results[mode]:+.2f} ms vs fp32 "
              f"({results[mode] / base:.3f}x step time)")


if __name__ == "__main__":
    main()
