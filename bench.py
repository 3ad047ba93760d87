"""Headline benchmark: training throughput, specs/second.

The reference measures training speed as ``(iters * batch) / seconds`` of
fwd+BCE+bwd+optimizer steps at batch 12 with fp16 autocast on a CUDA GPU
(reference: ex_audioset.py:365-426, ``model_speed_test``, printing
"average speed: N specs/second"). This benchmark is the same workload,
TPU-native: the full jitted train step — on-device mel frontend included
(the reference keeps mel outside its speed test; including it makes our
number strictly more end-to-end) — iterated inside one compiled loop so the
axon tunnel's ~27 ms dispatch round-trip does not pollute the measurement.

Two distinct baselines — kept separate on purpose:
- MEASURED anchor: the reference harness itself (ex_audioset.py:365-426)
  prints ~88 specs/s on one RTX 2080 Ti (arXiv 2110.05069 Fig. 1 setup;
  the published recipe trains on 2x 2080 Ti, ex_audioset.py:502). Our
  ``model_speed_test`` — the same workload semantics, mel excluded —
  measures 464.2 specs/s on one v5e chip (round 5, production config)
  = 5.3x that anchor.
- ESTIMATED bar: BASELINE.json's ">= 2x A100/chip". No A100 number for
  this workload is published; the estimate chain is A100 ~ 2.8x a
  2080 Ti => ~250 specs/s => target 500 specs/s. ``vs_baseline`` divides
  by THIS estimated 500 so the headline stays conservative; the measured
  anchor above is the number with no estimation in it.

The measured configuration is the framework's production default: fused
Pallas attention (attn_impl=auto), bf16 AdamW moments with a
stochastic-rounded second moment (opt_moments_dtype=bfloat16_sr) — both
quality-validated at full size (PARITY.md; the 50-tone 86M demo reaches
mAP 0.893 under bf16+SR vs 0.894 with fp32 moments) — and the
frame-decomposed patch embed (patch_embed_impl=unfold; the overlapping
stride-10 conv lowers at ~3% MXU efficiency, the reformulation is
checkpoint-compatible and exact) and the saved-derivative tanh-GELU
backward (gelu_saved_deriv; grads == AD). Round 3 added the flat
qkv-boundary attention kernel (kernel I/O is the raw fused-qkv Dense
output — zero glue in-graph). Expected ~28.9 ms/step = ~416 specs/s =
59% of the chip's 188 TFLOP/s delivered matmul peak sustained
through the whole step. PARITY.md "Performance notes"
carries the per-stage budget, the MFU derivation, and the
kernel-by-kernel table bounding each remaining non-matmul millisecond
with a MEASURED custom-kernel attempt (fused attention, fused mel,
per-leaf Pallas optimizer, flash attention, ...), not an estimate;
vs_baseline 1.0 would need 71% sustained.

Round 4 also added bf16+SR PARAMETER storage (param_dtype=bfloat16_sr,
the config default under bf16 compute via trainer.param_dtype="auto"):
params stored bf16, updates applied with an fp32 add + stochastic-rounded
store (train/optim.py apply_updates_sr) — halves param HBM traffic on all
six per-step streams. Measured 27.92 -> 27.39 ms/step on the 60-step
harness (scripts/ab_param_dtype.py); quality-neutral across 3 full-size
seeds (mAP 0.916 +- 0.001 vs production band 0.900 +- 0.010, PARITY.md).

Round 5 closed the two structural questions the round-4 profile left
open, with full-step measurements (PARITY.md "Measured dead ends"):
batching the 12 per-block dW GEMMs via stacked params — real in
isolation (199 -> 248 TFLOP/s, scripts/ab_batched_dw.py) — LOSES end to
end in every formulation (nn.scan 33.38 ms, hand-written deferred-dW
custom_vjp 33.04 ms vs loop 27.30 ms: the stacked cotangent
materialization costs more HBM traffic than the batching saves), and
absorbing norm1 into the attention kernel boundary is neutral (27.354
vs 27.303 ms, scripts/ab_ln_qkv.py). The unrolled per-block graph with
XLA's own epilogue fusion is the measured optimum of every formulation
tried; ~27.3 ms device time (~440 specs/s) is this graph's floor on
this chip.

Round 4: the loop length was raised 20 -> 200 steps. A step-count sweep
(20/60/120 steps: 29.13 / 27.88 / 27.67 ms/step) showed the wall time of
one ``fn`` call carries a FIXED ~35 ms of host dispatch + axon-tunnel
round-trip (linear fit: slope 27.37 ms/step, intercept 35.2 ms) — at 20
steps that fixed cost inflated the per-step number by ~1.76 ms, i.e. the
old 414.5 specs/s headline under-reported the device's actual 27.4 ms
step (= 438 specs/s, independently confirmed by the round-3 xprof
profile's 27.3 ms device-busy time, PARITY.md). 200 steps amortizes the
artifact to <0.2 ms/step; the printed number is still honest wall-clock
(includes its share of dispatch), just no longer dominated by it.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_SPECS_PER_SEC = 500.0  # 2x A100 target (see module docstring)


def _assert_tpu_backend():
    """Refuse to report a TPU headline measured on a non-TPU backend.

    The axon tunnel logs "Platform 'axon' is experimental" at the
    xla_bridge level, but the selected jax backend is still ``tpu``
    (device_kind "TPU v5 lite"). If the tunnel ever fell back to CPU,
    this benchmark would print a plausible-looking but wrong specs/s —
    so the backend is asserted and recorded in the output line.
    Set PASST_BENCH_ALLOW_CPU=1 to run the workload off-TPU (smoke
    tests); the output is then labeled with the actual platform.
    """
    backend = jax.default_backend()
    dev = jax.devices()[0]
    if backend != "tpu" and not os.environ.get("PASST_BENCH_ALLOW_CPU"):
        raise SystemExit(
            f"bench.py: refusing to report TPU throughput from backend "
            f"{backend!r} (device {dev}). Set PASST_BENCH_ALLOW_CPU=1 to "
            f"run the workload anyway (clearly-labeled non-TPU number)."
        )
    return backend, getattr(dev, "device_kind", str(dev))


def main():
    platform, device_kind = _assert_tpu_backend()
    from passt_tpu.models.passt import PaSSTConfig
    from passt_tpu.ops.frontend import MelConfig
    from passt_tpu.train.steps import create_train_state, make_optimizer, make_train_step

    batch_size = 12  # reference model_speed_test default (ex_audioset.py:365)
    steps = 200  # amortizes the fixed ~35 ms dispatch+tunnel RTT (docstring)

    cfg = PaSSTConfig(dtype="bfloat16", s_patchout_t=40, s_patchout_f=4)
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
    target = jnp.asarray((rng_np.uniform(size=(batch_size, 527)) < 0.05).astype(np.float32))
    base_rng = jax.random.PRNGKey(42)

    def run_n(state, wave, target):
        def body(_, carry):
            st, loss_acc = carry
            st, metrics = raw_step(st, {"wave": wave, "target": target}, base_rng)
            return st, loss_acc + metrics["loss"]

        return jax.lax.fori_loop(0, steps, body, (state, jnp.float32(0.0)))

    fn = jax.jit(run_n, donate_argnums=(0,))

    # Compile + warmup (donation: the returned state feeds the next call).
    state, _ = fn(state, wave, target)
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, loss_sum = fn(state, wave, target)
        float(loss_sum)  # forces full sync
        best_dt = min(best_dt, time.perf_counter() - t0)

    specs_per_sec = steps * batch_size / best_dt
    print(
        json.dumps(
            {
                "metric": "train_throughput_b12_fwd_bwd_adamw_incl_mel",
                "value": round(specs_per_sec, 2),
                "unit": "specs/second",
                "vs_baseline": round(specs_per_sec / BASELINE_SPECS_PER_SEC, 3),
                "platform": platform,
                "device_kind": device_kind,
            }
        )
    )


if __name__ == "__main__":
    main()
