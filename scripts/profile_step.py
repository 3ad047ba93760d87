"""Per-stage train-step profile on the real TPU chip (VERDICT round-1 #4).

Times each stage of the B=12 training step in isolation inside compiled
fori_loops (so the axon dispatch round-trip is excluded), and derives an
MFU figure against both the measured clean-matmul ceiling and the v5e
bf16 peak. Prints one JSON block for PARITY.md.

Run: python scripts/profile_step.py   (needs the real chip; do NOT run
under pytest, whose conftest forces the virtual CPU backend).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

STEPS = 20
B = 12


def timed(fn, *args, steps=STEPS, reps=2):
    """Best wall time per invocation of fn(*args) iterated inside ONE jit.

    A scalar accumulator perturbs the first argument each iteration
    (x + acc*1e-20) so the loop body has a true cross-iteration data
    dependence — XLA cannot hoist the loop-invariant computation — while
    the perturbation itself is numerically and cost-wise negligible."""

    def run_n(n, *a):
        def body(_, acc):
            eps = acc * jnp.float32(1e-20)
            first = jax.tree_util.tree_map(
                lambda x: x + eps.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                a[0],
            )
            r = fn(first, *a[1:])
            # Reduce over EVERY output element: anything cheaper (e.g. one
            # leaf, one element) lets XLA dead-code-eliminate the rest of
            # the computation and report fantasy numbers.
            return acc + jax.tree_util.tree_reduce(
                lambda s, x: s + x.sum().astype(jnp.float32), r, jnp.float32(0)
            )

        # dynamic trip count (lowers to while): ONE compile serves both loop
        # lengths, so differencing removes dispatch/RTT overhead exactly
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    g = jax.jit(run_n)
    float(g(jnp.int32(steps), *args))  # compile + warmup; scalar fetch=sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(jnp.int32(steps), *args))
        t1 = time.perf_counter()
        float(g(jnp.int32(3 * steps), *args))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / (2 * steps)
        if dt > 0:  # timing noise can make the difference negative for
            best = min(best, dt)  # cheap stages; discard those reps
    if best == float("inf"):
        raise RuntimeError("all timing reps were noise-dominated; rerun on a quiet machine")
    return best


def main():
    from passt_tpu.models.passt import PaSSTConfig, init_passt
    from passt_tpu.ops.frontend import MelConfig, log_mel_spectrogram
    from passt_tpu.train.steps import create_train_state, make_optimizer, make_train_step

    print("devices:", jax.devices())
    cfg = PaSSTConfig(dtype="bfloat16", s_patchout_t=40, s_patchout_f=4)
    mel_cfg = MelConfig(fmin_aug_range=10, fmax_aug_range=2000)
    tx = make_optimizer(lr=2e-5, steps_per_epoch=1000)
    model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0))

    rng_np = np.random.default_rng(0)
    wave = jnp.asarray(rng_np.standard_normal((B, 320000)).astype(np.float32))
    target = jnp.asarray((rng_np.uniform(size=(B, 527)) < 0.05).astype(np.float32))
    key = jax.random.PRNGKey(42)

    stages = set(sys.argv[1:]) or {"ceiling", "stages", "full", "ablate"}
    results = {}

    # ---- clean-matmul ceiling (what the MXU delivers on this machine) ----
    if "ceiling" in stages:
        for n in (8192,):
            a = jnp.ones((n, n), jnp.bfloat16)
            dt = timed(lambda x: jnp.dot(x, x).astype(jnp.bfloat16), a, steps=5)
            results[f"matmul_{n}_tflops"] = round(2 * n**3 / dt / 1e12, 1)
            print(f"matmul_{n}_tflops", results[f"matmul_{n}_tflops"], flush=True)

    # ---- model-shaped matmul rates (the roofline that actually matters) --
    if "shapes" in stages:
        shape_sets = {
            "qkv_5688x768x2304": (5688, 768, 2304),
            "mlp1_5688x768x3072": (5688, 768, 3072),
            "mlp2_5688x3072x768": (5688, 3072, 768),
        }
        for label, (m_, k_, n_) in shape_sets.items():
            a = jnp.ones((m_, k_), jnp.bfloat16)
            bmat = jnp.ones((k_, n_), jnp.bfloat16)
            dt = timed(lambda x, y: jnp.dot(x, y), a, bmat, steps=400)
            results[label + "_tflops"] = round(2 * m_ * k_ * n_ / dt / 1e12, 1)
            print(label, results[label + "_tflops"], flush=True)
        # attention batched matmul: [B*H, N, dh] @ [B*H, dh, N]
        a = jnp.ones((144, 474, 64), jnp.bfloat16)
        bmat = jnp.ones((144, 64, 474), jnp.bfloat16)
        dt = timed(lambda x, y: jnp.einsum("bnd,bdm->bnm", x, y), a, bmat, steps=400)
        results["attn_qk_tflops"] = round(2 * 144 * 474 * 474 * 64 / dt / 1e12, 1)
        print("attn_qk_tflops", results["attn_qk_tflops"], flush=True)

    # ---- stage timings ----
    mel = log_mel_spectrogram(wave, mel_cfg, train=False)[:, None, :, :998]

    # 1. mel frontend (train mode: specaug etc.)
    if "stages" in stages:
        def mel_train(w):
            return log_mel_spectrogram(w, mel_cfg, train=True, rng=key)

        results["mel_ms"] = round(timed(mel_train, wave) * 1e3, 2)
        print("mel_ms", results["mel_ms"], flush=True)

    # 2. forward only (train-mode patchout). Params are ARGUMENTS, never jit
    # constants: the axon remote-compile rejects 344 MB constant blobs.
    def fwd(params, m):
        logits, _ = model.apply(
            {"params": params}, m, train=True,
            rngs={"patchout": key, "dropout": key, "droppath": key},
        )
        return logits

    if "stages" in stages or "ablate" in stages:
        results["fwd_ms"] = round(timed(fwd, state.params, mel) * 1e3, 2)
        print("fwd_ms", results["fwd_ms"], flush=True)

    # 3. forward + backward (loss grads wrt params; no optimizer)
    def loss_fn(params, m):
        logits, _ = model.apply(
            {"params": params}, m, train=True,
            rngs={"patchout": key, "dropout": key, "droppath": key},
        )
        p = jax.nn.log_sigmoid(logits)
        n = jax.nn.log_sigmoid(-logits)
        return -(target * p + (1 - target) * n).mean()

    grad_fn = jax.grad(loss_fn)

    def fwd_bwd(params, m):
        g = grad_fn(params, m)
        return jax.tree_util.tree_reduce(lambda a, b: a + b.sum(), g, jnp.float32(0))

    if "stages" in stages:
        results["fwd_bwd_ms"] = round(timed(fwd_bwd, state.params, mel) * 1e3, 2)
        print("fwd_bwd_ms", results["fwd_bwd_ms"], flush=True)

        # 4. optimizer alone (AdamW update on the 86M-param tree)
        import optax

        grads = jax.jit(grad_fn)(state.params, mel)
        jax.block_until_ready(grads)

        def opt(g, params, opt_state):
            upd, new_opt = tx.update(g, opt_state, params)
            return optax.apply_updates(params, upd), new_opt

        results["adamw_ms"] = round(
            timed(opt, grads, state.params, state.opt_state) * 1e3, 2
        )
        print("adamw_ms", results["adamw_ms"], flush=True)

    # 5. the full production step (mel+mixup+fwd+bwd+adamw, donated)
    if "full" in stages:
        raw_step = make_train_step(model, tx, mel_cfg, loss_type="multilabel", use_mixup=True, jit=False)

        def full(st):
            st2, m = raw_step(st, {"wave": wave, "target": target}, key)
            return st2

        results["full_step_ms"] = round(timed(full, state) * 1e3, 2)
        results["specs_per_sec_full"] = round(B / (results["full_step_ms"] / 1e3), 1)
        print("full_step_ms", results["full_step_ms"], flush=True)

    # ---- ablations (forward-only) ----
    import dataclasses
    if not stages & {"ablate", "ablate_bwd"}:
        print(json.dumps(results, indent=2))
        return

    # (a) bf16 attention softmax
    if "ablate" in stages:
        cfg_b = dataclasses.replace(cfg, softmax_fp32=False)
        model_b = type(model)(cfg_b)

        def fwd_b(params, m):
            logits, _ = model_b.apply(
                {"params": params}, m, train=True,
                rngs={"patchout": key, "dropout": key, "droppath": key},
            )
            return logits

        results["fwd_bf16_softmax_ms"] = round(timed(fwd_b, state.params, mel) * 1e3, 2)
        print("fwd_bf16_softmax_ms", results["fwd_bf16_softmax_ms"], flush=True)

    # (b) same token count (8 x 59 grid + 2 = 474) WITHOUT patchout gathers:
    # isolates the cost of the sorted-permutation gathers + their rng.
    cfg_ng = dataclasses.replace(
        cfg, input_fdim=86, input_tdim=596, s_patchout_t=0, s_patchout_f=0
    )
    model_ng = type(model)(cfg_ng)
    import jax.random as jrandom

    params_ng = model_ng.init(
        {"params": jrandom.PRNGKey(0)},
        jnp.zeros((1, 1, 86, 596), jnp.float32),
        train=False,
    )["params"]
    mel_ng = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, 1, 86, 596)).astype(np.float32)
    )

    def fwd_ng(params, m):
        logits, _ = model_ng.apply(
            {"params": params}, m, train=True,
            rngs={"patchout": key, "dropout": key, "droppath": key},
        )
        return logits

    if "ablate" in stages:
        results["fwd_same_tokens_no_patchout_ms"] = round(
            timed(fwd_ng, params_ng, mel_ng) * 1e3, 2
        )
        print("fwd_same_tokens_no_patchout_ms",
              results["fwd_same_tokens_no_patchout_ms"], flush=True)

    # (c) backward of the no-patchout model: sizes the patchout gathers'
    # BACKWARD cost (gather bwd = scatter, historically slow on TPU).
    def loss_ng(params, m):
        logits, _ = model_ng.apply(
            {"params": params}, m, train=True,
            rngs={"patchout": key, "dropout": key, "droppath": key},
        )
        return (logits.astype(jnp.float32) ** 2).mean()

    gng = jax.grad(loss_ng)

    def fwd_bwd_ng(params, m):
        g = gng(params, m)
        return jax.tree_util.tree_reduce(lambda s, x: s + x.sum(), g, jnp.float32(0))

    if "ablate_bwd" in stages:
        results["fwd_bwd_same_tokens_no_patchout_ms"] = round(
            timed(fwd_bwd_ng, params_ng, mel_ng) * 1e3, 2
        )
        print("fwd_bwd_same_tokens_no_patchout_ms",
              results["fwd_bwd_same_tokens_no_patchout_ms"], flush=True)

    # ---- MFU ----
    # FLOPs per example (train fwd): patch conv + 12 blocks + head.
    f_grid, t_grid = cfg.grid_size
    n_tok = (f_grid - 4) * (t_grid - 40) + 2
    d = cfg.embed_dim
    # qkv 6ND^2 + proj 2ND^2 + mlp 16ND^2 (2 flops/MAC) + qk/av 4N^2D
    per_block = 24 * n_tok * d * d + 4 * n_tok * n_tok * d
    fwd_flops = 12 * per_block + n_tok * 256 * d * 2
    train_flops = 3 * fwd_flops  # bwd ~ 2x fwd
    results["train_flops_per_example_g"] = round(train_flops / 1e9, 1)
    if "full_step_ms" in results:
        eff = train_flops * B / (results["full_step_ms"] / 1e3)
        results["effective_tflops"] = round(eff / 1e12, 1)
        results["mfu_vs_v5e_peak197"] = round(eff / 197e12, 3)
        if "matmul_8192_tflops" in results:
            results["mfu_vs_measured_ceiling"] = round(
                eff / (results["matmul_8192_tflops"] * 1e12), 3
            )

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
