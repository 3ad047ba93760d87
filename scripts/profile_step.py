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


def timed(fn, *args, steps=STEPS, reps=3):
    """Best wall time per iteration of fn inside a compiled fori_loop."""

    def run_n(*a):
        def body(_, c):
            r = fn(*c) if isinstance(c, tuple) else fn(c)
            return r

        return jax.lax.fori_loop(0, steps, body, args if len(args) > 1 else args[0])

    g = jax.jit(run_n)
    out = g(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = g(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / steps


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

    results = {}

    # ---- clean-matmul ceiling (what the MXU delivers on this machine) ----
    for n in (4096, 8192):
        a = jnp.ones((n, n), jnp.bfloat16)
        dt = timed(lambda x: jnp.dot(x, x).astype(jnp.bfloat16), a, steps=10)
        results[f"matmul_{n}_tflops"] = round(2 * n**3 / dt / 1e12, 1)

    # ---- stage timings ----
    # 1. mel frontend (train mode: specaug etc.)
    def mel_train(w):
        return log_mel_spectrogram(w, mel_cfg, train=True, rng=key)

    results["mel_ms"] = round(timed(mel_train, wave) * 1e3, 2)

    mel = log_mel_spectrogram(wave, mel_cfg, train=False)[:, None, :, :998]

    # 2. forward only (train-mode patchout)
    def fwd(m):
        logits, _ = model.apply(
            {"params": state.params}, m, train=True,
            rngs={"patchout": key, "dropout": key, "droppath": key},
        )
        return logits

    results["fwd_ms"] = round(timed(fwd, mel) * 1e3, 2)

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

    def fwd_bwd(m):
        g = grad_fn(state.params, m)
        return jax.tree_util.tree_reduce(lambda a, b: a + b.sum(), g, jnp.float32(0))

    results["fwd_bwd_ms"] = round(timed(fwd_bwd, mel) * 1e3, 2)

    # 4. optimizer alone (AdamW update on the 86M-param tree)
    grads = jax.jit(grad_fn)(state.params, mel)
    jax.block_until_ready(grads)

    def opt(params, opt_state):
        upd, new_opt = tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, upd), new_opt

    results["adamw_ms"] = round(
        timed(opt, state.params, state.opt_state) * 1e3, 2
    )

    # 5. the full production step (mel+mixup+fwd+bwd+adamw, donated)
    raw_step = make_train_step(model, tx, mel_cfg, loss_type="multilabel", use_mixup=True, jit=False)

    def full(st):
        st2, m = raw_step(st, {"wave": wave, "target": target}, key)
        return st2

    results["full_step_ms"] = round(timed(full, state) * 1e3, 2)

    # ---- attention vs MLP split: time a blocks-only forward at two
    # sequence lengths to separate N^2 attention from N-linear matmuls ----
    results["specs_per_sec_full"] = round(B / (results["full_step_ms"] / 1e3), 1)

    # ---- MFU ----
    # FLOPs per example (train fwd): patch conv + 12 blocks + head.
    f_grid, t_grid = cfg.grid_size
    n_tok = (f_grid - 4) * (t_grid - 40) + 2
    d = cfg.embed_dim
    per_block = 40 * n_tok * d * d + 4 * n_tok * n_tok * d  # qkv/proj/mlp + attn
    fwd_flops = 12 * per_block + n_tok * 256 * d * 2
    train_flops = 3 * fwd_flops  # bwd ~ 2x fwd
    results["train_flops_per_example_g"] = round(train_flops / 1e9, 1)
    eff = train_flops * B / (results["full_step_ms"] / 1e3)
    results["effective_tflops"] = round(eff / 1e12, 1)
    results["mfu_vs_v5e_peak197"] = round(eff / 197e12, 3)
    results["mfu_vs_measured_ceiling"] = round(
        eff / (results["matmul_8192_tflops"] * 1e12), 3
    )

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
