"""A/B: software-pipelined train loop (mel of step k+1 hoisted before the
AdamW update of step k) vs the plain loop.

Motivation (VERDICT round-1, untried item): the AdamW update (~2.2 ms) is
pure HBM streaming with the MXU idle, and the mel frontend (~1.2 ms) is
independent of params — inside a fori_loop they live in consecutive
iterations, so XLA serializes them. The pipelined body makes them
co-resident in one iteration, giving the scheduler license to interleave.
Expected ceiling = min(mel, adamw) ≈ 1.2 ms/step IF the TPU backend can
overlap two independent fusions; TPU cores execute fusions in order (only
DMA is async), so the expected result is NEUTRAL — this measures it
rather than asserting it.

Usage: python -u scripts/ab_pipelined_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from passt_tpu.models.passt import PaSSTConfig
from passt_tpu.ops.frontend import MelConfig, log_mel_spectrogram
from passt_tpu.train.steps import create_train_state, make_optimizer, TrainState
from passt_tpu.train.mixup import sample_mixup, apply_mixup
from passt_tpu.train.steps import LOSS_FNS

B, STEPS = 12, 20


def main():
    cfg = PaSSTConfig(dtype="bfloat16", s_patchout_t=40, s_patchout_f=4)
    mel_cfg = MelConfig(fmin_aug_range=10, fmax_aug_range=2000)
    tx = make_optimizer(lr=2e-5, steps_per_epoch=1000, moments_dtype="bfloat16_sr")
    model, state0 = create_train_state(cfg, tx, jax.random.PRNGKey(0))
    loss_fn_inner = LOSS_FNS["multilabel"]

    rng_np = np.random.default_rng(0)
    wave = jnp.asarray(rng_np.standard_normal((B, 320000)).astype(np.float32))
    target = jnp.asarray(
        (rng_np.uniform(size=(B, 527)) < 0.05).astype(np.float32)
    )
    base_rng = jax.random.PRNGKey(42)
    tdim = cfg.input_tdim

    def mel_of(step):
        k_mel = jax.random.split(jax.random.fold_in(base_rng, step), 5)[0]
        mel = log_mel_spectrogram(wave, mel_cfg, rng=k_mel, train=True)
        return mel[:, None, :, :tdim]

    def fwd_bwd_opt(st, x):
        step_key = jax.random.fold_in(base_rng, st.step)
        _, k_mix, k_patch, k_drop, k_dpath = jax.random.split(step_key, 5)
        perm, lam = sample_mixup(k_mix, B, 0.3)
        xm = apply_mixup(x, perm, lam)

        def loss_of(params):
            logits, _ = model.apply(
                {"params": params}, xm, train=True,
                rngs={"patchout": k_patch, "dropout": k_drop, "droppath": k_dpath},
            )
            return loss_fn_inner(logits, target, perm, lam)

        loss, grads = jax.value_and_grad(loss_of)(st.params)
        return loss, grads, step_key

    def plain_body(_, carry):
        st, acc = carry
        x = mel_of(st.step)
        loss, grads, _ = fwd_bwd_opt(st, x)
        updates, opt_state = tx.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=st.step + 1), acc + loss

    def pipelined_body(_, carry):
        st, x, acc = carry
        loss, grads, _ = fwd_bwd_opt(st, x)
        # next step's mel BEFORE the optimizer update: independent of
        # params/grads, co-resident with the HBM-bound AdamW streaming
        x_next = mel_of(st.step + 1)
        updates, opt_state = tx.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        st2 = TrainState(params=params, opt_state=opt_state, step=st.step + 1)
        return st2, x_next, acc + loss

    def run_plain(st):
        return jax.lax.fori_loop(0, STEPS, plain_body, (st, jnp.float32(0.0)))

    def run_pipe(st):
        x0 = mel_of(st.step)
        st, _, acc = jax.lax.fori_loop(
            0, STEPS, pipelined_body, (st, x0, jnp.float32(0.0))
        )
        return st, acc

    results = {}
    for name, fn in (("plain", run_plain), ("pipelined", run_pipe)):
        st = jax.tree_util.tree_map(jnp.copy, state0)
        jfn = jax.jit(fn, donate_argnums=(0,))
        t0 = time.time()
        out = jfn(st)
        float(out[-1])
        print(f"[{name}] compile+first: {time.time()-t0:.1f}s", flush=True)
        st = out[0]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(st)
            float(out[-1])
            best = min(best, time.perf_counter() - t0)
            st = out[0]
        ms = best / STEPS * 1e3
        results[name] = ms
        print(f"[{name}] {ms:.2f} ms/step -> {B / (best / STEPS):.1f} specs/s", flush=True)
    print(results, flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
