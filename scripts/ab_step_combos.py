"""A/B the full train step across (attention impl) x (optimizer moments):
xla/fused attention, fp32/bfloat16_sr AdamW moments. The bench.py workload
(mel+mixup+fwd+bwd+opt, B=12, fori_loop in one jit, donated state).
Usage: python -u scripts/ab_step_combos.py [combo ...]
  combos: base attn opt both   (default: all four)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from passt_tpu.models.passt import PaSSTConfig
from passt_tpu.ops.frontend import MelConfig
from passt_tpu.train.steps import create_train_state, make_optimizer, make_train_step

B = int(os.environ.get("AB_BATCH", "12"))  # specs/s = B/ms normalizes across sizes
STEPS = 20

COMBOS = {
    "base": ("xla", None, "conv", False, "xla"),
    "attn": ("fused", None, "conv", False, "xla"),
    "opt": ("xla", "bfloat16_sr", "conv", False, "xla"),
    "both": ("fused", "bfloat16_sr", "conv", False, "xla"),
    "unfold": ("fused", "bfloat16_sr", "unfold", False, "xla"),  # + frame patch embed
    "gelu": ("fused", "bfloat16_sr", "unfold", True, "xla"),  # + saved-deriv GELU bwd
    "ln": ("fused", "bfloat16_sr", "unfold", True, "fused"),  # + one-pass LN bwd
}


def run(name, attn_impl, moments, patch_embed="unfold", gelu_sd=True, ln_impl="xla"):
    cfg = PaSSTConfig(
        dtype="bfloat16", s_patchout_t=40, s_patchout_f=4, attn_impl=attn_impl,
        patch_embed_impl=patch_embed, gelu_saved_deriv=gelu_sd, ln_impl=ln_impl,
    )
    mel_cfg = MelConfig(fmin_aug_range=10, fmax_aug_range=2000)
    tx = make_optimizer(lr=2e-5, steps_per_epoch=1000, moments_dtype=moments)
    model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, mel_cfg, loss_type="multilabel", use_mixup=True, jit=False)
    rng_np = np.random.default_rng(0)
    wave = jnp.asarray(rng_np.standard_normal((B, 320000)).astype(np.float32))
    target = jnp.asarray((rng_np.uniform(size=(B, 527)) < 0.05).astype(np.float32))
    base_rng = jax.random.PRNGKey(42)

    def run_n(state, wave, target):
        def body(_, carry):
            st, acc = carry
            st, m = step(st, {"wave": wave, "target": target}, base_rng)
            return st, acc + m["loss"]
        return jax.lax.fori_loop(0, STEPS, body, (state, jnp.float32(0.0)))

    fn = jax.jit(run_n, donate_argnums=(0,))
    t0 = time.perf_counter()
    state, _ = fn(state, wave, target)
    print(f"[{name}] compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, s = fn(state, wave, target)
        float(s)
        best = min(best, time.perf_counter() - t0)
    ms = best / STEPS * 1e3
    print(f"[{name}] {ms:.2f} ms/step -> {B/(best/STEPS):.1f} specs/s", flush=True)
    return ms


if __name__ == "__main__":
    names = sys.argv[1:] or list(COMBOS)
    print("backend:", jax.default_backend(), flush=True)
    res = {}
    for n in names:
        res[n] = run(n, *COMBOS[n])
    print(res, flush=True)
