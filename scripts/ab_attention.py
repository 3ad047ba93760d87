"""A/B the Pallas fused attention against the XLA einsum path on the real
chip: full train step (mel+mixup+fwd+bwd+AdamW, the bench.py workload) and
eval forward, both impls. Usage: python -u scripts/ab_attention.py"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from passt_tpu.models.passt import PaSST, PaSSTConfig
from passt_tpu.ops.frontend import MelConfig
from passt_tpu.train.steps import create_train_state, make_optimizer, make_train_step

B, STEPS = 12, 20


def time_train(attn_impl):
    cfg = PaSSTConfig(dtype="bfloat16", s_patchout_t=40, s_patchout_f=4, attn_impl=attn_impl)
    mel_cfg = MelConfig(fmin_aug_range=10, fmax_aug_range=2000)
    tx = make_optimizer(lr=2e-5, steps_per_epoch=1000)
    model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0))
    raw_step = make_train_step(model, tx, mel_cfg, loss_type="multilabel", use_mixup=True, jit=False)
    rng_np = np.random.default_rng(0)
    wave = jnp.asarray(rng_np.standard_normal((B, 320000)).astype(np.float32))
    target = jnp.asarray((rng_np.uniform(size=(B, 527)) < 0.05).astype(np.float32))
    base_rng = jax.random.PRNGKey(42)

    def run_n(state, wave, target):
        def body(_, carry):
            st, acc = carry
            st, m = raw_step(st, {"wave": wave, "target": target}, base_rng)
            return st, acc + m["loss"]
        return jax.lax.fori_loop(0, STEPS, body, (state, jnp.float32(0.0)))

    fn = jax.jit(run_n, donate_argnums=(0,))
    t0 = time.perf_counter()
    state, _ = fn(state, wave, target)
    print(f"[{attn_impl}] compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, s = fn(state, wave, target)
        float(s)
        best = min(best, time.perf_counter() - t0)
    ms = best / STEPS * 1e3
    print(f"[{attn_impl}] train step: {ms:.2f} ms -> {B/ (best/STEPS):.1f} specs/s", flush=True)
    return ms


def time_eval(attn_impl):
    cfg = PaSSTConfig(dtype="bfloat16", attn_impl=attn_impl)
    model = PaSST(cfg)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((B, 1, 128, 998)).astype(np.float32))
    params = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, x, train=False))()

    def run_n(params, x):
        def body(_, acc):
            return acc + model.apply(params, x, train=False)[0].sum()
        return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))

    fn = jax.jit(run_n)
    t0 = time.perf_counter()
    float(fn(params, x))
    print(f"[{attn_impl}] eval compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(params, x))
        best = min(best, time.perf_counter() - t0)
    ms = best / STEPS * 1e3
    print(f"[{attn_impl}] eval fwd (B={B}, N=1190): {ms:.2f} ms", flush=True)
    return ms


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    r = {}
    for impl in ("xla", "fused"):
        r[f"train_{impl}"] = time_train(impl)
    for impl in ("xla", "fused"):
        r[f"eval_{impl}"] = time_eval(impl)
    print(r, flush=True)
    print(f"train speedup: {r['train_xla']/r['train_fused']:.3f}x; "
          f"eval speedup: {r['eval_xla']/r['eval_fused']:.3f}x", flush=True)
