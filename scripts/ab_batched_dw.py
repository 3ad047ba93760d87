#!/usr/bin/env python
"""Micro A/B: per-block dW GEMMs + fused optimizer epilogues vs batched
[12, ...] dW GEMMs + ONE stacked optimizer fusion.

VERDICT r4 item 1(a) hypothesized that the 6.20 ms/step of per-block
weight-grad GEMMs (39-50% MXU with the bf16+SR update fused in, PARITY.md
"Profile attribution") would shrink if the 12 blocks' dW GEMMs became
batched GEMMs over a stacked [12, ...] axis with the optimizer applied
once to stacked leaves. The full-model nn.scan attempt answers a
DIFFERENT question (scan runs the same GEMM 12x sequentially and was
measured 27.30 -> 33.38 ms/step, scripts/ab_scan_blocks.py); this micro
isolates the actual hypothesis with the real shapes, real activations
layout, and the real bf16+SR update math:

  A (status quo): for each of 12 blocks, 4 dW GEMMs ([5688,768]^T@...) each
    followed immediately by the AdamW+SR update of that weight — XLA fuses
    the epilogue into the GEMM as in the production step.
  B (batched):   4 batched dot_generals over the stacked [12, ...] inputs,
    then ONE AdamW+SR fusion per weight type on [12, ...] leaves.

Same FLOPs, same bytes of activations; what differs is GEMM batching and
epilogue placement. If B does not beat A by clearly more than the extra
HBM pass it pays (~1.3 ms for 86M params' moments at 819 GB/s), the lever
is closed for good.

Run on the real chip: python scripts/ab_batched_dw.py [--iters 40]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

DEPTH = 12
M = 12 * 474  # B * N at the flagship train geometry
C = 768
SHAPES = {  # weight-type -> (in_dim, out_dim); dW = x^T @ g
    "qkv": (C, 3 * C),
    "proj": (C, C),
    "fc1": (C, 4 * C),
    "fc2": (4 * C, C),
}
B1, B2, EPS, LR, WD = 0.9, 0.999, 1e-8, 2e-5, 1e-4


def adamw_sr_update(w, mu, nu, g, key):
    """The production bf16+SR AdamW leaf update (train/optim.py semantics,
    simplified to a fixed step count): fp32 math, bf16 storage, nu and the
    param store stochastic-rounded via hardware RNG."""
    gf = g.astype(jnp.float32)
    mu_f = mu.astype(jnp.float32) * B1 + (1 - B1) * gf
    nu_f = nu.astype(jnp.float32) * B2 + (1 - B2) * gf * gf
    upd = LR * (mu_f / (jnp.sqrt(nu_f) + EPS) + WD * w.astype(jnp.float32))
    # the production hardware-RNG stochastic round (train/optim.py; the
    # threefry software path was a measured dead end, PARITY.md)
    from passt_tpu.train.optim import _stochastic_round_bf16 as sr

    k1, k2 = jax.random.split(key)
    return (
        sr(w.astype(jnp.float32) - upd, k1),
        mu_f.astype(jnp.bfloat16),
        sr(nu_f, k2),
    )


def make_inputs(batched: bool):
    rng = np.random.default_rng(0)

    def arr(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(
            jnp.bfloat16
        )

    xs = {k: arr((DEPTH, M, i)) for k, (i, o) in SHAPES.items()}
    gs = {k: arr((DEPTH, M, o)) for k, (i, o) in SHAPES.items()}
    ws = {k: arr((DEPTH, i, o)) for k, (i, o) in SHAPES.items()}
    mus = jax.tree.map(jnp.zeros_like, ws)
    nus = jax.tree.map(jnp.zeros_like, ws)
    return xs, gs, ws, mus, nus


def step_per_block(ws, mus, nus, xs, gs, key):
    """A: 12 x 4 separate dW GEMMs, each with its own fused epilogue."""
    new_w, new_mu, new_nu = {}, {}, {}
    keys = jax.random.split(key, DEPTH * len(SHAPES))
    ki = 0
    for name in SHAPES:
        w_l, mu_l, nu_l = [], [], []
        for l in range(DEPTH):
            dw = jax.lax.dot_general(
                xs[name][l], gs[name][l],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            w2, mu2, nu2 = adamw_sr_update(
                ws[name][l], mus[name][l], nus[name][l], dw, keys[ki]
            )
            ki += 1
            w_l.append(w2); mu_l.append(mu2); nu_l.append(nu2)
        new_w[name] = jnp.stack(w_l)
        new_mu[name] = jnp.stack(mu_l)
        new_nu[name] = jnp.stack(nu_l)
    return new_w, new_mu, new_nu


def step_batched(ws, mus, nus, xs, gs, key):
    """B: 4 batched [12, ...] GEMMs + one stacked epilogue per weight type."""
    new_w, new_mu, new_nu = {}, {}, {}
    keys = jax.random.split(key, len(SHAPES))
    for ki, name in enumerate(SHAPES):
        dw = jax.lax.dot_general(
            xs[name], gs[name],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),  # [12, in, out]
            preferred_element_type=jnp.float32,
        )
        new_w[name], new_mu[name], new_nu[name] = adamw_sr_update(
            ws[name], mus[name], nus[name], dw, keys[ki]
        )
    return new_w, new_mu, new_nu


def measure(step, iters, trials=3):
    xs, gs, ws, mus, nus = make_inputs(step is step_batched)

    def run_n(ws, mus, nus, xs, gs):
        def body(i, carry):
            ws, mus, nus = carry
            return step(ws, mus, nus, xs, gs, jax.random.fold_in(jax.random.PRNGKey(7), i))

        return jax.lax.fori_loop(0, iters, body, (ws, mus, nus))

    fn = jax.jit(run_n, donate_argnums=(0, 1, 2))
    out = fn(ws, mus, nus, xs, gs)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))  # true sync
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(*out, xs, gs)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    flops = 2 * DEPTH * M * sum(i * o for i, o in SHAPES.values()) * iters
    ms = best / iters * 1e3
    return {"ms_per_iter": round(ms, 3), "tflops": round(flops / best / 1e12, 1)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=40)
    args = p.parse_args(argv)
    a = measure(step_per_block, args.iters)
    print(json.dumps({"variant": "per_block_fused_epilogue", **a}), flush=True)
    b = measure(step_batched, args.iters)
    print(json.dumps({"variant": "batched_stacked_epilogue", **b}), flush=True)
    print(
        json.dumps(
            {"delta_ms": round(b["ms_per_iter"] - a["ms_per_iter"], 3),
             "speedup": round(a["ms_per_iter"] / b["ms_per_iter"], 4)}
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
