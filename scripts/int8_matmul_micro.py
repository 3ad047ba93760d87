"""Pallas int8 matmul microbenchmark (VERDICT round-2 next #1b).

Round 2 measured XLA `dot` at only 1.06x int8-vs-bf16 on this chip, which
bounds XLA's *lowering*, not the hardware: the v5e datasheet rates the MXU
at 394 TOP/s int8 vs 197 TFLOP/s bf16 (2x). This script settles whether a
*custom* Mosaic kernel can reach the datasheet rate at the model's own
matmul shapes ([5688,768]x[768,2304] qkv, the two MLP shapes) and at a
clean 8192^3 probe.

Kernel: canonical tiled matmul — grid (M/bm, N/bn, K/bk), K innermost,
VMEM accumulator scratch persisting across the K loop (int32 for int8
inputs, fp32 for bf16), output written on the last K step. Identical
structure for both dtypes so the comparison isolates the MXU issue rate.

Prints one JSON block for PARITY.md.

Run: python scripts/int8_matmul_micro.py   (real chip; not under pytest).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, steps=100, reps=3):
    """Best per-invocation time via the (t(3n)-t(n))/2n differenced fori_loop
    (same harness as scripts/profile_step.py; dispatch/RTT cancels)."""

    def run_n(n, *a):
        def body(_, acc):
            first = a[0]
            if jnp.issubdtype(first.dtype, jnp.floating):
                first = first + (acc * jnp.float32(1e-20)).astype(first.dtype)
            else:
                # integer inputs: flip the low bit of one element via the
                # accumulator parity so the loop body stays data-dependent
                first = first.at[0, 0].set((first[0, 0] ^ (acc.astype(jnp.int32) & 1)).astype(first.dtype))
            r = fn(first, *a[1:])
            return acc + r.sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    g = jax.jit(run_n)
    float(g(jnp.int32(steps), *args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(jnp.int32(steps), *args))
        t1 = time.perf_counter()
        float(g(jnp.int32(3 * steps), *args))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / (2 * steps)
        if dt > 0:
            best = min(best, dt)
    if best == float("inf"):
        raise RuntimeError("noise-dominated timing")
    return best


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, k_steps, acc_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=acc_dtype)

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def pallas_matmul(a, b, bm, bn, bk, out_dtype=jnp.bfloat16):
    m, k = a.shape
    k2, n = b.shape
    assert k == k2 and m % bm == 0 and n % bn == 0 and k % bk == 0
    acc_dtype = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        functools.partial(_mm_kernel, k_steps=grid[2], acc_dtype=acc_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(a, b)


# (m, k, n) -> (bm, bn, bk) block choices, the winners of a block sweep
# (scripts/int8_sweep.py) on this chip. K fits VMEM whole for model shapes.
SHAPES = {
    "qkv_5688x768x2304": ((5688, 768, 2304), (2848, 768, 768)),
    "mlp1_5688x768x3072": ((5688, 768, 3072), (2848, 768, 768)),
    "mlp2_5688x3072x768": ((5688, 3072, 768), (2848, 768, 768)),
    # int32 output blocks at 8192^2 blow the 16 MB VMEM scope at larger
    # tiles; (1024,1024,1024) is the sweep winner that fits
    "square_8192": ((8192, 8192, 8192), (1024, 1024, 1024)),
}


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    results = {}

    for label, ((m, k, n), (bm, bn, bk)) in SHAPES.items():
        # pad M up to the block multiple (5688 = 8*711; use 5696 = 8*712)
        m_pad = ((m + bm - 1) // bm) * bm
        flops = 2 * m_pad * k * n

        a8 = jnp.asarray(rng.integers(-127, 128, (m_pad, k), dtype=np.int8))
        b8 = jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))
        abf = jnp.asarray(rng.standard_normal((m_pad, k)).astype(np.float32), jnp.bfloat16)
        bbf = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32), jnp.bfloat16)

        # correctness first (tiny slice vs numpy on the int8 path). Skipped
        # at the square probe: its int32 output blocks at the swept tile
        # sizes exceed the VMEM scope; exactness is established at the three
        # model shapes, which share the kernel.
        if m < 8192:
            out = np.asarray(pallas_matmul(a8, b8, bm, bn, bk, out_dtype=jnp.int32)[:64, :64])
            ref = np.asarray(a8[:64], np.int32) @ np.asarray(b8[:, :64], np.int32)
            assert np.array_equal(out, ref), f"{label}: int8 kernel wrong"

        pallas_variants = [("int8", (a8, b8))]
        if m < 8192:  # bf16 blocks at the square tile sizes exceed VMEM;
            pallas_variants.insert(0, ("bf16", (abf, bbf)))  # XLA bf16 is
            # the 188 TFLOP/s square anchor (PARITY.md roofline)
        for name, (x, y) in pallas_variants:
            dt = timed(lambda p, q: pallas_matmul(p, q, bm, bn, bk), x, y,
                       steps=30 if m >= 8192 else 200)
            results[f"{label}_pallas_{name}_tops"] = round(flops / dt / 1e12, 1)
            print(f"{label} pallas {name}: {results[f'{label}_pallas_{name}_tops']} TOP/s",
                  flush=True)

        # XLA reference at identical shapes
        for name, (x, y) in (("bf16", (abf, bbf)), ("int8", (a8, b8))):
            pref = jnp.int32 if name == "int8" else jnp.bfloat16
            dt = timed(
                lambda p, q: jax.lax.dot_general(
                    p, q, (((1,), (0,)), ((), ())), preferred_element_type=pref
                ),
                x, y, steps=30 if m >= 8192 else 200,
            )
            results[f"{label}_xla_{name}_tops"] = round(flops / dt / 1e12, 1)
            print(f"{label} xla {name}: {results[f'{label}_xla_{name}_tops']} TOP/s",
                  flush=True)

        r = results
        best_bf16 = max(
            r.get(f"{label}_pallas_bf16_tops", 0.0), r[f"{label}_xla_bf16_tops"]
        )
        results[f"{label}_int8_vs_best_bf16"] = round(
            r[f"{label}_pallas_int8_tops"] / best_bf16, 2
        )

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
