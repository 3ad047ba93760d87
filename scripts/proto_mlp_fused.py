"""Prototype: fused MLP (fc1 -> tanh-GELU -> fc2) Pallas kernel.

The one place left where beating XLA's own matmul scheduling is even
conceivable (PARITY.md "Distance to the bar": the remaining ~17 ms is
matmul work at the measured MXU floor) is the HBM traffic BETWEEN the
MLP's two matmuls: XLA must materialize the [M, 3072] hidden activation
(35 MB bf16 at train M=5688) between fc1 and fc2 — write + read in the
forward — plus the saved-deriv residual, and the [M, 3072] dh in the
backward (write + 2 reads: dx matmul, dW1 matmul). A fused kernel keeps
the hidden row-block in VMEM:

  fwd : x[bm,768] -> h = x@W1+b1 (fp32) -> g,d = tanh-GELU(h), gelu'(h)
        -> y = g@W2+b2; writes y (+ g, d as residuals for the backward).
        Saves the h/g round-trip (fc2 reads g from VMEM, not HBM).
  bwd : dy[bm,768] -> dg = dy@W2^T (fp32) -> dh = dg*d -> dx = dh@W1^T;
        writes dx and dh (dh feeds the XLA dW1 = x^T@dh matmul).
        Saves one full [M,3072] read (XLA reads dh twice).

Both kernels hold W1 [768,3072] and W2 [3072,768] (9.4 MB bf16 together)
VMEM-resident across grid steps (constant index_map -> fetched once), so
weight traffic does not scale with the number of row blocks. dW1/dW2/db
stay as XLA matmuls outside (VMEM cannot hold fp32 [768,3072] grad
accumulators on top of the weights).

Shapes: train M = B*N = 12*474 = 5688; eval M = 12*1190 = 14280.
Variants:
  xla   : production composition (Dense bf16 + tanh_gelu saved-deriv VJP)
  fuse_f: fused forward, no residual outputs (upper bound of the fwd win)
  fuse  : fused forward emitting (y, g, d) + XLA backward (custom VJP)
  fuse2 : fuse + fused dx/dh backward kernel

VERDICT (4 independent chip runs, 2026-08-18/19; PARITY.md "Measured
dead ends"): NOT shipped. fwd 0.21-0.32 ms vs 0.27-0.28 XLA (one
outlier win, otherwise neutral-to-slower — the kernel's run-to-run
variance exceeds its best-case margin); fwd+bwd 0.91-0.95 vs
0.86-0.88 ms at train M; eval M fwd 0.74 vs 0.70. XLA's tiled chaining
of the two matmuls already overlaps the h round-trip with MXU work; the
custom kernel forfeits that pipelining (the LN-backward mechanism).
Numerics were exact (bf16-ulp fwd, grad rel err ~7e-3 == bf16 noise).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from passt_tpu.ops.activations import tanh_gelu, _C, _A

C, HID = 768, 3072
STEPS = 100


def _gelu_parts(h):
    """fp32 h -> (gelu(h), gelu'(h)) sharing one tanh (ops/activations.py)."""
    u = _C * (h + _A * h * h * h)
    t = jnp.tanh(u)
    g = 0.5 * h * (1.0 + t)
    d = 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * _C * (1.0 + 3.0 * _A * h * h)
    return g, d


def _dot(a, b, dims, precision):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )


# ------------------------------------------------------------------ kernels
def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, *rest,
                precision, residuals):
    x = x_ref[...]
    h = _dot(x, w1_ref[...], ((1,), (0,)), precision) + b1_ref[...].astype(jnp.float32)
    g, d = _gelu_parts(h)
    gc = g.astype(x.dtype)
    if residuals:
        g_ref, d_ref = rest
        g_ref[...] = gc
        d_ref[...] = d.astype(d_ref.dtype)
    y = _dot(gc, w2_ref[...], ((1,), (0,)), precision) + b2_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(dy_ref, d_ref, w1_ref, w2_ref, dx_ref, dh_ref, *, precision):
    dy = dy_ref[...]
    # dg = dy @ W2^T  (contract over C), fp32
    dg = _dot(dy, w2_ref[...], ((1,), (1,)), precision)
    dh = dg * d_ref[...].astype(jnp.float32)
    dhc = dh.astype(dh_ref.dtype)
    dh_ref[...] = dhc
    # dx = dh @ W1^T  (contract over HID)
    dx_ref[...] = _dot(dhc, w1_ref[...], ((1,), (1,)), precision).astype(dx_ref.dtype)


def _row_spec(bm, cols):
    return pl.BlockSpec((bm, cols), lambda i: (i, 0))


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0))


def _prec(dtype):
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def fused_mlp_fwd_call(x, w1, b1, w2, b2, *, bm, residuals, interpret):
    m, c = x.shape
    hid = w1.shape[1]
    grid = (pl.cdiv(m, bm),)
    cost = pl.CostEstimate(
        flops=4 * m * c * hid,
        bytes_accessed=(2 * m * c + (2 * m * hid if residuals else 0)
                        + c * hid * 2) * x.dtype.itemsize,
        transcendentals=m * hid,
    )
    kernel = functools.partial(
        _fwd_kernel, precision=_prec(x.dtype), residuals=residuals
    )
    out_specs = [_row_spec(bm, c)]
    out_shape = [jax.ShapeDtypeStruct((m, c), x.dtype)]
    if residuals:
        out_specs += [_row_spec(bm, hid), _row_spec(bm, hid)]
        out_shape += [
            jax.ShapeDtypeStruct((m, hid), x.dtype),
            jax.ShapeDtypeStruct((m, hid), x.dtype),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _row_spec(bm, c),
            _const_spec((c, hid)),
            _const_spec((1, hid)),
            _const_spec((hid, c)),
            _const_spec((1, c)),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=cost,
        interpret=interpret,
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    if residuals:
        return outs
    return outs[0] if isinstance(outs, (tuple, list)) else outs


def fused_mlp_bwd_call(dy, d, w1, w2, *, bm, interpret):
    m, c = dy.shape
    hid = w1.shape[1]
    cost = pl.CostEstimate(
        flops=4 * m * c * hid,
        bytes_accessed=(2 * m * c + 2 * m * hid + 2 * c * hid) * dy.dtype.itemsize,
        transcendentals=0,
    )
    dx, dh = pl.pallas_call(
        functools.partial(_bwd_kernel, precision=_prec(dy.dtype)),
        grid=(pl.cdiv(m, bm),),
        in_specs=[
            _row_spec(bm, c),
            _row_spec(bm, hid),
            _const_spec((c, hid)),
            _const_spec((hid, c)),
        ],
        out_specs=(_row_spec(bm, c), _row_spec(bm, hid)),
        out_shape=(
            jax.ShapeDtypeStruct((m, c), dy.dtype),
            jax.ShapeDtypeStruct((m, hid), dy.dtype),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=cost,
        interpret=interpret,
    )(dy, d, w1, w2)
    return dx, dh


# ------------------------------------------------------- differentiable wrap
def make_fused_mlp(bm, interpret, fused_bwd):
    @jax.custom_vjp
    def mlp(x, w1, b1, w2, b2):
        return fused_mlp_fwd_call(
            x, w1, b1, w2, b2, bm=bm, residuals=False, interpret=interpret
        )

    def fwd(x, w1, b1, w2, b2):
        y, g, d = fused_mlp_fwd_call(
            x, w1, b1, w2, b2, bm=bm, residuals=True, interpret=interpret
        )
        return y, (x, g, d, w1, w2)

    def bwd(res, dy):
        x, g, d, w1, w2 = res
        prec = _prec(dy.dtype)
        if fused_bwd:
            dx, dh = fused_mlp_bwd_call(dy, d, w1, w2, bm=bm, interpret=interpret)
        else:
            dg = _dot(dy, w2, ((1,), (1,)), prec)
            dh_f = dg * d.astype(jnp.float32)
            dh = dh_f.astype(dy.dtype)
            dx = _dot(dh, w1, ((1,), (1,)), prec).astype(dy.dtype)
        dw1 = _dot(x, dh, ((0,), (0,)), prec).astype(w1.dtype)
        db1 = jnp.sum(dh.astype(jnp.float32), axis=0).astype(dy.dtype)
        dw2 = _dot(g, dy, ((0,), (0,)), prec).astype(w2.dtype)
        db2 = jnp.sum(dy.astype(jnp.float32), axis=0).astype(dy.dtype)
        return dx, dw1, db1, dw2, db2

    mlp.defvjp(fwd, bwd)
    return mlp


def xla_mlp(x, w1, b1, w2, b2):
    prec = _prec(x.dtype)
    h = (_dot(x, w1, ((1,), (0,)), prec) + b1.astype(jnp.float32)).astype(x.dtype)
    g = tanh_gelu(h)
    y = _dot(g, w2, ((1,), (0,)), prec) + b2.astype(jnp.float32)
    return y.astype(x.dtype)


# ----------------------------------------------------------------- harness
def timed(fn, *args, steps=STEPS, reps=3):
    def run_n(n, *a):
        def body(_, acc):
            eps = acc * jnp.float32(1e-20)
            first = a[0] + eps.astype(a[0].dtype)
            r = fn(first, *a[1:])
            return acc + jax.tree_util.tree_reduce(
                lambda s, x: s + x.sum().astype(jnp.float32), r, jnp.float32(0)
            )
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
    return best


def loss_of(fn):
    return lambda *a: (fn(*a).astype(jnp.float32) ** 2).mean()


def main():
    interpret = jax.default_backend() != "tpu"
    print("backend:", jax.default_backend(), "interpret:", interpret, flush=True)
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.standard_normal((C, HID)).astype(np.float32) * 0.02).astype(jnp.bfloat16)
    b1 = jnp.zeros((HID,), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((HID, C)).astype(np.float32) * 0.02).astype(jnp.bfloat16)
    b2 = jnp.zeros((C,), jnp.bfloat16)

    for m in (5688, 14280):
        x = jnp.asarray(rng.standard_normal((m, C)).astype(np.float32)).astype(jnp.bfloat16)
        print(f"\n== M={m} ==", flush=True)
        y_ref = xla_mlp(x, w1, b1, w2, b2)

        for bm in (128, 256, 512):
            try:
                fused = make_fused_mlp(bm, interpret, fused_bwd=False)
                y = fused(x, w1, b1, w2, b2)
                err = float(jnp.max(jnp.abs(
                    y.astype(jnp.float32) - y_ref.astype(jnp.float32))))
                dt_f = timed(fused, x, w1, b1, w2, b2)
                print(f"fwd  fuse bm={bm}: {dt_f*1e3:.4f} ms (err {err:.2e})", flush=True)
            except Exception as e:  # noqa: BLE001 - prototype sweep
                print(f"fwd  fuse bm={bm}: FAIL {type(e).__name__}: {e}", flush=True)
        dt_x = timed(xla_mlp, x, w1, b1, w2, b2)
        print(f"fwd  xla      : {dt_x*1e3:.4f} ms", flush=True)

        # grads: check + time at the best block size
        for bm in (64, 128):
            for fused_bwd in (False, True):
                tag = f"fuse{'2' if fused_bwd else ' '} bm={bm}"
                try:
                    fused = make_fused_mlp(bm, interpret, fused_bwd=fused_bwd)
                    gx = jax.grad(loss_of(xla_mlp), argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
                    gn = jax.grad(loss_of(fused), argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
                    rel = max(
                        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
                              / (float(jnp.max(jnp.abs(a.astype(jnp.float32)))) + 1e-9))
                        for a, b in zip(gx, gn)
                    )
                    dt = timed(jax.grad(loss_of(fused), argnums=(0, 1, 2, 3, 4)),
                               x, w1, b1, w2, b2)
                    print(f"f+b  {tag}: {dt*1e3:.4f} ms (grad rel err {rel:.2e})", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"f+b  {tag}: FAIL {type(e).__name__}: {e}", flush=True)
        dt_xg = timed(jax.grad(loss_of(xla_mlp), argnums=(0, 1, 2, 3, 4)),
                      x, w1, b1, w2, b2)
        print(f"f+b  xla      : {dt_xg*1e3:.4f} ms", flush=True)


if __name__ == "__main__":
    main()
