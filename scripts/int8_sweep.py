"""Block-size sweep for the Pallas int8 matmul — find the chip's peak
achievable int8 rate (companion to scripts/int8_matmul_micro.py)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from scripts.int8_matmul_micro import pallas_matmul, timed

rng = np.random.default_rng(0)


def probe(m, k, n, bm, bn, bk, dtype, steps=200):
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 128, (m, k), dtype=np.int8))
        b = jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))
    else:
        a = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32), dtype)
        b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32), dtype)
    try:
        dt = timed(lambda p, q: pallas_matmul(p, q, bm, bn, bk), a, b, steps=steps)
    except Exception as e:
        print(f"  ({bm},{bn},{bk}) FAILED: {str(e)[:100]}")
        return None
    tops = 2 * m * k * n / dt / 1e12
    print(f"  ({bm},{bn},{bk}) {dtype.__name__}: {tops:.1f} TOP/s", flush=True)
    return tops


print("qkv shape 5696x768x2304, int8 block sweep:")
for bm, bn, bk in [(512, 768, 768), (1024, 768, 768), (2848, 768, 768),
                   (512, 2304, 768), (1424, 2304, 768), (2848, 2304, 768),
                   (5696, 2304, 768), (1424, 1152, 768), (2848, 1152, 768)]:
    probe(5696, 768, 2304, bm, bn, bk, jnp.int8)

print("square 8192^3, int8:")
for bm, bn, bk in [(512, 512, 2048), (1024, 512, 2048), (512, 1024, 2048),
                   (1024, 1024, 1024), (2048, 512, 1024), (512, 2048, 1024)]:
    probe(8192, 8192, 8192, bm, bn, bk, jnp.int8, steps=20)

print("square 8192^3, bf16 (same kernel structure, best-of):")
for bm, bn, bk in [(512, 1024, 2048), (1024, 1024, 1024)]:
    probe(8192, 8192, 8192, bm, bn, bk, jnp.bfloat16, steps=20)
