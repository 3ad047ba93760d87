"""Bound the last ≈3 ms of 'residual' step glue with measured components
(flagship geometry, bf16): patchout gather + disentangled pos-embed add
(fwd/grad), and mixup + BCE loss + classifier head (fwd/grad).
Usage: python -u scripts/profile_residual.py"""
import os, sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_step import timed

B, Fg, Tg, D, C = 12, 12, 99, 768, 527


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, Fg, Tg, D)), jnp.bfloat16)
    f_emb = jnp.asarray(rng.standard_normal((1, Fg, 1, D)) * 0.02, jnp.float32)
    t_emb = jnp.asarray(rng.standard_normal((1, 1, Tg, D)) * 0.02, jnp.float32)
    gsum = lambda r: jax.tree_util.tree_reduce(
        lambda s, y: s + jnp.sum(y).astype(jnp.float32), r, jnp.float32(0))

    def patchout(x, f_emb, t_emb):
        h = (x.astype(jnp.float32) + f_emb + t_emb).astype(jnp.bfloat16)
        h = h.reshape(B, Fg * Tg, D)
        keep_f = jnp.sort(jax.random.permutation(jax.random.PRNGKey(0), Fg)[: Fg - 4])
        keep_t = jnp.sort(jax.random.permutation(jax.random.PRNGKey(1), Tg)[: Tg - 40])
        h = h.reshape(B, Fg, Tg, D)
        h = jnp.take(h, keep_f, axis=1)
        h = jnp.take(h, keep_t, axis=2)
        return h.reshape(B, -1, D)

    feats = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    w_head = jnp.asarray(rng.standard_normal((D, C)) * 0.02, jnp.float32)
    y = jnp.asarray((rng.uniform(size=(B, C)) < 0.05), jnp.float32)

    def head_loss(feats, w_head):
        lam = 0.7
        mixed = lam * feats + (1 - lam) * jnp.flip(feats, 0)
        logits = mixed @ w_head
        ls = jnp.clip(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        return ls.mean()

    # Weight the summed outputs by a random array so the backward is a real
    # scatter/matmul of data (a plain sum's gradient is a constant XLA can
    # fold away, which under-measures the grad entries).
    wt = jnp.asarray(rng.standard_normal((B, (Fg - 4) * (Tg - 40), D)), jnp.bfloat16)

    def patchout_loss(x, f, t):
        return jnp.sum((patchout(x, f, t) * wt).astype(jnp.float32))

    entries = [
        ("posembed+patchout fwd", lambda *a: gsum(patchout(*a)), (x, f_emb, t_emb), 1),
        ("posembed+patchout grad", lambda *a: gsum(jax.grad(
            patchout_loss, argnums=(0, 1, 2))(*a)), (x, f_emb, t_emb), 1),
        ("mixup+head+BCE fwd", lambda *a: head_loss(*a), (feats, w_head), 1),
        ("mixup+head+BCE grad", lambda *a: gsum(jax.grad(head_loss, argnums=(0, 1))(*a)), (feats, w_head), 1),
    ]
    for name, fn, args, mult in entries:
        try:
            ms = timed(fn, *args, steps=40, reps=5) * 1e3
        except RuntimeError as e:
            print(f"[resid] {name}: SKIPPED ({e})", flush=True)
            continue
        print(f"[resid] {name}: {ms:.4f} ms", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
