"""Parameter accounting (reference: helpers/models_size.py:7-32 —
``count_non_zero_params`` logged into run info at ex_audioset.py:121-123)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def count_non_zero_params(params) -> Tuple[str, int, int]:
    """Returns (description, total, non_zero) like the reference helper."""
    total = 0
    non_zero = 0
    for leaf in jax.tree.leaves(params):
        arr = np.asarray(leaf)
        total += arr.size
        non_zero += int(np.count_nonzero(arr))
    desc = f"{total:,} params, {non_zero:,} non-zero ({non_zero / max(total, 1):.1%})"
    return desc, total, non_zero


def param_summary(params, max_depth: int = 2) -> str:
    """Per-subtree parameter counts (the reference relied on PL's
    weights_summary='full'; this is the torch-free equivalent)."""
    lines = []

    def walk(node, path, depth):
        if isinstance(node, dict) and depth < max_depth:
            for k in sorted(node):
                walk(node[k], path + "/" + k if path else k, depth + 1)
        else:
            n = count_params(node)
            lines.append(f"{path:<40s} {n:>12,}")

    walk(params, "", 0)
    lines.append(f"{'TOTAL':<40s} {count_params(params):>12,}")
    return "\n".join(lines)
