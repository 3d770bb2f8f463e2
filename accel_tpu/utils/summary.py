"""Model summary / shape-inference debug helpers.

Reference counterpart: ``lib/utils/symbol.py`` (SURVEY.md §2 "Symbol
utils") — the MXNet Symbol wrapper's infer-shape debugging. The flax
equivalents: param tree tabulation and a shape-eval without running compute.
"""

from __future__ import annotations

import jax


def param_count(variables) -> int:
    tree = variables.get("params", variables) if isinstance(variables, dict) else variables
    return sum(x.size for x in jax.tree.leaves(tree))


def param_summary(variables, max_rows: int = 0) -> str:
    """One line per param leaf: path, shape, dtype, count."""
    tree = variables.get("params", variables) if isinstance(variables, dict) else variables
    rows = []
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        rows.append(
            f"{jax.tree_util.keystr(path):70s} {str(leaf.shape):20s} "
            f"{str(leaf.dtype):10s} {leaf.size:>12,}"
        )
    if max_rows and len(rows) > max_rows:
        rows = rows[:max_rows] + [f"... ({len(flat) - max_rows} more)"]
    total = sum(l.size for _, l in flat)
    rows.append(f"{'TOTAL':70s} {'':20s} {'':10s} {total:>12,}")
    return "\n".join(rows)


def infer_shapes(fn, *example_args):
    """Shape-infer a jittable function without executing it (the reference's
    infer_shape debugging): returns the output ShapeDtypeStruct tree."""
    return jax.eval_shape(fn, *example_args)
