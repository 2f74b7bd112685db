"""Hoist closed-over array constants out of a traced function.

Kernel step functions close over large device constants (ETDRK4 tables,
wavenumber grids, DFT matrices — ~0.4 GB at 2048²). Left in place, jit
embeds them as HLO literals, which both bloats compile and overflows the
remote-compile transport on the target TPU stack (HTTP 413). ``hoist``
traces the function once, extracts the jaxpr's constants, and returns a
function taking them as a leading argument so they become ordinary device
parameters.
"""

from __future__ import annotations

from typing import Any, Callable, List, Tuple

import jax
from jax import tree_util as jtu


def hoist(f: Callable, *example_args) -> Tuple[Callable, List[Any]]:
    """Return ``(g, consts)`` with ``g(consts, *args) == f(*args)``.

    ``example_args`` must match the structure/shapes/dtypes of later calls.
    ``consts`` is the list of arrays the trace closed over; pass it (or a
    transformed copy) as the first argument of ``g``.
    """
    flat_ex, in_tree = jtu.tree_flatten(example_args)
    out_store = {}

    def flat_f(*leaves):
        args = jtu.tree_unflatten(in_tree, leaves)
        out = f(*args)
        out_flat, out_tree = jtu.tree_flatten(out)
        out_store["tree"] = out_tree
        return out_flat

    closed = jax.make_jaxpr(flat_f)(*flat_ex)
    jaxpr, consts = closed.jaxpr, list(closed.consts)
    out_tree = out_store["tree"]

    def g(consts_, *args):
        leaves = jtu.tree_flatten(args)[0]
        out_flat = jax.core.eval_jaxpr(jaxpr, consts_, *leaves)
        return jtu.tree_unflatten(out_tree, out_flat)

    return g, consts
