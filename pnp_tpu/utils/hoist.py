"""Closure-constant hoisting for jitted programs on huge meshes.

The remote TPU compile service ships every jit closure CONSTANT inside
the compile request body, and requests above ~500 MB die with
"HTTP 413: length limit exceeded" (round-3 lesson; solver state such as
factors and inverses is therefore threaded through the ``phi_pre``
runtime argument of workloads/instationary_pnp_from_pb.py). The element
TABLES (gradphi/qw/qy per quadrature order, the mass element blocks)
are still captured by every stage/Poisson program closure — fine up to
the 367k-element level-3 pore (~150 MB per program), but the
1.47M-element level-4 pore puts ~0.3-1.2 GB of table constants into a
single program and the compile request dies before the device ever sees
the HLO.

:func:`jit_hoisted` is a drop-in ``jax.jit`` replacement that, on first
call per argument structure, traces the function with
``jax.make_jaxpr`` — whose ``ClosedJaxpr.consts`` are exactly the
captured concrete arrays — and jits an ``eval_jaxpr`` wrapper taking
those consts as leading RUNTIME ARGUMENTS. Tables then reach the
program as device parameters and never ride the compile request.
(``jax.closure_convert`` does NOT do this: it only hoists
tracer-consts from outer transformation scopes, not concrete arrays.)

Used above ``HOIST_ELEMENTS`` elements (env ``PNP_TPU_HOIST_ELEMS``,
default 600k — between the proven-fine level 3 and the broken level 4)
so the measured level-1..3 program behavior is untouched.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.tree_util import tree_flatten, tree_structure, tree_unflatten

def _eval_jaxpr(jaxpr, consts, *args):
    # jax.core.eval_jaxpr works on the pinned 0.9.0; newer releases move
    # it to jax.extend.core — guard so an upgrade fails over, not crashes
    try:
        return jax.core.eval_jaxpr(jaxpr, consts, *args)
    except AttributeError:
        from jax.extend import core as jex_core
        return jex_core.eval_jaxpr(jaxpr, consts, *args)


def hoist_needed(num_elements: int) -> bool:
    """True when programs over this mesh should hoist table constants.

    Threshold read per call (env ``PNP_TPU_HOIST_ELEMS``) so tests can
    force the hoisted path on small meshes.
    """
    return num_elements >= int(os.environ.get("PNP_TPU_HOIST_ELEMS",
                                              "600000"))


def jit_hoisted(f):
    """``jax.jit(f)`` with captured array constants passed as arguments.

    Positional array-pytree arguments only (``None`` leaves allowed).
    Retraces per argument treedef/shape/dtype structure, like jit.
    """
    cache = {}

    def wrapped(*args):
        flat, in_tree = tree_flatten(args)
        # weak_type is part of the key (ADVICE r4): a Python scalar and a
        # strongly-typed array of the same shape/dtype must not share a
        # trace, or promotion semantics silently diverge from jax.jit
        key = (in_tree, tuple(
            (np.shape(a), jax.numpy.result_type(a),
             getattr(jax.api_util.shaped_abstractify(a), "weak_type",
                     False))
            for a in flat))
        if key not in cache:
            def _flat_f(flat_args):
                return f(*tree_unflatten(in_tree, flat_args))

            closed, out_shape = jax.make_jaxpr(
                _flat_f, return_shape=True)(flat)
            out_tree = tree_structure(out_shape)

            def _eval(consts, flat_args):
                return _eval_jaxpr(closed.jaxpr, consts, *flat_args)

            cache[key] = (jax.jit(_eval), closed.consts, out_tree)
        jf, consts, out_tree = cache[key]
        return tree_unflatten(out_tree, jf(consts, flat))

    return wrapped


def select_jit(num_elements: int):
    """``jit_hoisted`` above the huge-mesh threshold, else ``jax.jit``."""
    return jit_hoisted if hoist_needed(num_elements) else jax.jit
