"""pnp_tpu — a TPU-native finite-element electrokinetics engine.

A from-scratch JAX/XLA implementation of the full capability surface of the
reference ``dune-pnp`` solver (see /root/reference): Gmsh mesh ingestion with
physical-group boundary tables, P1-P3 simplex FE spaces, quadrature-based
batched assembly of the Poisson-Boltzmann / Poisson / drift-diffusion /
coupled Poisson-Nernst-Planck weak forms (optionally axisymmetric), Dirichlet
constraint handling with PB-derived boundary values, line-searched Newton,
matrix-free CG/BiCGSTAB Krylov solvers, implicit one-step (theta/Alexander-2)
time integration, ion-flux post-processing, and multi-device sharded
assembly/solve over a ``jax.sharding.Mesh``.

Design stance (TPU-first, not a DUNE port):
  * All element residuals and Jacobians are evaluated as dense batched
    contractions over statically-shaped element blocks — one XLA program per
    operator instead of per-element virtual dispatch.
  * Jacobians are analytic (hand-derived contractions), validated against
    ``jax.jacfwd`` in tests — replacing PDELab's finite-difference
    ``NumericalJacobian*`` mixins.
  * Krylov iterations live in ``lax.while_loop`` with matrix-free SpMV from
    precomputed element matrices (gather → batched matvec → segment-sum).
  * Multi-device: mesh elements are sharded over the device mesh with
    ``shard_map``; scattered residuals/SpMV results are combined with ``psum``
    ("additive vector" nonoverlapping decomposition, the NOVLP scheme the
    reference gets from DUNE-ISTL, re-expressed as XLA collectives).

The reference is all-f64 (``double`` throughout); importing this package
enables JAX x64 so solver tolerances down to 1e-10 are meaningful.
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
