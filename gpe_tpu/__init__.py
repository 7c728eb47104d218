"""gpe_tpu — a TPU-native JAX framework for nonlinear eigenvalue problems.

Solves the Gross-Pitaevskii equation (GPE)  -c·Δψ + V(x)ψ + γ|ψ|^(p-1)ψ = μψ
and Helmholtz problems with physics-informed neural networks, rebuilt TPU-first:

- Forward-Laplacian propagation (one fused forward pass yields ψ, ∇ψ, Δψ as
  stacked MXU matmuls) instead of nested reverse-mode autodiff.
- jit-compiled `lax.scan` training loops; optax optimizer/scheduler zoo.
- Collocation points sharded over a `jax.sharding.Mesh`; quadrature reductions
  (normalization, Rayleigh-quotient μ) are `psum` collectives over ICI.
- PL-PINN perturbation-continuation training (the reference's headline
  algorithm), curriculum, two-stage β→γ continuation, multi-seed vmap runners.

Capability parity target: LevBahn/Gross-Pitaevskii-Eigenvalue-problem
(see SURVEY.md at repo root for the component inventory this implements).
"""

__version__ = "0.1.0"

from gpe_tpu import ops, physics, models, losses  # noqa: F401
