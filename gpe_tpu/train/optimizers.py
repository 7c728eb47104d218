"""Optimizer zoo — optax equivalents of the reference's dict-dispatch selection
(src/gross_pitaevskii_1D_Different_Optimizers.py:540-558; SURVEY.md §2.D row D4).

The reference imports {Adam, AdamW, QHAdam, AdaHessian, Ranger21, SophiaH,
Shampoo, AdaBelief, DistributedShampoo}; the TPU-native zoo maps each to the
closest optax transform. Gradient clipping (clip_grad_norm 1.0 in the paper
trainer) composes via `clip_norm`.
"""
from __future__ import annotations

from typing import Callable

import optax


def make_optimizer(name: str, learning_rate: float | Callable = 1e-3,
                   clip_norm: float | None = None, **kwargs) -> optax.GradientTransformation:
    """Build an optimizer by name with optional global-norm gradient clipping.

    learning_rate may be a float or an optax schedule (step -> lr).
    """
    name = name.lower()
    if name == "adam":
        opt = optax.adam(learning_rate, **kwargs)
    elif name == "adamw":
        # reference betas (0.9, 0.99)
        kwargs.setdefault("b2", 0.99)
        opt = optax.adamw(learning_rate, **kwargs)
    elif name == "qhadam":
        # quasi-hyperbolic momentum ≈ adam with decoupled ν mixing; nadam is
        # the closest built-in (ν₁<1 interpolation toward plain SGD).
        opt = optax.nadam(learning_rate, **kwargs)
    elif name == "adabelief":
        opt = optax.adabelief(learning_rate, **kwargs)
    elif name == "sophia":
        opt = optax.contrib.sophia(learning_rate, **kwargs)
    elif name == "rmsprop":
        opt = optax.rmsprop(learning_rate, **kwargs)
    elif name == "sgd":
        opt = optax.sgd(learning_rate, **kwargs)
    elif name == "muon":
        opt = optax.contrib.muon(learning_rate, **kwargs)
    elif name == "prodigy":
        opt = optax.contrib.prodigy(learning_rate, **kwargs)
    elif name in ("shampoo", "distributed_shampoo"):
        from gpe_tpu.train.shampoo import shampoo
        opt = shampoo(learning_rate, **kwargs)
    elif name == "lbfgs":
        opt = optax.lbfgs(learning_rate, **kwargs)
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    if clip_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(clip_norm), opt)
    return opt
