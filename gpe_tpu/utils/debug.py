"""Debug & reproducibility utilities (SURVEY.md §5 race-detection row: jit
determinism + NaN guards substitute for the reference's absent sanitizers)."""
from __future__ import annotations

import contextlib
import random

import jax
import numpy as np


def seed_everything(seed: int):
    """Global seeding (reference D10 seeds torch+numpy+cuda; here numpy +
    python random; JAX randomness is explicit via PRNGKey(seed))."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


@contextlib.contextmanager
def nan_guard():
    """Enable jax_debug_nans within a scope — compiled fns re-run op-by-op on
    NaN production and raise with the offending primitive."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
