"""Experiment persistence — the reference's pickle-bundle semantics (E1-E3,
SURVEY.md §2.E): a single file holding {params_by_mode (with spec metadata),
mu_table, training_history, constant_history, epochs_history}, plus per-model
checkpoints, and a train-or-load switch helper.

Format: np.savez-compatible pickle of numpy-ified pytrees (portable, no torch
dependency); orbax-checkpoint is used for pytree params when a directory path
is given (TPU-native async-capable checkpointing of continuation sweeps).
"""
from __future__ import annotations

import os
import pickle
from dataclasses import asdict
from typing import Any

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(np.asarray, tree)


def save_bundle(path: str, result, spec=None, extra: dict | None = None) -> str:
    """Save a PLPINNResult-like bundle (reference save_models,
    harmonic_pinn_simulation.py:901-933)."""
    payload = {
        "params_by_mode": _to_numpy(result.params_by_mode),
        "mu_table": result.mu_table,
        "training_history": result.training_history,
        "constant_history": result.constant_history,
        "epochs_history": result.epochs_history,
        "polished": _to_numpy(getattr(result, "polished", None)),
        "spec": asdict(spec) if spec is not None and not isinstance(spec, dict) else spec,
        "extra": extra or {},
        "format_version": 1,
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


def load_bundle(path: str) -> dict:
    """Load a bundle saved by save_bundle (reference load_models, :936-960)."""
    with open(path, "rb") as f:
        return pickle.load(f)


def save_params(path: str, params: Any) -> str:
    """Per-model checkpoint (reference torch.save(state_dict), E2).

    Directory path → orbax PyTree checkpoint; file path → pickle of numpy
    pytree."""
    if path.endswith(os.sep) or (os.path.splitext(path)[1] == ""):
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), _to_numpy(params), force=True)
        return path
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(params), f)
    return path


def load_params(path: str) -> Any:
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    with open(path, "rb") as f:
        return pickle.load(f)


class SweepCheckpointer:
    """Periodic mid-sweep checkpoint/resume for continuation ramps.

    The reference only persists END-of-run bundles (E1/E2); a 201-step γ ramp
    that dies at step 150 loses everything. This keeps a {key: payload} store
    on disk, atomically rewritten after every continuation step, so
    `train_plpinn(..., checkpoint_path=...)` resumes exactly where it stopped
    (per-(mode, γ) best params, μ, histories, epochs, normalization const).
    """

    def __init__(self, path: str):
        self.path = path
        self._store: dict = {}
        if path and os.path.exists(path):
            with open(path, "rb") as f:
                self._store = pickle.load(f)

    def get(self, key: str):
        return self._store.get(key)

    def put(self, key: str, payload) -> None:
        self._store[key] = _to_numpy(payload)
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        with open(tmp, "wb") as f:
            pickle.dump(self._store, f)
        os.replace(tmp, self.path)      # atomic on POSIX

    def keys(self):
        return sorted(self._store)


def train_or_load(path: str, train_fn, force_train: bool = False):
    """The reference's `train_new` switch (harmonic_pinn_simulation.py:997):
    load the bundle if present, otherwise run train_fn() and save it."""
    if not force_train and os.path.exists(path):
        return load_bundle(path)
    result_and_spec = train_fn()
    if isinstance(result_and_spec, tuple):
        result, spec = result_and_spec
    else:
        result, spec = result_and_spec, None
    save_bundle(path, result, spec)
    return load_bundle(path)
