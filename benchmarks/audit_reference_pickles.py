"""Provenance audit of the reference's published comparison errors.

The reference's comparison tables (BASELINE.md) quote per-method μ errors,
but the code that produced them is not in the repository — the committed
evidence is the model pickles next to the CSVs
(`comparison_results_*/{regular,curriculum}_pinn_models_*.pkl`, whose writer
script also does not exist in the repo: no `regular_state_dicts` producer
anywhere in /root/reference). This script evaluates those committed models
with the reference's OWN conventions and asks: do they reproduce the
published error columns?

Per (family, kind, mode, γ):
- load the state dict with a restricted unpickler (only torch tensor-rebuild
  globals are allowed — these are untrusted files);
- rebuild the [1,64,64,64,1] ShiftedTanh MLP forward manually
  (harmonic_pinn_simulation.py:41-49,84-93) — vanilla/curriculum models ARE
  the full solution u = net(x) (plot_harmonic_potential_at_ground_state.py:
  1110-1127 train vanilla with u_pred used directly);
- compute μ by the reference's Rayleigh form
  μ = mean(u·(−u″+Vu+γuᵖ))/mean(u²) (harmonic_pinn_simulation.py:180-188)
  on the family's training grid;
- compare to our float64 oracle values (mu_ref column of the regenerated
  runs/comparison_results_*/raw_comparison_results.csv).

Writes runs/reference_parity/provenance_audit.json with per-mode mean |Δμ|
of the committed models next to the published per-mode claims. The
reference_compare parity table reads this file to flag published cells the
committed artifacts cannot reproduce (>3× discrepancy → `†`).

Run: python benchmarks/audit_reference_pickles.py   (CPU, ~1 min)
"""
from __future__ import annotations

import collections
import csv
import importlib
import json
import os
import pickle
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_ROOT = "/root/reference/Gross-Pitaevskii/src/final/refine"
RUNS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "runs")

# family -> (ref dir suffix, pickle suffix, domain, potential fn, p)
FAMILIES = {
    "p3_harmonic": ("p3_harmonic", "p3_harmonic", (-10.0, 10.0),
                    lambda x: x ** 2, 3.0),
    "p3_box": ("p3_box", "p3_box", (0.0, 1.0), lambda x: 0.0 * x, 3.0),
}
N_PTS = 4000        # the reference's N_f (harmonic_pinn_simulation.py:965)


class SafeUnpickler(pickle.Unpickler):
    """Restricted unpickler: the comparison pickles are UNTRUSTED public
    content; only the three tensor-rebuild globals they actually use load."""
    ALLOWED = {("torch._utils", "_rebuild_tensor_v2"),
               ("torch.storage", "_load_from_bytes"),
               ("collections", "OrderedDict")}

    def find_class(self, module, name):
        if (module, name) in self.ALLOWED:
            if module == "collections":
                return collections.OrderedDict
            return getattr(importlib.import_module(module), name)
        raise pickle.UnpicklingError(f"forbidden global {module}.{name}")


def _linears(state_dict):
    """Ordered (W, b) pairs from a reference state dict (Sequential naming)."""
    ws = {}
    for k, v in state_dict.items():
        if k.endswith(".weight"):
            ws.setdefault(k[:-7], {})["w"] = v
        elif k.endswith(".bias"):
            ws.setdefault(k[:-5], {})["b"] = v

    def idx(name):
        return [int(p) for p in name.split(".") if p.isdigit()]

    return [(ws[k]["w"].float(), ws[k]["b"].float())
            for k in sorted(ws, key=idx)]


def _mu_of_state(state_dict, x, V, gamma, p):
    """μ by the reference's own Rayleigh form on its training grid."""
    if "state_dict" in state_dict:        # save_models wrapper (metadata dict)
        state_dict = state_dict["state_dict"]
    layers = _linears(state_dict)
    assert layers, "no Linear weights found in state dict"
    u = x
    for i, (W, b) in enumerate(layers):
        u = u @ W.T + b
        if i < len(layers) - 1:
            u = torch.tanh(u) + 1.0 + np.finfo(float).eps   # ShiftedTanh
    du = torch.autograd.grad(u, x, torch.ones_like(u), create_graph=True)[0]
    d2u = torch.autograd.grad(du, x, torch.ones_like(du),
                              create_graph=True)[0]
    hu = -d2u + V * u + gamma * u ** p
    return float((u * hu).mean() / (u * u).mean())


def _oracle(fam):
    """{(mode, gamma): mu_ref} from our regenerated family artifacts."""
    out = {}
    path = os.path.join(RUNS, f"comparison_results_{fam}",
                        "raw_comparison_results.csv")
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            out[(int(row["Mode"]), float(row["Gamma"]))] = float(row["mu_ref"])
    return out


def _published(ref_fam):
    """{(mode, method): abs_err} from the reference's paper_style CSV."""
    out = {}
    path = os.path.join(REF_ROOT, f"comparison_results_{ref_fam}",
                        "paper_style_results.csv")
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            meth = row["Method"].strip()
            mode = int(row["Mode"].strip().split()[-1])
            out[(mode, meth)] = float(row["abs_err"].replace("*", ""))
    return out


def main():
    report = {}
    for fam, (ref_fam, pkl_fam, (lb, ub), vfn, p) in FAMILIES.items():
        oracle = _oracle(fam)
        published = _published(ref_fam)
        x = torch.linspace(lb, ub, N_PTS, dtype=torch.float32).reshape(-1, 1)
        x.requires_grad_(True)
        V = vfn(x)
        fam_rep = {}
        for kind, meth_names in (("regular", ("Regular PINN", "Vanilla PINN")),
                                 ("curriculum", ("Curriculum Training",))):
            path = os.path.join(REF_ROOT, f"comparison_results_{ref_fam}",
                                f"{kind}_pinn_models_{pkl_fam}.pkl")
            if not os.path.exists(path):
                continue
            with open(path, "rb") as f:
                data = SafeUnpickler(f).load()
            sd_key = next(k for k in data if k.endswith("_state_dicts"))
            by_mode = {}
            for mode, by_gamma in data[sd_key].items():
                errs, mus = [], {}
                for gamma, sd in by_gamma.items():
                    mu = _mu_of_state(sd, x, V, float(gamma), p)
                    mus[str(gamma)] = mu
                    ref = oracle.get((int(mode), float(gamma)))
                    if ref is not None:
                        errs.append(abs(mu - ref))
                pub = next((published.get((int(mode), m))
                            for m in meth_names
                            if (int(mode), m) in published), None)
                mean_err = float(np.mean(errs)) if errs else None
                by_mode[str(mode)] = {
                    "mu_by_gamma": mus,
                    "mean_abs_err_committed": mean_err,
                    "published_abs_err": pub,
                    "ratio_committed_over_published": (
                        round(mean_err / pub, 2)
                        if mean_err is not None and pub else None),
                }
            fam_rep[kind] = by_mode
        report[fam] = fam_rep

    out_dir = os.path.join(RUNS, "reference_parity")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "provenance_audit.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    # console summary: the ratios are the whole story
    for fam, fr in report.items():
        for kind, bm in fr.items():
            ratios = {m: v["ratio_committed_over_published"]
                      for m, v in bm.items()}
            print(fam, kind, "committed/published error ratios:", ratios)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
