"""A/B: direct-net baseline protocol for the LARGE-μ box family.

The committed baselines (lr=1e-4, loss_faithful — the protocol the p16 A/B
picked for the harmonic-class families) underconverge badly on the box:
μ must track e.g. 158→303 (mode 3) along the γ ramp and lr=1e-4 moves it
only 158→176 within the 5001-epoch budget, leaving Curriculum/Vanilla
mean abs errors 8–58 where the reference publishes 0.2–16. The candidate
fix is lr=1e-3 with a warmup (no kick-out of the pretrained minimum) into
a REAL decaying schedule:

  A) lr=1e-3, warmup_faithful  (warmup + the bug-faithful loss-as-step LR;
     degenerate for loss ≫ 1, included as control)
  B) lr=1e-3, warmup_cosine    (warmup + authored cosine warm restarts)
  C) lr=3e-4, warmup_cosine    (hedge)

Runs curriculum + vanilla on box modes 3 and 5 (the worst rows) at the
full reference protocol (6 checkpoints, 5001 epochs) and prints per-mode
mean abs error vs the committed lr=1e-4 values (12.3 / 24.3 curriculum,
from /tmp/queue_p3_box_baselines.log 2026-08-18).

Run on TPU:  python benchmarks/ab_box_baselines.py
Writes runs/ab_box_baselines/summary.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = (3, 5)
ARMS = (("warmup_faithful", 1e-3), ("warmup_cosine", 1e-3),
        ("warmup_cosine", 3e-4))
EPOCHS = 5001


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")

    from gpe_tpu.experiments.paper_tables import _families, _oracle_mu
    from gpe_tpu.train.compare import (train_curriculum_ramp,
                                       train_vanilla_checkpoints)

    fam = _families()["p3_box"]
    spec = fam["spec"]
    checkpoints = [float(g) for g in fam["checkpoints"]]
    mu_ref = {m: _oracle_mu(spec, m, checkpoints) for m in MODES}
    out = {"family": "p3_box", "modes": list(MODES), "epochs": EPOCHS,
           "committed_lr1e-4": {"curriculum": {"3": 12.3, "5": 24.3}},
           "arms": {}}

    for lr_mode, lr in ARMS:
        key = f"{lr_mode}@{lr:g}"
        arm = {}
        t0 = time.time()
        for m in MODES:
            cur = train_curriculum_ramp(spec, checkpoints, m, epochs=EPOCHS,
                                        tol=1e-5, patience=10**9, seed=42,
                                        lr=lr, lr_mode=lr_mode)
            van = train_vanilla_checkpoints(spec, checkpoints, m,
                                            epochs=EPOCHS, tol=0.0,
                                            patience=10**9, seed=42,
                                            lr=lr, lr_mode=lr_mode)
            arm[m] = {
                "curriculum_mean_abs": sum(
                    abs(cur[g] - mu_ref[m][g]) for g in checkpoints) / 6,
                "vanilla_mean_abs": sum(
                    abs(van[g] - mu_ref[m][g]) for g in checkpoints) / 6,
                "curriculum_mu": cur, "vanilla_mu": van,
            }
            print(json.dumps({"arm": key, "mode": m,
                              "cur": arm[m]["curriculum_mean_abs"],
                              "van": arm[m]["vanilla_mean_abs"]}), flush=True)
        arm["wall_s"] = round(time.time() - t0, 1)
        out["arms"][key] = arm

    os.makedirs("runs/ab_box_baselines", exist_ok=True)
    with open("runs/ab_box_baselines/summary.json", "w") as f:
        json.dump(out, f, indent=2, default=str)
    print(json.dumps({k: {str(m): (v[m]["curriculum_mean_abs"],
                                   v[m]["vanilla_mean_abs"]) for m in MODES}
                      for k, v in out["arms"].items()}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
