"""A/B: why the direct-net (vanilla/curriculum) baselines freeze at p=16.

Finding (round 2): at p=16 the pretrained analytic-base state sits at GPE
loss ~2.5e-3, and Adam's FIRST full-LR step under the loss-faithful schedule
(LR pinned at base 1e-3) kicks the loss to ~900; it never re-descends below
the initial value within the 5001-epoch budget, so best-state restore
returns the pretrained net unchanged — curriculum and vanilla become
bitwise identical and their table error is just the pretrained state's
Rayleigh-quotient bias (8.5e-2 at p16; the reference's own baselines reach
~1e-3 there: comparison_results_p16_harmonic/paper_style_results.csv).

Arms:
  A  status quo            loss_faithful @ 1e-3
  B  lower base LR         loss_faithful @ 1e-4
  C  constant LR           clip(1) + adam(1e-4)
  D  LR warmup             200-step linear warmup x loss_faithful @ 1e-3
  E  deep pretrain + A     lbfgs_steps=600 (reference pretrains to ~1e-12
                           MSE: harmonic_pinn_simulation.py:650-701), LR as A

Each arm trains the direct net at gamma in {20, 100}, p=16, full 5001-epoch
budget, tol=0, and reports best_loss and |mu - oracle|.

Run: python benchmarks/ab_p16_baseline.py
"""
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, ".")

from gpe_tpu.models import mlp
from gpe_tpu.train.loop import fit
from gpe_tpu.train.plpinn import ramp_optimizer
from gpe_tpu.train.pretrain import pretrain_to_base
from gpe_tpu.train.problem import GPESpec, base_triple, make_batch, make_loss_fn


def main():
    spec = GPESpec(n_points=4000, layers=(1, 64, 64, 64, 1),
                   activation="shifted_tanh", kinetic=1.0,
                   nonlinearity="power", bc_weight=10.0, norm_weight=20.0,
                   lb=-10.0, ub=10.0, potential="harmonic", basis="hermite",
                   p=16.0, use_perturbation=False)
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    target = np.asarray(base_triple(spec, 0, batch["x"]).value)
    mu_ref = {20.0: 1.077575336061263, 100.0: 1.2547934126845803}  # f64 FDM

    def pretrained(lbfgs_steps=50):
        p0 = mlp.init_mlp(jax.random.PRNGKey(42), spec.layers,
                          "xavier_uniform")
        return pretrain_to_base(p0, batch["x"], target, spec.activation,
                                epochs=2000, lbfgs_steps=lbfgs_steps)

    p_std, mse_std = pretrained()
    p_deep, mse_deep = pretrained(600)
    print(json.dumps({"pretrain_mse": mse_std, "deep_pretrain_mse": mse_deep}),
          flush=True)

    arms = [
        ("A_lf_1e-3", p_std, ramp_optimizer(1e-3, "loss_faithful")),
        ("B_lf_1e-4", p_std, ramp_optimizer(1e-4, "loss_faithful")),
        ("C_const_1e-4", p_std,
         optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))),
        ("D_warmup200_lf_1e-3", p_std, ramp_optimizer(1e-3, "warmup_faithful")),
        ("E_deep_pretrain_lf_1e-3", p_deep, ramp_optimizer(1e-3, "loss_faithful")),
    ]
    for g, ref in mu_ref.items():
        for name, p0, opt in arms:
            res = fit(loss_fn, opt, p0, batch, g, 1.0, epochs=5001, tol=0.0,
                      patience=10**9, check_every=512)
            print(json.dumps({
                "gamma": g, "arm": name,
                "best_loss": float(res.best_loss),
                "mu": float(res.mu_best),
                "mu_abs_err": abs(float(res.mu_best) - ref)}), flush=True)


if __name__ == "__main__":
    main()
