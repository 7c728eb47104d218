"""Mid-sweep checkpoint/resume of the PL-PINN continuation ramp."""
import numpy as np

from gpe_tpu.train import GPESpec, train_plpinn


SPEC = GPESpec(lb=-8.0, ub=8.0, n_points=512, layers=(1, 16, 16, 1),
               potential="harmonic", basis="hermite", kinetic=1.0,
               nonlinearity="abs_power")

KW = dict(modes=(0,), epochs=200, tol=1e-9, patience=10**9,
          pretrain_epochs=600, check_every=100)


def test_plpinn_resumes_mid_sweep(tmp_path):
    ck = str(tmp_path / "sweep.ckpt")
    # first run covers γ ∈ {0, 1}
    r1 = train_plpinn(SPEC, [0.0, 1.0], checkpoint_path=ck, **KW)
    # second run extends the ramp to γ=2: the first two steps must be loaded
    # from the checkpoint (identical μ, zero retraining drift), only γ=2 trains
    r2 = train_plpinn(SPEC, [0.0, 1.0, 2.0], checkpoint_path=ck, **KW)
    mus1 = dict(r1.mu_table[0])
    mus2 = dict(r2.mu_table[0])
    assert mus2[0.0] == mus1[0.0]
    assert mus2[1.0] == mus1[1.0]
    assert 2.0 in mus2 and np.isfinite(mus2[2.0])
    # histories restored for checkpointed steps
    np.testing.assert_array_equal(r2.training_history[0][1.0]["loss"],
                                  r1.training_history[0][1.0]["loss"])
    # normalization constant survives the resume
    assert r2.constant_history[0] == r1.constant_history[0]


def test_checkpointer_atomic_store(tmp_path):
    from gpe_tpu.io.checkpoint import SweepCheckpointer
    p = str(tmp_path / "s.ckpt")
    ck = SweepCheckpointer(p)
    ck.put("a", {"x": np.arange(3)})
    ck.put("b", 7)
    ck2 = SweepCheckpointer(p)           # fresh load from disk
    np.testing.assert_array_equal(ck2.get("a")["x"], np.arange(3))
    assert ck2.get("b") == 7
    assert ck2.keys() == ["a", "b"]
