"""Per-window metrics streaming (SURVEY.md §5.5; VERDICT round-1 item 6)
and SMC checkpoint/resume (SURVEY.md §5.4; VERDICT round-1 item 5)."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starcat.api import sample
from starcat.configs import CONFIGS, apply_overrides
from starcat.potential import PriorSpec
from starcat.scene import SceneSpec, make_mock_image
from starcat.smc import SMCConfig, run_smc


def _read_events(path):
    with open(path) as fh:
        return [json.loads(line) for line in fh]


def test_mcmc_per_window_metrics(tmp_path):
    """An MCMC run must stream warmup-phase and sampling-block records, not
    just one end-of-run summary."""
    mp = str(tmp_path / "metrics.jsonl")
    cfg = apply_overrides(CONFIGS["cfg0_single_star"], {
        "head": "hmc", "n_chains": "8", "n_samples": "400", "n_warmup": "60",
    })
    sample(cfg, seed=0, metrics_path=mp)
    events = _read_events(mp)
    kinds = [e["event"] for e in events]
    assert kinds.count("warmup_phase") == 3, kinds
    assert kinds.count("sampling_block") >= 2, kinds  # 400 draws / 250 blocks
    assert kinds[-1] == "run_complete"
    blocks = [e for e in events if e["event"] == "sampling_block"]
    assert blocks[-1]["done"] == 400
    assert all(0.0 <= b["accept"] <= 1.0 for b in blocks)


def test_smc_per_step_metrics_and_checkpoint_resume(tmp_path):
    """SMC streams one record per temperature step; a run interrupted at a
    mid-tempering checkpoint resumes to the SAME final logZ/moments as the
    uninterrupted host-stepped run (deterministic continuation: the PRNG
    key lives in SMCState)."""
    spec = SceneSpec(16, 16, 1.5, 5.0)
    prior = PriorSpec(4.0, 0.6)
    img = make_mock_image(
        jax.random.key(1), jnp.array([5.0, 11.0]), jnp.array([8.0, 8.0]),
        jnp.array([80.0, 60.0]), spec
    )
    cfg = SMCConfig(n_particles=128, mutation="hmc", n_mutation_steps=2,
                    n_leapfrog=5, max_steps=40)
    key = jax.random.key(3)

    class ListLogger:
        def __init__(self):
            self.records = []

        def log(self, event, **kw):
            self.records.append({"event": event, **kw})

    # uninterrupted host-stepped run (logger forces the stepwise path)
    log_a = ListLogger()
    res_a = run_smc(key, spec, img, prior, 4, cfg, logger=log_a)
    steps = [r for r in log_a.records if r["event"] == "smc_temperature_step"]
    assert len(steps) == int(res_a.n_steps)
    assert steps[-1]["beta"] == 1.0
    assert abs(steps[-1]["log_z"] - float(res_a.log_z)) < 1e-5
    betas = [r["beta"] for r in steps]
    assert betas == sorted(betas)

    # interrupted run: stop after 3 temperature steps (max_steps=3 simulates
    # the crash), checkpoint on; then resume with the full budget
    ck = str(tmp_path / "smc_ckpt")
    run_smc(key, spec, img, prior, 4, cfg._replace(max_steps=3),
            checkpoint_path=ck)
    assert os.path.exists(ck)
    res_b = run_smc(key, spec, img, prior, 4, cfg, checkpoint_path=ck,
                    resume=True)
    np.testing.assert_allclose(float(res_b.log_z), float(res_a.log_z),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(res_b.theta), np.asarray(res_a.theta))
    assert int(res_b.n_steps) == int(res_a.n_steps)


def test_smc_stepwise_matches_while_loop():
    """The host-stepped tempering loop and the single-program while_loop
    must produce the same pass (same step program, same state)."""
    spec = SceneSpec(16, 16, 1.5, 5.0)
    prior = PriorSpec(4.0, 0.6)
    img = make_mock_image(
        jax.random.key(2), jnp.array([8.0]), jnp.array([8.0]),
        jnp.array([90.0]), spec
    )
    cfg = SMCConfig(n_particles=64, mutation="hmc", n_mutation_steps=1,
                    n_leapfrog=4, max_steps=40)
    key = jax.random.key(5)

    res_w = run_smc(key, spec, img, prior, 2, cfg)  # while_loop path

    class Null:
        def log(self, *a, **k):
            pass

    res_s = run_smc(key, spec, img, prior, 2, cfg, logger=Null())
    np.testing.assert_allclose(float(res_s.log_z), float(res_w.log_z), rtol=1e-5)
    assert int(res_s.n_steps) == int(res_w.n_steps)
    np.testing.assert_allclose(np.asarray(res_s.theta), np.asarray(res_w.theta),
                               rtol=1e-5, atol=1e-5)


def test_chees_per_window_metrics(tmp_path):
    """The ChEES head must stream the same per-window records as the other
    MCMC heads: 3 warmup-phase records, a warmup_complete record carrying
    the adapted traj_length and warmup divergence count, and per-block
    sampling records (VERDICT round-2 Missing #2)."""
    mp = str(tmp_path / "metrics.jsonl")
    cfg = apply_overrides(CONFIGS["cfg6_chees"], {
        "n_chains": "8", "n_samples": "400", "n_warmup": "60",
    })
    out = sample(cfg, seed=0, metrics_path=mp)
    events = _read_events(mp)
    kinds = [e["event"] for e in events]
    assert kinds.count("warmup_phase") == 3, kinds
    assert kinds.count("warmup_complete") == 1, kinds
    assert kinds.count("sampling_block") >= 2, kinds
    assert kinds[-1] == "run_complete"
    wc = next(e for e in events if e["event"] == "warmup_complete")
    assert np.isfinite(wc["traj_length"]) and wc["traj_length"] > 0
    assert "divergences" in wc
    blocks = [e for e in events if e["event"] == "sampling_block"]
    assert blocks[-1]["done"] == 400
    assert all(np.isfinite(b["traj_length"]) for b in blocks)
    assert np.isfinite(out.stats["traj_length"])


@pytest.mark.slow
def test_transdim_warmup_window_metrics(tmp_path):
    """The trans-d head streams per-window WARMUP records (accept,
    td_accept, mean star count, step size) — round-2 emitted only one
    warmup_complete line, hiding dual-averaging pathologies during the
    mask-varying warmup (VERDICT round-2 Weak #7)."""
    mp = str(tmp_path / "metrics.jsonl")
    cfg = apply_overrides(CONFIGS["cfg0_single_star"], {
        "head": "transdim", "n_chains": "8", "n_samples": "8",
        "n_warmup": "16",
    })
    sample(cfg, seed=0, metrics_path=mp)
    events = _read_events(mp)
    wins = [e for e in events if e["event"] == "warmup_window"]
    assert len(wins) == 4, [e["event"] for e in events]
    assert [w["window"] for w in wins] == [0, 1, 2, 3]
    for w in wins:
        assert 0.0 <= w["accept"] <= 1.0
        assert 0.0 <= w["td_accept"] <= 1.0
        assert w["step_size"] > 0.0
        assert w["mean_n"] >= 0.0
    assert any(e["event"] == "warmup_complete" for e in events)


def test_advi_window_metrics(tmp_path):
    """ADVI streams per-window ELBO records (its only long-running phase;
    the head intentionally has no checkpoint/mesh surface — documented in
    api.py)."""
    mp = str(tmp_path / "metrics.jsonl")
    cfg = apply_overrides(CONFIGS["cfg0_single_star"], {
        "head": "advi", "n_chains": "4",
    })
    out = sample(cfg, seed=0, metrics_path=mp)
    # the (P, 1, K, 3) iid-draw layout must summarize across particles —
    # regression for the NaN sd/mcse per-slot rows
    from starcat.api import summarize_output

    summ = summarize_output(out)
    for k in ("total_flux", "x", "y", "flux"):
        assert np.isfinite(summ[k]["sd"]), (k, summ[k])
        assert summ[k]["ess"] > 0, (k, summ[k])
    events = _read_events(mp)
    wins = [e for e in events if e["event"] == "advi_window"]
    assert len(wins) == 5, [e["event"] for e in events]
    elbos = [w["elbo"] for w in wins]
    assert all(np.isfinite(v) for v in elbos)
    # the ELBO must improve from the first window to the last
    assert elbos[-1] > elbos[0]
