"""API / CLI / config / checkpoint tests."""
import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starcat.configs import CONFIGS, apply_overrides, cfg0_single_star
from starcat.api import sample, summarize_output


def test_config_presets_complete():
    assert set(CONFIGS) == {
        "cfg0_single_star", "cfg1_rhmc", "cfg2_nuts",
        "cfg3_transdim_smc", "cfg4_crowded", "cfg5_transdim_mcmc",
        "cfg6_chees", "cfg7_advi",
    }
    for cfg in CONFIGS.values():
        theta, img = cfg.make_data()
        assert theta.shape == (cfg.n_stars, 3)
        assert img.shape == (cfg.scene.height, cfg.scene.width)
        assert np.isfinite(np.asarray(img)).all()


def test_apply_overrides():
    cfg = apply_overrides(
        cfg0_single_star,
        {"n_chains": "8", "hmc.step_size": "0.1", "scene.psf_sigma": "2.0"},
    )
    assert cfg.n_chains == 8
    assert cfg.hmc.step_size == 0.1
    assert cfg.scene.psf_sigma == 2.0
    # original untouched
    assert cfg0_single_star.n_chains == 4


def test_api_sample_hmc_small():
    cfg = apply_overrides(
        cfg0_single_star, {"head": "hmc", "n_chains": "8", "n_samples": "100",
                           "n_warmup": "100"},
    )
    out = sample(cfg, seed=0)
    assert out.thetas.shape == (8, 100, 1, 3)
    summ = summarize_output(out)
    assert "flux" in summ and np.isfinite(summ["flux"]["mean"])
    truth_f = float(out.stats["truth"]["f"][0])
    assert abs(summ["flux"]["mean"] - truth_f) / truth_f < 0.5


def test_cli_list_and_run():
    # one subprocess for both commands (each python+jax startup costs ~5 s)
    combined = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import starcat.__main__ as m; m.main(['list']);"
        "m.main(['run', '--config', 'cfg0_single_star', 'n_chains=4',"
        "        'n_samples=50', 'n_warmup=50'])"
    )
    r = subprocess.run(
        [sys.executable, "-c", combined],
        capture_output=True, text=True, timeout=570,
    )
    assert r.returncode == 0, r.stderr
    assert "cfg2_nuts" in r.stdout
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["config"] == "cfg0_single_star"
    assert np.isfinite(rec["summary"]["total_flux"]["mean"])


def test_checkpoint_roundtrip(tmp_path):
    from starcat.checkpoint import restore_state, save_state
    from starcat.driver import init_chain_states

    gf = lambda th: (0.5 * jnp.sum(th * th), th)
    states = init_chain_states(jax.random.key(0), jnp.ones((4, 2, 3)), gf)
    path = tmp_path / "ckpt"
    save_state(str(path), states)

    blank = init_chain_states(jax.random.key(1), jnp.zeros((4, 2, 3)), gf)
    restored = restore_state(str(path), blank)
    np.testing.assert_array_equal(np.asarray(restored.theta), np.asarray(states.theta))
    np.testing.assert_array_equal(
        jax.random.key_data(restored.key), jax.random.key_data(states.key)
    )
