"""Plotting smoke tests (L0 layer): figures render and save."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import starcat
from starcat.api import sample
from starcat.configs import apply_overrides, cfg0_single_star
from starcat.plots import corner_plot, reconstruction_plot, save_report, trace_plot


@pytest.mark.slow
def test_plots_render_and_save(tmp_path):
    cfg = apply_overrides(
        cfg0_single_star,
        {"head": "hmc", "n_chains": "4", "n_samples": "60", "n_warmup": "60"},
    )
    _, img = cfg.make_data()
    out = sample(cfg, seed=0)

    fig = trace_plot(out.thetas)
    assert fig.get_axes()
    fig = corner_plot(out.thetas, cfg.scene)
    assert len(fig.get_axes()) == 9
    fig = reconstruction_plot(out.thetas, out.masks, cfg.scene, np.asarray(img))
    assert len(fig.get_axes()) >= 3

    paths = save_report(out, np.asarray(img), str(tmp_path / "r"))
    import os

    assert len(paths) == 3 and all(os.path.getsize(p) > 1000 for p in paths)
