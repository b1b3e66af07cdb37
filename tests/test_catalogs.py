"""Catalog-level postprocessing tests (starcat/catalogs.py).

Synthetic-draw tests pin the condensation and completeness/purity
machinery exactly (no MCMC noise); an end-to-end test runs a short
trans-dimensional chain on a 2-star scene and checks the condensed
catalog recovers both sources.
"""
import numpy as np
import pytest

import starcat
from starcat.catalogs import (
    completeness_purity,
    condense,
    extract_catalogs,
    match_catalogs,
)
from starcat.scene import SceneSpec


def _fake_draws(rng, truth, n_draws, jitter=0.15, spurious_rate=0.0,
                kmax=8, spec=None):
    """Build (1, n_draws, kmax, 3) unconstrained draws + per-draw masks
    around a constrained truth (n, 3) catalog."""
    import jax.numpy as jnp

    from starcat.potential import unconstrain

    thetas = np.zeros((1, n_draws, kmax, 3), np.float64)
    masks = np.zeros((1, n_draws, kmax), np.float64)
    for d in range(n_draws):
        rows = []
        for x, y, f in truth:
            rows.append([x + rng.normal(0, jitter),
                         y + rng.normal(0, jitter),
                         f * np.exp(rng.normal(0, 0.05))])
        if rng.random() < spurious_rate:
            rows.append([rng.uniform(2, spec.width - 2),
                         rng.uniform(2, spec.height - 2),
                         3.0])
        rows = np.array(rows)
        th = unconstrain(jnp.asarray(rows[:, 0]), jnp.asarray(rows[:, 1]),
                         jnp.asarray(rows[:, 2]), spec)
        thetas[0, d, : len(rows)] = np.asarray(th)
        masks[0, d, : len(rows)] = 1.0
    return thetas, masks


def test_match_catalogs_one_to_one():
    a = np.array([[5.0, 5.0, 10.0], [20.0, 20.0, 5.0]])
    b = np.array([[5.3, 5.0, 9.0], [5.6, 5.1, 2.0], [28.0, 3.0, 1.0]])
    pairs, un_a, un_b = match_catalogs(a, b, radius=1.0)
    # nearest b-star claims the a-star; the second b candidate stays free
    assert pairs.tolist() == [[0, 0]]
    assert un_a.tolist() == [1]
    assert set(un_b.tolist()) == {1, 2}


def test_condense_recovers_truth_and_prevalence():
    spec = SceneSpec(32, 32, 1.5, 10.0)
    rng = np.random.default_rng(0)
    truth = np.array([[8.0, 8.0, 100.0], [24.0, 10.0, 60.0],
                      [16.0, 25.0, 30.0]])
    thetas, masks = _fake_draws(rng, truth, n_draws=200,
                                spurious_rate=0.3, spec=spec)
    cats = extract_catalogs(thetas, masks, spec)
    cond = condense(cats, radius=1.0, min_prevalence=0.1)
    solid = [s for s in cond if s.prevalence >= 0.9]
    assert len(solid) == 3
    # sources come out flux-sorted; positions within the jitter scale
    got = np.array([[s.x, s.y, s.flux] for s in solid])
    order = np.argsort(-truth[:, 2])
    assert np.allclose(got[:, :2], truth[order, :2], atol=0.2)
    assert np.allclose(got[:, 2], truth[order, 2], rtol=0.05)
    # the scattered spurious stars never cluster: nothing else solid, and
    # any residual cluster carries low prevalence
    rest = [s for s in cond if s.prevalence < 0.9]
    assert all(s.prevalence < 0.5 for s in rest)


def test_completeness_purity_curves():
    spec = SceneSpec(32, 32, 1.5, 10.0)
    rng = np.random.default_rng(1)
    truth = np.array([[8.0, 8.0, 100.0], [24.0, 10.0, 60.0]])
    # posterior finds both truth stars always, plus one spurious star in
    # EVERY draw -> completeness 1, purity 2/3 overall
    thetas, masks = _fake_draws(rng, truth, n_draws=100,
                                spurious_rate=1.0, spec=spec)
    cats = extract_catalogs(thetas, masks, spec)
    rep = completeness_purity(cats, truth, radius=1.0,
                              flux_bins=np.array([1.0, 10.0, 1000.0]))
    # bright bin: both truth stars matched in every draw
    assert rep["completeness"][1] == pytest.approx(1.0)
    # faint bin (the flux-3 spurious star): pure contamination
    assert rep["purity"][0] == pytest.approx(0.0, abs=0.05)
    assert rep["purity"][1] == pytest.approx(1.0, abs=0.05)
    assert abs(rep["matched_flux_rel_err_mean"]) < 0.05


@pytest.mark.slow
def test_catalog_report_end_to_end_transdim():
    """Short trans-d MCMC run on a bright 2-star scene: the condensed
    catalog finds exactly the two real sources at prevalence ~1."""
    import jax
    import jax.numpy as jnp

    from starcat.api import sample
    from starcat.catalogs import catalog_report
    from starcat.configs import CONFIGS, apply_overrides

    cfg = apply_overrides(
        CONFIGS["cfg5_transdim_mcmc"],
        {"n_chains": 8, "n_samples": 60, "n_warmup": 60, "kmax": 6,
         "n_stars": 2, "tdm.transdim.lam_count": 2.0},
    )
    # bright, well-separated truth so the posterior is unambiguous
    from starcat.potential import unconstrain
    from starcat.scene import make_mock_image

    truth = unconstrain(jnp.array([9.0, 23.0]), jnp.array([9.0, 22.0]),
                        jnp.array([900.0, 700.0]), cfg.scene)
    img = make_mock_image(jax.random.key(7), *starcat.constrain(truth, cfg.scene),
                          cfg.scene)
    out = sample(cfg, seed=3, image=img)
    rep = catalog_report(out, truth_theta=truth, radius=1.5)
    assert rep["n_condensed_ge_half"] == 2
    # the two solid condensed sources sit on the truth positions
    solid = [s for s in rep["condensed"] if s["prevalence"] >= 0.5][:2]
    got = np.array([[s["x"], s["y"]] for s in solid])
    want = np.array([[9.0, 9.0], [23.0, 22.0]])
    assert np.allclose(np.sort(got[:, 0]), np.sort(want[:, 0]), atol=1.0)
    assert np.allclose(np.sort(got[:, 1]), np.sort(want[:, 1]), atol=1.0)
    cp = rep["completeness_purity"]
    comp = [c for c in cp["completeness"] if c is not None]
    # short-run bar: most draws contain both stars (churn from trans-d
    # death/birth on a 60-draw chain keeps this below 1)
    assert min(comp) > 0.6
