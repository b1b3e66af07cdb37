"""Unit tests for the scene / PSF model (SURVEY.md §4.2: PSF normalization,
rendering vs brute force, mask invariance)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starcat.scene import (
    SceneSpec,
    gaussian_profile_1d,
    make_mock_image,
    pixel_centers,
    render_scene,
)

SPEC = SceneSpec(height=32, width=32, psf_sigma=1.5, background=10.0)


def test_psf_normalization():
    """A 1-D profile well inside the grid sums to ~1 (unit pixels)."""
    g = gaussian_profile_1d(jnp.array([16.0]), pixel_centers(32), 1.5)
    assert np.isclose(float(g.sum()), 1.0, atol=1e-4)


def test_render_matches_bruteforce():
    """Separable-matmul rendering == naive per-pixel double loop (NumPy)."""
    rng = np.random.default_rng(0)
    k = 4
    x = rng.uniform(5, 27, k)
    y = rng.uniform(5, 27, k)
    f = rng.uniform(50, 200, k)
    mask = np.ones(k)

    lam = np.asarray(
        render_scene(jnp.array(x), jnp.array(y), jnp.array(f), jnp.array(mask), SPEC)
    )

    sig = SPEC.psf_sigma
    norm = 1.0 / (2.0 * np.pi * sig * sig)
    brute = np.full((SPEC.height, SPEC.width), SPEC.background)
    for h in range(SPEC.height):
        for w in range(SPEC.width):
            cx, cy = w + 0.5, h + 0.5
            for i in range(k):
                d2 = (cx - x[i]) ** 2 + (cy - y[i]) ** 2
                brute[h, w] += f[i] * norm * np.exp(-0.5 * d2 / sig**2)

    np.testing.assert_allclose(lam, brute, rtol=1e-5)


def test_total_flux_conservation():
    """Sum over a big image of (lam - background) ~= total flux."""
    spec = SceneSpec(height=64, width=64, psf_sigma=2.0, background=5.0)
    lam = render_scene(
        jnp.array([32.0]), jnp.array([32.0]), jnp.array([123.0]), jnp.ones(1), spec
    )
    excess = float(lam.sum() - spec.background * spec.height * spec.width)
    assert np.isclose(excess, 123.0, rtol=1e-4)


def test_dead_slots_contribute_zero():
    """Masked-catalog invariant: dead slots change nothing, bit-exactly."""
    x = jnp.array([10.0, 20.0, 3.0])
    y = jnp.array([12.0, 18.0, 30.0])
    f = jnp.array([100.0, 80.0, 1e6])  # huge flux in the dead slot
    lam_masked = render_scene(x, y, f, jnp.array([1.0, 1.0, 0.0]), SPEC)
    lam_two = render_scene(x[:2], y[:2], f[:2], jnp.ones(2), SPEC)
    np.testing.assert_array_equal(np.asarray(lam_masked), np.asarray(lam_two))


def test_mock_image_poisson_stats():
    """Mock image has Poisson mean/variance matching lam."""
    spec = SceneSpec(height=16, width=16, psf_sigma=1.5, background=50.0)
    keys = jax.random.split(jax.random.key(0), 400)
    draw = jax.vmap(
        lambda k: make_mock_image(k, jnp.array([8.0]), jnp.array([8.0]), jnp.array([500.0]), spec)
    )
    imgs = np.asarray(draw(keys))
    lam = np.asarray(render_scene(jnp.array([8.0]), jnp.array([8.0]), jnp.array([500.0]), jnp.ones(1), spec))
    # mean within 5 sigma of lam, pixelwise (sigma = sqrt(lam / n))
    se = np.sqrt(lam / imgs.shape[0])
    assert np.all(np.abs(imgs.mean(0) - lam) < 5 * se + 1e-6)
