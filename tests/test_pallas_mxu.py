"""Crowded-field fused MXU trajectory kernel (pallas_mxu.py) vs the XLA
leapfrog path — interpret mode on CPU; compiled perf measured by bench.py
on the chip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import starcat
from starcat.integrators import leapfrog
from starcat.pallas_mxu import make_pallas_leapfrog_mxu, mxu_fused_supported
from starcat.potential import PriorSpec, make_potential_and_grad, sample_prior
from starcat.scene import SceneSpec, make_mock_image

SPEC = SceneSpec(48, 48, 1.5, 8.0)
PRIOR = PriorSpec(4.5, 0.6)
K, C, L = 24, 8, 4


def _setup():
    truth = sample_prior(jax.random.key(0), K, PRIOR)
    x, y, f = starcat.constrain(truth, SPEC)
    img = make_mock_image(jax.random.key(1), x, y, f, SPEC)
    pg = make_potential_and_grad(SPEC, img, PRIOR)
    theta = truth[None] + 0.02 * jax.random.normal(jax.random.key(2), (C, K, 3))
    p = jax.random.normal(jax.random.key(3), theta.shape)
    return img, pg, theta, p


def test_mxu_fused_supported_shapes():
    assert mxu_fused_supported(SceneSpec(128, 128, 1.5, 20.0), 64, 1024)
    assert not mxu_fused_supported(SceneSpec(512, 512, 1.5, 20.0), 64, 1024)
    assert not mxu_fused_supported(SceneSpec(128, 128, 1.5, 20.0), 64, 1023)


@pytest.mark.slow
def test_mxu_kernel_matches_xla_path():
    img, pg, theta, p = _setup()
    mask = jnp.ones(K)
    inv_mass = jnp.full((K, 3), 0.8)
    fused = make_pallas_leapfrog_mxu(SPEC, img, PRIOR, K, L, interpret=True)
    th2, p2, u2, g2 = fused(theta, p, 0.001, inv_mass, mask)

    gf = lambda t: pg(t, mask)
    us, gs = jax.vmap(gf)(theta)
    ref = jax.vmap(
        lambda t, q, uu, gg: leapfrog(gf, t, q, uu, gg, jnp.asarray(0.001),
                                      L, inv_mass)
    )(theta, p, us, gs)
    np.testing.assert_allclose(np.asarray(th2), np.asarray(ref.theta), atol=3e-5)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(ref.u), atol=0.3)
    rel = np.abs(np.asarray(g2) - np.asarray(ref.grad)) / (
        1.0 + np.abs(np.asarray(ref.grad)))
    assert rel.max() < 1e-4, rel.max()


@pytest.mark.slow
def test_mxu_kernel_per_chain_masks_freeze_dead():
    img, pg, theta, p = _setup()
    inv_mass = jnp.ones((K, 3))
    masks = (jax.random.uniform(jax.random.key(5), (C, K)) > 0.3).astype(jnp.float32)
    p = p * masks[..., None]
    fused = make_pallas_leapfrog_mxu(SPEC, img, PRIOR, K, L, interpret=True)
    th2, p2, u2, g2 = fused(theta, p, 0.001, inv_mass, masks)
    dead = np.asarray(masks) == 0.0
    np.testing.assert_array_equal(np.asarray(th2)[dead], np.asarray(theta)[dead])
    np.testing.assert_array_equal(np.asarray(g2)[dead], 0.0)

    def one(t, q, m):
        u0, g0 = pg(t, m)
        r = leapfrog(lambda th: pg(th, m), t, q, u0, g0, jnp.asarray(0.001),
                     L, inv_mass)
        return r.theta

    tr = jax.vmap(one)(theta, p, masks)
    np.testing.assert_allclose(np.asarray(th2), np.asarray(tr), atol=3e-5)
