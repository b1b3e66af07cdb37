"""Pixel-axis sharding escape hatch (SURVEY.md §5.7): sharded likelihood
and its gradient match the single-device computation on the 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import starcat
from starcat.dist import make_mesh, make_pixel_sharded_loglik
from starcat.potential import PriorSpec, sample_prior
from starcat.scene import SceneSpec, make_mock_image


@pytest.mark.slow
def test_pixel_sharded_loglik_matches_dense():
    spec = SceneSpec(64, 32, 1.5, 6.0)  # 64 rows / 8 devices
    prior = PriorSpec(4.0, 0.8)
    truth = sample_prior(jax.random.key(0), 6, prior)
    x, y, f = starcat.constrain(truth, spec)
    img = make_mock_image(jax.random.key(1), x, y, f, spec)
    mask = jnp.ones(6)

    mesh = make_mesh("pixels")
    assert len(jax.devices()) == 8
    ll_sharded = make_pixel_sharded_loglik(spec, img, mesh)

    theta = sample_prior(jax.random.key(2), 6, prior)
    ref = float(starcat.log_likelihood(theta, mask, spec, img))
    got = float(jax.jit(ll_sharded)(theta, mask))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    # gradient flows through shard_map + psum
    g_ref = jax.grad(lambda t: starcat.log_likelihood(t, mask, spec, img))(theta)
    g_got = jax.grad(lambda t: ll_sharded(t, mask))(theta)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-3)

    # masked slot still contributes exactly zero
    mask2 = mask.at[3].set(0.0)
    a = float(ll_sharded(theta, mask2))
    b = float(starcat.log_likelihood(theta, mask2, spec, img))
    np.testing.assert_allclose(a, b, rtol=1e-5)
