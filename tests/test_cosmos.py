"""CosmicEmbeds prototype: forward shapes, conditioning, one training step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sky_embeddings_tpu.models.cosmos import CosmicEmbeds
import pytest

TINY = dict(
    img_size=16, patch_size=4, in_chans=3, embed_dim=48, depth=2, num_heads=4,
)


def _data(B=4, seed=0):
    rng = np.random.default_rng(seed)
    target = jnp.asarray(rng.normal(size=(B, 3, 16, 16)).astype(np.float32))
    ra_dec = jnp.asarray(rng.uniform(0, 90, size=(B, 2)).astype(np.float32))
    waves = jnp.asarray(np.tile([480.0, 620.0, 770.0], (B, 1)).astype(np.float32))
    return target, ra_dec, waves


@pytest.mark.slow
def test_generate_from_coordinates_only():
    model = CosmicEmbeds(**TINY)
    target, ra_dec, waves = _data()
    variables = model.init(jax.random.PRNGKey(0), target, ra_dec, waves)
    img = model.apply(variables, ra_dec, waves, method=CosmicEmbeds.generate)
    assert img.shape == (4, 3, 16, 16)
    assert np.isfinite(np.asarray(img)).all()
    # different coordinates give different imagery
    img2 = model.apply(variables, ra_dec + 10.0, waves, method=CosmicEmbeds.generate)
    assert not np.allclose(np.asarray(img), np.asarray(img2))


@pytest.mark.slow  # three full apply passes; the fast gate keeps the
# training-step test as the cosmos canary
def test_conditional_inpainting_keeps_visible_patches_informative():
    model = CosmicEmbeds(**TINY)
    target, ra_dec, waves = _data()
    variables = model.init(jax.random.PRNGKey(0), target, ra_dec, waves)
    # hide the right half of the image
    mask = np.zeros((4, 3, 16, 16), np.float32)
    mask[..., 8:] = 1.0
    out_ctx = model.apply(
        variables, ra_dec, waves, target, jnp.asarray(mask),
        method=CosmicEmbeds.generate,
    )
    out_free = model.apply(variables, ra_dec, waves, method=CosmicEmbeds.generate)
    assert not np.allclose(np.asarray(out_ctx), np.asarray(out_free))


def test_training_step_reduces_loss():
    model = CosmicEmbeds(**TINY)
    target, ra_dec, waves = _data()
    variables = model.init(jax.random.PRNGKey(0), target, ra_dec, waves)
    params = variables["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(
            lambda q: model.apply({"params": q}, target, ra_dec, waves)
        )(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    first = None
    for i in range(25):
        params, opt, loss = step(params, opt)
        if i == 0:
            first = float(loss)
    assert float(loss) < first


def test_nan_target_handled():
    model = CosmicEmbeds(**TINY)
    target, ra_dec, waves = _data()
    target = target.at[0, 1].set(jnp.nan)
    variables = model.init(jax.random.PRNGKey(0), target, ra_dec, waves)
    loss = model.apply(variables, target, ra_dec, waves)
    assert np.isfinite(float(loss))
