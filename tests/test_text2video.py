"""Text2VideoPipeline (bidirectional WanT2V sampler) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longlive_tpu.config import tiny_dit_config, tiny_geometry
from longlive_tpu.models import dit as D
from longlive_tpu.models.dit_bidirectional import bidirectional_forward
from longlive_tpu.ops import solvers as SV
from longlive_tpu.pipeline.text2video import Text2VideoPipeline


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32,
                               zero_head=False)
    pipe = Text2VideoPipeline(params, cfg, attn_impl="xla")
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    null = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim))
    return cfg, geom, params, pipe, cond, null


@pytest.mark.parametrize("solver", ["unipc", "dpm++"])
def test_generate_shapes_and_finiteness(setup, solver):
    cfg, geom, params, pipe, cond, null = setup
    out = pipe.generate_latents(
        cond, null, rng=jax.random.PRNGKey(3),
        latent_shape=(1, 3, geom.channels, geom.height, geom.width),
        sampling_steps=4, shift=5.0, guide_scale=5.0, solver=solver,
        dtype=jnp.float32)
    assert out.shape == (1, 3, geom.channels, geom.height, geom.width)
    assert np.isfinite(np.asarray(out)).all()


def test_batched_cfg_matches_sequential_forwards(setup):
    """The pipeline fuses cond+uncond into one batch-2B forward; it must
    equal the reference's two sequential forwards (text2video.py:236-242)."""
    cfg, geom, params, pipe, cond, null = setup
    noise = jax.random.normal(jax.random.PRNGKey(4),
                              (1, 2, geom.channels, geom.height, geom.width))
    coeffs = SV.make_coefficients("unipc", 3, 5.0)
    got = pipe.generate_latents(cond, null, noise=noise, sampling_steps=3,
                                guide_scale=4.0, solver="unipc",
                                dtype=jnp.float32)

    ckv_c = pipe.prepare_condition(cond)
    ckv_u = pipe.prepare_condition(null)

    def model_fn(x, t):
        tt = jnp.full((x.shape[0],), t, jnp.float32)
        c = bidirectional_forward(params, cfg, pipe.tables, x, tt, ckv_c,
                                  attn_impl="xla")
        u = bidirectional_forward(params, cfg, pipe.tables, x, tt, ckv_u,
                                  attn_impl="xla")
        return u + 4.0 * (c - u)

    want = SV.sample_flow(model_fn, noise, coeffs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_guide_scale_one_ignores_negative_prompt(setup):
    cfg, geom, params, pipe, cond, null = setup
    noise = jax.random.normal(jax.random.PRNGKey(5),
                              (1, 2, geom.channels, geom.height, geom.width))
    a = pipe.generate_latents(cond, null, noise=noise, sampling_steps=2,
                              guide_scale=1.0, dtype=jnp.float32)
    b = pipe.generate_latents(cond, cond * 0.0, noise=noise, sampling_steps=2,
                              guide_scale=1.0, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-4)
