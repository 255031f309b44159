"""Per-access weight streaming (utils.memory.stream_scan + the streamed
bidirectional forward) — the TPU-native DynamicSwapInstaller path
(reference utils/memory.py:13-58).  Exact-equivalence tests vs the scanned
on-device forwards."""

import jax
import jax.numpy as jnp
import numpy as np

from longlive_tpu.config import tiny_dit_config, tiny_geometry
from longlive_tpu.models import dit as D
from longlive_tpu.models.dit_bidirectional import (
    bidirectional_forward, bidirectional_forward_streamed)
from longlive_tpu.pipeline.text2video import Text2VideoPipeline
from longlive_tpu.utils.memory import blocks_to_host, stream_scan


def test_stream_scan_matches_lax_scan():
    rng = jax.random.PRNGKey(0)
    xs = {
        "w": jax.random.normal(rng, (5, 8, 8)),
        "b": jax.random.normal(jax.random.PRNGKey(1), (5, 8)),
    }
    carry0 = jax.random.normal(jax.random.PRNGKey(2), (4, 8))

    def body(c, x):
        return jnp.tanh(c @ x["w"] + x["b"]), None

    ref, _ = jax.lax.scan(body, carry0, xs)
    host_xs = jax.tree.map(lambda a: np.asarray(a), xs)
    got = stream_scan(lambda c, x: body(c, x)[0], carry0, host_xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_streamed_bidirectional_forward_parity():
    cfg, geom = tiny_dit_config(), tiny_geometry()
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32,
                               zero_head=False)
    from longlive_tpu.ops.rope import make_rope_tables

    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, 3, geom.channels, geom.height, geom.width))
    t = jnp.asarray([500.0, 250.0], jnp.float32)
    pe = jax.random.normal(jax.random.PRNGKey(2),
                           (2, cfg.text_len, cfg.text_dim))
    cross = D.prepare_cross_kv(params, cfg, pe)

    ref = jax.jit(
        lambda p: bidirectional_forward(p, cfg, tables, x, t, cross,
                                        attn_impl="xla"))(params)
    hp = blocks_to_host(params)
    assert isinstance(jax.tree.leaves(hp["blocks"])[0], np.ndarray)
    got = bidirectional_forward_streamed(hp, cfg, tables, x, t, cross,
                                         attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_t2v_offload_blocks_matches_default():
    """offload_blocks=True streams the DiT blocks from host through an
    eager sampler loop; latents must match the fully-jitted pipeline
    (reference offload_model=True must not change outputs,
    wan/text2video.py:150,258-262)."""
    cfg, geom = tiny_dit_config(), tiny_geometry()
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32,
                               zero_head=False)
    cond = jax.random.normal(jax.random.PRNGKey(1),
                             (1, cfg.text_len, cfg.text_dim))
    null = jax.random.normal(jax.random.PRNGKey(2),
                             (1, cfg.text_len, cfg.text_dim))
    kw = dict(rng=jax.random.PRNGKey(3),
              latent_shape=(1, 3, geom.channels, geom.height, geom.width),
              sampling_steps=4, shift=5.0, guide_scale=5.0, solver="unipc",
              dtype=jnp.float32)
    ref = Text2VideoPipeline(params, cfg, attn_impl="xla").generate_latents(
        cond, null, **kw)
    got = Text2VideoPipeline(params, cfg, attn_impl="xla",
                             offload_blocks=True).generate_latents(
        cond, null, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)
