"""Ulysses sequence parallelism: sharded forward == single-chip forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longlive_tpu.config import tiny_dit_config, tiny_geometry
from longlive_tpu.models import dit as D
from longlive_tpu.models.dit_bidirectional import bidirectional_forward
from longlive_tpu.ops.rope import make_rope_tables
from longlive_tpu.parallel import mesh as M
from longlive_tpu.parallel.sequence import sp_bidirectional_forward


def test_sp_matches_single_chip():
    cfg = tiny_dit_config()
    geom = tiny_geometry()
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32,
                               zero_head=False)
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    prompts = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    cross = D.prepare_cross_kv(params, cfg, prompts, jnp.float32)
    # 4 frames x 16 tokens = 64 tokens; heads=4 -> sp up to 4
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (1, 4, geom.channels, geom.height, geom.width))
    t = jnp.asarray([500.0])
    ref = bidirectional_forward(params, cfg, tables, x, t, cross, attn_impl="xla")

    mesh = M.make_mesh(dp=1, fsdp=2, sp=4)
    out = jax.jit(lambda p, xx: sp_bidirectional_forward(
        p, cfg, tables, mesh, xx, t, cross, attn_impl="xla"))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)
