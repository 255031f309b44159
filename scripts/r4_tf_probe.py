"""Teacher-forcing forward at FULL training geometry on one chip
(VERDICT r3 item 5 'Done' criterion): 21 frames @ 480x832 through the
arithmetic-mask flash kernel (mask_kind='teacher_forcing') — the dense
path would need a ~17 GB [65520^2] bias.  Prints ms/forward."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from longlive_tpu.utils import compile_cache

compile_cache.enable()

import jax.numpy as jnp

from longlive_tpu.config import DiTConfig, LatentGeometry
from longlive_tpu.models import dit as D
from longlive_tpu.ops.rope import make_rope_tables


def main():
    f = int(os.environ.get("TF_FRAMES", "21"))
    cfg = DiTConfig()
    geom = LatentGeometry()
    tables = make_rope_tables(cfg.head_dim, cfg.rope_max_pos)
    params = D.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    cross = D.prepare_cross_kv(params, cfg,
                               jnp.zeros((1, 512, 4096), jnp.bfloat16))
    noisy = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, f, geom.channels, geom.height, geom.width), jnp.bfloat16)
    clean = jax.random.normal(jax.random.PRNGKey(2), noisy.shape, jnp.bfloat16)
    t = jnp.full((1, f), 500.0, jnp.float32)

    fwd = jax.jit(lambda p, nz, cl: D.dit_forward_teacher_forcing(
        p, cfg, tables, nz, cl, t, cross, attn_impl="pallas",
        remat_layers=True))
    t0 = time.perf_counter()
    out = fwd(params, noisy, clean)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = int(os.environ.get("TF_REPS", "3"))
    for _ in range(reps):
        out = fwd(params, noisy, clean)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    finite = bool(jnp.isfinite(out).all())
    print(json.dumps({"frames": f, "tokens": 2 * f * geom.frame_seq_length,
                      "ms_per_forward": round(ms, 1),
                      "compile_s": round(compile_s, 1), "finite": finite}))
    assert finite


if __name__ == "__main__":
    main()
