"""Flash-kernel block-size sweep with tunnel-safe timing.

`jax.block_until_ready` is unreliable under the remote-device tunnel
(PERF.md "Measurement notes"), so each variant is timed as a chained
`lax.scan` (iteration n+1 consumes iteration n's output) of R reps inside
one jit, completion forced by a host fetch; cost = (t(R_hi) - t(R_lo)) /
(R_hi - R_lo) which cancels dispatch + fetch overhead.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

from longlive_tpu.ops.attention import flash_attention


def chained_ms(fn, x0, consts, r_hi=24, r_lo=4):
    """fn(x, *consts) -> x. Returns per-iteration milliseconds."""

    def run(reps):
        @jax.jit
        def prog(x):
            def body(c, _):
                return fn(c, *consts), None
            y, _ = jax.lax.scan(body, x, None, length=reps)
            return jnp.sum(y[..., ::512, 0].astype(jnp.float32))

        _ = float(prog(x0))  # compile + run once
        t0 = time.perf_counter()
        s = float(prog(x0))
        dt = time.perf_counter() - t0
        assert s == s, "nan"
        return dt

    hi, lo = run(r_hi), run(r_lo)
    return (hi - lo) / (r_hi - r_lo) * 1e3


def main():
    B, Sq, Skv, N, Dh = 1, 4680, 18720, 12, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, Sq, N, Dh), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, Skv, N, Dh), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, Skv, N, Dh), jnp.bfloat16)
    bias = jnp.zeros((B, Skv), jnp.float32)
    flops = 4 * Sq * Skv * Dh * N

    sweeps = [(256, 512), (256, 1024), (256, 2048), (512, 512), (512, 1024),
              (512, 2048), (1024, 512), (1024, 1024), (1024, 2048)]
    if len(sys.argv) > 1:
        sweeps = [tuple(map(int, s.split("x"))) for s in sys.argv[1:]]
    for bq, bkv in sweeps:
        fn = functools.partial(
            lambda qq, kk, vv, bb: flash_attention(
                qq, kk, vv, bb, block_q=bq, block_kv=bkv))
        try:
            ms = chained_ms(fn, q, (k, v, bias))
        except Exception as e:  # noqa: BLE001
            print(f"flash bq={bq} bkv={bkv}: FAIL {type(e).__name__}")
            continue
        print(f"flash bq={bq} bkv={bkv}: {ms:.3f} ms  {flops/(ms/1e3)/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
