"""Golden tests for the flow-match schedule against the reference math
(utils/scheduler.py), recomputed independently in numpy/torch."""

import numpy as np
import jax.numpy as jnp
import pytest

from longlive_tpu.ops import scheduler as S


def _reference_sigmas(n, shift, sigma_min, sigma_max, extra_one_step):
    import torch

    if extra_one_step:
        sigmas = torch.linspace(sigma_max, sigma_min, n + 1)[:-1]
    else:
        sigmas = torch.linspace(sigma_max, sigma_min, n)
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    return sigmas.numpy()


@pytest.mark.parametrize("shift,extra", [(5.0, True), (3.0, False), (8.0, True)])
def test_sigma_table_matches_reference(shift, extra):
    sched = S.make_schedule(
        1000, shift=shift, sigma_min=0.0 if extra else 0.003 / 1.002, extra_one_step=extra
    )
    ref = _reference_sigmas(1000, shift, 0.0 if extra else 0.003 / 1.002, 1.0, extra)
    np.testing.assert_allclose(np.asarray(sched.sigmas), ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.timesteps), ref * 1000, rtol=1e-5, atol=1e-3
    )


def test_warp_denoising_steps():
    # reference pipeline/causal_inference.py:33-37 with shift=5
    sched = S.make_schedule(1000, shift=5.0, sigma_min=0.0, extra_one_step=True)
    steps = S.warp_denoising_steps(sched, [1000, 750, 500, 250])
    t = np.concatenate([np.asarray(sched.timesteps), [0.0]])
    expected = t[[0, 250, 500, 750]]
    np.testing.assert_allclose(steps, expected, rtol=1e-6)
    assert steps[0] == pytest.approx(1000.0)
    # shift-5 warp: sigma(0.75) = 5*0.75/(1+4*0.75) = 0.9375
    assert steps[1] == pytest.approx(937.5, rel=1e-4)


def test_add_noise_matches_closed_form():
    sched = S.make_schedule(1000, shift=5.0, sigma_min=0.0, extra_one_step=True)
    rng = np.random.RandomState(0)
    x0 = rng.randn(6, 4, 8, 8).astype(np.float32)
    noise = rng.randn(6, 4, 8, 8).astype(np.float32)
    t = jnp.asarray([1000.0, 937.5, 833.33331, 625.0, 0.0, 400.0])
    out = S.add_noise(sched, jnp.asarray(x0), jnp.asarray(noise), t)
    tid = np.argmin(
        np.abs(np.asarray(sched.timesteps)[None, :] - np.asarray(t)[:, None]), axis=1
    )
    sig = np.asarray(sched.sigmas)[tid][:, None, None, None]
    np.testing.assert_allclose(
        np.asarray(out), (1 - sig) * x0 + sig * noise, rtol=1e-4, atol=1e-5
    )


def test_flow_x0_roundtrip():
    sched = S.make_schedule(1000, shift=5.0, sigma_min=0.0, extra_one_step=True)
    rng = np.random.RandomState(1)
    xt = jnp.asarray(rng.randn(4, 3, 5, 5).astype(np.float32))
    flow = jnp.asarray(rng.randn(4, 3, 5, 5).astype(np.float32))
    t = jnp.asarray([937.5, 937.5, 625.0, 400.0])
    x0 = S.convert_flow_to_x0(sched, flow, xt, t)
    flow2 = S.convert_x0_to_flow(sched, x0, xt, t)
    np.testing.assert_allclose(np.asarray(flow2), np.asarray(flow), rtol=1e-3, atol=1e-4)


def test_step_euler():
    sched = S.make_schedule(4, shift=1.0, sigma_min=0.25, extra_one_step=False)
    # sigmas = [1.0, 0.75, 0.5, 0.25] (no shift)
    sample = jnp.ones((2, 1, 1, 1))
    out = S.step(sched, jnp.ones_like(sample) * 2.0, jnp.asarray([1000.0, 750.0]), sample)
    np.testing.assert_allclose(
        np.asarray(out)[:, 0, 0, 0], [1 + 2 * (0.75 - 1.0), 1 + 2 * (0.5 - 0.75)], rtol=1e-5
    )


def test_training_weights_match_reference_formula():
    sched = S.make_schedule(
        1000, shift=8.0, sigma_min=0.0, extra_one_step=True, training=True
    )
    x = np.asarray(sched.timesteps)
    y = np.exp(-2 * ((x - 500) / 1000) ** 2)
    ys = y - y.min()
    expected = ys * (1000 / ys.sum())
    np.testing.assert_allclose(np.asarray(sched.weights), expected, rtol=1e-4)
    w = S.training_weight(sched, jnp.asarray([x[3], x[500]]))
    np.testing.assert_allclose(np.asarray(w), expected[[3, 500]], rtol=1e-4)
