"""Flow-matching multistep ODE solvers (UniPC / DPM-Solver++), TPU-native.

These power the 50-step bidirectional WanT2V / WanI2V samplers, replacing
the reference's vendored diffusers-style schedulers
(wan/utils/fm_solvers.py:69-857, wan/utils/fm_solvers_unipc.py:20-799,
selected at wan/text2video.py:202-221).

The reference schedulers are stateful Python objects that re-derive scalar
update coefficients with device tensor math inside the sampling loop (log /
expm1 / linalg.solve per step, plus `.item()` bookkeeping).  That design is
jit-hostile.  Here the observation is that for a *fixed* (num_steps, shift,
solver_order) every per-step coefficient — including the deterministic
warm-up / lower-order-final order schedule and the UniPC corrector order —
is a compile-time constant.  So:

1. coefficients are precomputed on host in float64 numpy
   (`unipc_coefficients` / `dpmpp_coefficients`); each sampler step becomes
   a 5-term linear combination of (x, x_prev, m_t, m_{i-1}, m_{i-2});
2. the sampler (`sample_flow`) is one `lax.scan` over steps; the model
   call is the only non-trivial work per step.

Math preserved exactly (predict_x0 / flow_prediction branches):
- x0 conversion: x0 = x_t - sigma_t * v          (fm_solvers_unipc.py:318-331)
- UniPC-p predictor, B(h) variants bh1/bh2       (fm_solvers_unipc.py:350-484)
- UniPC-c corrector                              (fm_solvers_unipc.py:486-626)
- DPM-Solver++ orders 1-3, midpoint/heun         (fm_solvers.py:415-677)
- sigma schedules + shift warp + final zero      (fm_solvers.py:22-26,248-273)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolverCoeffs:
    """Per-step tables for `sample_flow`.  All [N] float32 unless noted.

    Predictor:   x_{i+1} = ax*x + am0*m_i + am1*m_{i-1} + am2*m_{i-2}
    Corrector:   x_i    <- bxt*x_i + bx*x_{i-1} + bmt*m_i + bm1*m_{i-1}
                           + bm2*m_{i-2}
    where m_j is the x0-prediction produced at step j (m_i from the current
    model call).  DPM++ has no corrector: bxt == 1, rest == 0.
    """

    timesteps: jax.Array  # [N] f32 — value fed to the model (int64-truncated)
    sigmas: jax.Array  # [N] f32 — sigma at each step (for x0 conversion)
    ax: jax.Array
    am0: jax.Array
    am1: jax.Array
    am2: jax.Array
    bxt: jax.Array
    bx: jax.Array
    bmt: jax.Array
    bm1: jax.Array
    bm2: jax.Array


def _pack(timesteps, sigmas, pred, corr) -> SolverCoeffs:
    f = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
    return SolverCoeffs(
        timesteps=f(timesteps), sigmas=f(sigmas),
        ax=f(pred[:, 0]), am0=f(pred[:, 1]), am1=f(pred[:, 2]), am2=f(pred[:, 3]),
        bxt=f(corr[:, 0]), bx=f(corr[:, 1]), bmt=f(corr[:, 2]),
        bm1=f(corr[:, 3]), bm2=f(corr[:, 4]),
    )


def flow_shift_warp(sigmas: np.ndarray, shift: float) -> np.ndarray:
    """sigma' = s*sigma / (1 + (s-1)*sigma) (fm_solvers.py:24)."""
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


def unipc_sigmas(num_steps: int, shift: float,
                 num_train_timesteps: int = 1000) -> np.ndarray:
    """FlowUniPCMultistepScheduler.set_timesteps sigma grid, final sigma 0
    appended (fm_solvers_unipc.py:182-207).  sigma_max = 1 - 1/T."""
    sigma_max = 1.0 - 1.0 / num_train_timesteps
    s = np.linspace(sigma_max, 0.0, num_steps + 1, dtype=np.float64)[:-1]
    s = flow_shift_warp(s, shift)
    return np.concatenate([s, [0.0]])


def dpmpp_sigmas(num_steps: int, shift: float,
                 num_train_timesteps: int = 1000) -> np.ndarray:
    """get_sampling_sigmas grid (starts at exactly 1.0; fm_solvers.py:22-26)
    with the final zero appended by set_timesteps (fm_solvers.py:272)."""
    s = np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float64)[:num_steps]
    s = flow_shift_warp(s, shift)
    return np.concatenate([s, [0.0]])


def _lambdas(sigmas: np.ndarray) -> np.ndarray:
    """lambda = log(alpha) - log(sigma), alpha = 1 - sigma (flow-match
    `_sigma_to_alpha_sigma_t`, fm_solvers_unipc.py:272-273)."""
    with np.errstate(divide="ignore"):
        return np.log(1.0 - sigmas) - np.log(sigmas)


def _timesteps_of(sigmas: np.ndarray, num_train_timesteps: int) -> np.ndarray:
    # The reference casts to int64 (truncation) before feeding the model.
    return np.trunc(sigmas[:-1] * num_train_timesteps)


def unipc_coefficients(
    num_steps: int,
    shift: float = 5.0,
    solver_order: int = 2,
    solver_type: str = "bh2",
    lower_order_final: bool = True,
    num_train_timesteps: int = 1000,
    sigmas: Optional[np.ndarray] = None,
) -> SolverCoeffs:
    """Precomputes the full UniPC-p/UniC predictor-corrector schedule
    (fm_solvers_unipc.py:655-739 `step`, with its deterministic
    `lower_order_nums` warm-up and `this_order` bookkeeping unrolled)."""
    assert solver_type in ("bh1", "bh2")
    # order-3 UniPC's corrector would need m_{i-3}, beyond the scan carry;
    # the reference default (and only shipped use) is solver_order=2.
    assert 1 <= solver_order <= 2
    if sigmas is None:
        sigmas = unipc_sigmas(num_steps, shift, num_train_timesteps)
    sigmas = np.asarray(sigmas, np.float64)
    n = len(sigmas) - 1
    lam = _lambdas(sigmas)
    alpha = 1.0 - sigmas

    # Deterministic order schedule (step:705-731).
    pred_orders, corr_orders = [], []
    lower_order_nums = 0
    prev_order = 0
    for i in range(n):
        corr_orders.append(prev_order if i > 0 else 0)
        order = min(solver_order, n - i) if lower_order_final else solver_order
        order = min(order, lower_order_nums + 1)
        pred_orders.append(order)
        if lower_order_nums < solver_order:
            lower_order_nums += 1
        prev_order = order

    def bh_terms(h):
        """(h_phi_1, B_h, b-vector builder state) for hh = -h (predict_x0)."""
        hh = -h
        h_phi_1 = np.expm1(hh)
        b_h = hh if solver_type == "bh1" else np.expm1(hh)
        return hh, h_phi_1, b_h

    def rb_system(order, rks, hh, h_phi_1, b_h):
        """R rows / b entries exactly as the reference loop builds them
        (fm_solvers_unipc.py:446-453)."""
        rr, bb = [], []
        h_phi_k = h_phi_1 / hh - 1.0
        factorial_i = 1.0
        for i in range(1, order + 1):
            rr.append(np.power(rks, i - 1))
            bb.append(h_phi_k * factorial_i / b_h)
            factorial_i *= i + 1
            h_phi_k = h_phi_k / hh - 1.0 / factorial_i
        return np.stack(rr), np.asarray(bb)

    pred = np.zeros((n, 4))
    corr = np.zeros((n, 5))
    for i in range(n):
        # ---- corrector (multistep_uni_c_bh_update:486-626), order c ----
        c = corr_orders[i]
        if c == 0:
            corr[i, 0] = 1.0  # identity: keep this_sample
        else:
            h = lam[i] - lam[i - 1]
            hh, h_phi_1, b_h = bh_terms(h)
            rks = [(lam[i - 1 - j] - lam[i - 1]) / h for j in range(1, c)] + [1.0]
            rks = np.asarray(rks)
            r_mat, b_vec = rb_system(c, rks, hh, h_phi_1, b_h)
            rhos_c = np.asarray([0.5]) if c == 1 else np.linalg.solve(r_mat, b_vec)
            corr[i, 1] = sigmas[i] / sigmas[i - 1]  # on last_sample
            corr[i, 2] = -alpha[i] * b_h * rhos_c[-1]  # on m_t (D1_t term)
            # on m_{i-1} (m0): -alpha*h_phi_1, + D1_t's +m0, + D1s' +m0/rk
            corr[i, 3] = -alpha[i] * h_phi_1 + alpha[i] * b_h * rhos_c[-1]
            for j in range(1, c):  # D1s_j = (m_{i-1-j} - m0) / rk_j
                corr[i, 3] += alpha[i] * b_h * rhos_c[j - 1] / rks[j - 1]
                corr[i, 4 + (j - 1)] -= alpha[i] * b_h * rhos_c[j - 1] / rks[j - 1]

        # ---- predictor (multistep_uni_p_bh_update:350-484), order p ----
        p = pred_orders[i]
        h = lam[i + 1] - lam[i]
        hh, h_phi_1, b_h = bh_terms(h)
        rks = [(lam[i - j] - lam[i]) / h for j in range(1, p)] + [1.0]
        rks = np.asarray(rks)
        pred[i, 0] = sigmas[i + 1] / sigmas[i] if sigmas[i + 1] > 0 else 0.0
        pred[i, 1] = -alpha[i + 1] * h_phi_1
        if p >= 2:
            r_mat, b_vec = rb_system(p, rks, hh, h_phi_1, b_h)
            rhos_p = (np.asarray([0.5]) if p == 2
                      else np.linalg.solve(r_mat[:-1, :-1], b_vec[:-1]))
            for j in range(1, p):  # D1s_j = (m_{i-j} - m0) / rk_j
                pred[i, 1] += alpha[i + 1] * b_h * rhos_p[j - 1] / rks[j - 1]
                pred[i, 1 + j] -= alpha[i + 1] * b_h * rhos_p[j - 1] / rks[j - 1]

    return _pack(_timesteps_of(sigmas, num_train_timesteps), sigmas[:-1], pred, corr)


def dpmpp_coefficients(
    num_steps: int,
    shift: float = 5.0,
    solver_order: int = 2,
    solver_type: str = "midpoint",
    lower_order_final: bool = True,
    euler_at_final: bool = False,
    num_train_timesteps: int = 1000,
    sigmas: Optional[np.ndarray] = None,
) -> SolverCoeffs:
    """Precomputes the multistep DPM-Solver++ schedule
    (fm_solvers.py:706-797 `step`, algorithm_type='dpmsolver++',
    final_sigmas_type='zero')."""
    assert solver_type in ("midpoint", "heun")
    assert 1 <= solver_order <= 3
    if sigmas is None:
        sigmas = dpmpp_sigmas(num_steps, shift, num_train_timesteps)
    sigmas = np.asarray(sigmas, np.float64)
    n = len(sigmas) - 1
    lam = _lambdas(sigmas)
    alpha = 1.0 - sigmas

    pred = np.zeros((n, 4))
    corr = np.zeros((n, 5))
    corr[:, 0] = 1.0  # no corrector in DPM++
    lower_order_nums = 0
    for i in range(n):
        # final_sigmas_type == "zero" always forces first order at the last
        # step (fm_solvers.py:746-749); lower_order_second for <15 steps.
        lof = i == n - 1
        los = (i == n - 2) and lower_order_final and n < 15
        h = lam[i + 1] - lam[i]
        emh1 = np.expm1(-h)  # exp(-h) - 1
        pred[i, 0] = sigmas[i + 1] / sigmas[i] if sigmas[i + 1] > 0 else 0.0
        if solver_order == 1 or lower_order_nums < 1 or lof:
            pred[i, 1] = -alpha[i + 1] * emh1
        elif solver_order == 2 or lower_order_nums < 2 or los:
            h0 = lam[i] - lam[i - 1]
            r0 = h0 / h
            if solver_type == "midpoint":
                pred[i, 1] = -alpha[i + 1] * emh1 * (1.0 + 0.5 / r0)
                pred[i, 2] = alpha[i + 1] * emh1 * 0.5 / r0
            else:  # heun
                k = alpha[i + 1] * (emh1 / h + 1.0)
                pred[i, 1] = -alpha[i + 1] * emh1 + k / r0
                pred[i, 2] = -k / r0
        else:  # third order (fm_solvers.py:596-677)
            h0, h1 = lam[i] - lam[i - 1], lam[i - 1] - lam[i - 2]
            r0, r1 = h0 / h, h1 / h
            kd1 = alpha[i + 1] * (emh1 / h + 1.0)
            kd2 = -alpha[i + 1] * ((emh1 + h) / h**2 - 0.5)
            # D1 = D1_0 + (r0/(r0+r1))(D1_0 - D1_1); D2 = (D1_0 - D1_1)/(r0+r1)
            c10 = (1.0 + r0 / (r0 + r1)) / r0  # D1's m0-m1 weight
            c11 = (r0 / (r0 + r1)) / r1  # D1's -(m1-m2) weight
            d20 = 1.0 / (r0 + r1) / r0
            d21 = 1.0 / (r0 + r1) / r1
            pred[i, 1] = -alpha[i + 1] * emh1 + kd1 * c10 + kd2 * d20
            pred[i, 2] = -kd1 * (c10 + c11) - kd2 * (d20 + d21)
            pred[i, 3] = kd1 * c11 + kd2 * d21
        if lower_order_nums < solver_order:
            lower_order_nums += 1

    return _pack(_timesteps_of(sigmas, num_train_timesteps), sigmas[:-1], pred, corr)


def make_coefficients(solver: str, num_steps: int, shift: float,
                      **kw) -> SolverCoeffs:
    """'unipc' | 'dpm++' dispatch (wan/text2video.py:202-221)."""
    if solver == "unipc":
        return unipc_coefficients(num_steps, shift, **kw)
    if solver in ("dpm++", "dpmpp"):
        return dpmpp_coefficients(num_steps, shift, **kw)
    raise NotImplementedError(f"Unsupported solver: {solver}")


def sample_flow(
    model_fn: Callable[[jax.Array, jax.Array], jax.Array],
    noise: jax.Array,
    coeffs: SolverCoeffs,
) -> jax.Array:
    """Runs the full sampler as one `lax.scan`.

    model_fn(x, t) -> flow prediction at timestep t (t is a f32 scalar; CFG
    and conditioning are the caller's closure).  Solver state is carried in
    float32 regardless of the model dtype (the reference upcasts samples to
    f32 in `step`, fm_solvers.py:760).
    """

    def body(carry, xs):
        x, m1, m2, x_prev = carry
        t, sig, ax, am0, am1, am2, bxt, bx, bmt, bm1, bm2 = xs
        v = model_fn(x.astype(noise.dtype), t).astype(jnp.float32)
        mt = x - sig * v  # x0 conversion (fm_solvers_unipc.py:318-321)
        xc = bxt * x + bx * x_prev + bmt * mt + bm1 * m1 + bm2 * m2
        xn = ax * xc + am0 * mt + am1 * m1 + am2 * m2
        return (xn, mt, m1, xc), None

    x0 = noise.astype(jnp.float32)
    z = jnp.zeros_like(x0)
    xs = (coeffs.timesteps, coeffs.sigmas, coeffs.ax, coeffs.am0, coeffs.am1,
          coeffs.am2, coeffs.bxt, coeffs.bx, coeffs.bmt, coeffs.bm1,
          coeffs.bm2)
    (x, _, _, _), _ = jax.lax.scan(body, (x0, z, z, z), xs)
    return x.astype(noise.dtype)


def sample_flow_eager(
    model_fn: Callable[[jax.Array, jax.Array], jax.Array],
    noise: jax.Array,
    coeffs: SolverCoeffs,
) -> jax.Array:
    """`sample_flow` as a host-side Python loop: same math, but `model_fn`
    runs OUTSIDE any trace, so it may be a non-jittable callable — in
    particular the weight-streamed forward
    (models.dit_bidirectional.bidirectional_forward_streamed), whose
    per-layer host→device copies cannot live inside one jitted program.
    Coefficients are host numpy already (make_coefficients), so slicing
    them per step stays on the host."""
    import numpy as np

    x = noise.astype(jnp.float32)
    z = jnp.zeros_like(x)
    m1, m2, x_prev = z, z, z
    n_steps = np.asarray(coeffs.timesteps).shape[0]
    for i in range(n_steps):
        t = jnp.asarray(coeffs.timesteps[i], jnp.float32)
        v = model_fn(x.astype(noise.dtype), t).astype(jnp.float32)
        mt = x - coeffs.sigmas[i] * v
        xc = (coeffs.bxt[i] * x + coeffs.bx[i] * x_prev + coeffs.bmt[i] * mt
              + coeffs.bm1[i] * m1 + coeffs.bm2[i] * m2)
        xn = (coeffs.ax[i] * xc + coeffs.am0[i] * mt + coeffs.am1[i] * m1
              + coeffs.am2[i] * m2)
        x, m1, m2, x_prev = xn, mt, m1, xc
    return x.astype(noise.dtype)
