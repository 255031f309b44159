"""End-to-end DMD *learning* test (VERDICT r4 Missing #1).

Every other training test verifies mechanics; this one verifies that the
real ``ScoreDistillationTrainer`` MOVES THE GENERATOR toward the teacher's
distribution, and that flipping the KL-gradient sign (reference
model/dmd.py:119-199 semantics) destroys the effect.  A sign flip, a
misplaced stop_gradient zeroing the update, or an EMA/critic mix-up passes
every mechanics test and burns a real 32-GPU-day run; this catches them in
minutes on CPU.

Full-budget curves (scripts/dmd_convergence.py --steps 300,
teacher_steps 600, recorded in PARITY.md):
  normal:    mse_to_mu 2.158 -> 0.706 (3.1x reduction, monotone to plateau)
  flip-sign: mse_to_mu 2.158 -> 461.0 (divergence)
The test runs a reduced budget with conservative margins.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.slow
def test_dmd_training_learns_and_sign_flip_fails():
    import dmd_convergence as H

    common = dict(steps=60, eval_every=20, teacher_steps=300, verbose=False)
    pos = H.run(flip_sign=False, **common)
    # the generator's samples move toward the teacher's toy distribution
    assert pos["final_mse"] < 0.8 * pos["initial_mse"], pos["curve"]
    # the decline is a trend, not one lucky eval: the last eval is also
    # below every eval in the first third of the run
    first_third = [v for s, v in pos["curve"] if s <= common["steps"] // 3]
    assert pos["final_mse"] < min(first_third), pos["curve"]

    neg = H.run(flip_sign=True, **common)
    # flipped KL gradient must NOT improve (full-budget runs diverge hard)
    assert neg["final_mse"] > 0.95 * neg["initial_mse"], neg["curve"]
    # and the two runs must be distinguishable by a wide margin
    assert neg["final_mse"] > 2.0 * pos["final_mse"]
