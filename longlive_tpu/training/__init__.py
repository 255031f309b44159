from . import dmd, rollout, trainer  # noqa: F401
