from . import dit, nn  # noqa: F401
