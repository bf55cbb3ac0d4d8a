from . import tum, trajectory, evaluate  # noqa: F401
