from . import pairwise  # noqa: F401
