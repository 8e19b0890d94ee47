from . import diagnostics  # noqa: F401
