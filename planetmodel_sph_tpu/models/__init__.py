from . import ics, planet  # noqa: F401
