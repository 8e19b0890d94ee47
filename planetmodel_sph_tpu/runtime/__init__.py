"""Native (C++) runtime components, loaded via ctypes.

Built lazily with g++ on first use (no pip dependencies); every consumer
must degrade gracefully when a toolchain is unavailable (`available()`).
"""

from .native import available, lib_path  # noqa: F401
from . import snapshot  # noqa: F401
