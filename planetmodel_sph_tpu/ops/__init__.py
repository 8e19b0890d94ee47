from . import dense, eos, gravity, kernels  # noqa: F401
