from . import cellid, coords, hilbert, metrics  # noqa: F401
