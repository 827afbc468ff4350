from . import binning, project  # noqa: F401
