from . import scene  # noqa: F401
