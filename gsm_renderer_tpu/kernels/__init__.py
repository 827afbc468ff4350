from . import blend  # noqa: F401
