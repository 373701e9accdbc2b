from . import bootstrap  # noqa: F401
