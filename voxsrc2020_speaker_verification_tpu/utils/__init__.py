from . import datadir  # noqa: F401
