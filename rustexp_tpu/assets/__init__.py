from . import gol_patterns  # noqa: F401
