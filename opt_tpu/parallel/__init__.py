from . import mesh  # noqa: F401  (ot.parallel.mesh access path)
