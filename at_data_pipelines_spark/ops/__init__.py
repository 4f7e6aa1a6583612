from .asof import asof_join  # noqa: F401
