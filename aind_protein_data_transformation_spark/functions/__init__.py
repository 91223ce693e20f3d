from .numeric import dsum, davg  # noqa: F401
