from .canonical import canonicalize_pandas, compare_frames  # noqa: F401
