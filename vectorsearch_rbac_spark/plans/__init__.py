from . import queries, strategy  # noqa: F401
