from . import textops, vector  # noqa: F401
