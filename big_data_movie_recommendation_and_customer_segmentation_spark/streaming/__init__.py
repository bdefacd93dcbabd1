from . import joins, stateful, windows  # noqa: F401
