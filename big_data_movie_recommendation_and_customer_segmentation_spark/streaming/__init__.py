from . import stateful, windows  # noqa: F401
