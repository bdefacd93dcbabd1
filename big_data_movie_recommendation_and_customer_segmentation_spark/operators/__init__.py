from . import relational, splits  # noqa: F401
