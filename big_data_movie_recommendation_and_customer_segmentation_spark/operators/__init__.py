from . import als, evaluate, recommend, relational, similarity, splits  # noqa: F401
