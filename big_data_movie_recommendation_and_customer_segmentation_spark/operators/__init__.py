from . import als, dedup, evaluate, multimodal, recommend, relational, similarity, splits, vectorops  # noqa: F401
