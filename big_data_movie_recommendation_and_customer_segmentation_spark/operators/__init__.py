from . import als, dedup, evaluate, multimodal, recommend, relational, similarity, splits, temporal, vectorops  # noqa: F401
