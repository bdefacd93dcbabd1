from . import als, dedup, evaluate, multimodal, recommend, relational, similarity, sketches, splits, temporal, vectorops  # noqa: F401
