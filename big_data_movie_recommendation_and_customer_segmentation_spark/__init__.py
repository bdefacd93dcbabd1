"""PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference project
``rishswish/Big-Data_Movie-recommendation_and_Customer-Segmentation``
(a MovieLens recommendation + customer-segmentation PySpark capstone),
extended with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Design rules (see SURVEY.md §7):
- DataFrame/SQL API only; no RDDs in the hot path.
- Explicit schemas, Parquet-first.
- No ``collect``/``toPandas`` on unbounded data — operators stay
  distributed until results are provably bounded (top-k, metrics).
- Every operator documents its shuffle keys and its 100 TB strategy.
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
