"""vectorsearch_applications_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``americanthinker/vectorsearch-applications``
(vector-search / RAG data system: chunk → embed → index → BM25 / kNN / hybrid
search → rerank → context assembly → eval), extended with the operators a
large-scale training-data pipeline needs (dedup, similarity search, text
analysis, multimodal plumbing, streaming aggregates).

Design stance (see SURVEY.md §7):
- every operator is a pure ``DataFrame -> DataFrame`` function;
- declarative DataFrame/SQL plans so Catalyst handles pushdown/pruning/joins;
- deterministic mode throughout (hash embeddings, fixed tie-breakers) so
  every operator is oracle-checkable against DuckDB;
- Pandas UDFs only where built-ins genuinely cannot express the op.
"""

__version__ = "0.1.0"
