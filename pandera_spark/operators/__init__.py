"""Beyond-reference operators for large-scale training-data pipelines.

These are first-class engine components (BASELINE.json north star): exact and
approximate deduplication, similarity search over embedding columns, text
analysis, and multimodal column plumbing — all expressed Spark-first
(built-in functions in the hot path, Arrow-batched pandas UDFs where Python
is genuinely required).
"""
