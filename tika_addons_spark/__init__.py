"""tika_addons_spark — a PySpark-native content-extraction & corpus-analytics engine.

A from-scratch reimplementation of the *capabilities* of tballison/tika-addons
(reference, read-only, at /root/reference) re-expressed Spark-first:

- DataFrame/SQL declarative plans (Catalyst optimizes; no hand scheduling)
- vectorized Arrow/pandas UDFs for the extraction hot path (HTML boilerplate
  strip, PDF-ish payload parse, markup normalization) — never per-row Python UDFs
- explicit partitioning / salting for skewed conversations
- checkpoint-table resumability (Iceberg MERGE when available, parquet
  anti-join seam in the sandbox)

See SURVEY.md for the operator-by-operator mapping with reference file:line
citations.
"""

__version__ = "0.1.0"
