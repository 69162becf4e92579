"""PySpark-native entity-resolution engine over conversation-transcript tables.

A from-scratch reimplementation of the query/data-processing semantics of
jasmin-baier/tabiya-livelihoods-classifier (reference at /root/reference,
read-only) as full-scale record linkage on Spark:

    canonicalize -> extract -> block -> pairwise-score -> cluster -> enrich -> eval

Everything is DataFrame/SQL-first (Catalyst-optimized); Python appears only in
Arrow-batched pandas UDFs (never per-row Python). See SURVEY.md for the
operator-by-operator mapping with reference file:line citations.
"""

__version__ = "0.1.0"

from tabiya_livelihoods_classifier_spark.session import get_spark  # noqa: F401
