"""PySpark-native entity-resolution (address-linkage) engine.

A from-scratch re-expression of the capabilities of
SeamusWaldron/ehdc-llpg-address-matching (Go + PostgreSQL + Qdrant)
as an idiomatic Spark DataFrame pipeline:

    documents (Iceberg/parquet, interleaved text+media spans)
        -> span extraction -> normalization (Arrow UDFs)
        -> blocking keys -> candidate joins -> pair features
        -> weighted score -> tiered decision -> connected components
        -> canonical UPRN per cluster -> matches + audit tables

See SURVEY.md at the repo root for the operator-by-operator map with
file:line citations into the reference.
"""

__version__ = "0.1.0"
