"""Operator library over the driver test tables (TPC-H-ish star schema +
documents/embeddings) — the SQL-visible face of the engine. Every operator
here has a ``queries()`` entry in ``__spark_entry__.py`` and (where
SQL-expressible) a DuckDB ``oracle_sql()`` twin."""
