"""Riemann predicate query language → Spark Column / SQL predicate.

Reference: grammar ``resources/query.g4``, compiler ``src/riemann/
query.clj``. Here the string compiles to an AST (parser.py) and then to
a ``pyspark.sql.Column`` (compiler.py) so Catalyst gets a fully
declarative predicate — pushdown/pruning replace the reference's
hand-rolled ``host = X and service = Y`` fast path (index.clj:44-56).
"""

from riemann_spark.query.parser import parse
from riemann_spark.query.compiler import to_column, to_predicate, to_sql


def compile_query(query: str):
    """query string → pyspark Column predicate (LRU-cached parse)."""
    return to_column(parse(query))


__all__ = ["parse", "to_column", "to_predicate", "to_sql", "compile_query"]
