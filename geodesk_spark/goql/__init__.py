"""GOQL — GeoDesk's tag-query language, compiled to Catalyst Columns.

The reference parses GOQL into Selector/TagClause ASTs and JIT-compiles
them to JVM bytecode (feature/match/MatcherParser.java, MatcherCoder.java).
Here the same grammar compiles to a pyspark Column — Spark's whole-stage
codegen is the JIT.
"""

from geodesk_spark.goql.compiler import compile_goql, lenient_double_col  # noqa: F401
from geodesk_spark.goql.parser import GoqlError, parse  # noqa: F401
