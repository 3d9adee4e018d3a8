"""The syzgydb metadata filter expression language, Spark-native.

The reference compiles a filter string to a per-row Go closure over
``json.Unmarshal``'d metadata (/root/reference/query/query.go:11-32,
compiler.go:477-497). Here the same grammar compiles to a
``pyspark.sql.Column`` over a VARIANT metadata column, so the predicate
stays JVM-side (whole-stage codegen, pushdown-friendly) instead of
running row-at-a-time in Python.

Semantics preserved from the reference (see SURVEY.md §2.2, §7.3):

* every JSON number is a float64 (``encoding/json`` behavior);
* comparisons are type-strict — mixed-type ``>``/``<`` is an *error*;
* ``==``/``!=`` are DeepEqual: type mismatch is ``false``, not an error;
* a row whose filter **errors** (missing field in a comparison, type
  mismatch, non-boolean AND/OR operand) is **excluded**
  (collection.go:210-217) — modeled as SQL NULL, with
  ``coalesce(pred, false)`` at the top;
* ``{"a": null}`` → ``a EXISTS`` is true and ``a == null`` is true;
  an absent key is neither (compiler.go:433-449);
* array index out of bounds yields JSON-null-like nil, not an error
  (compiler.go:257-259).

Supported superset: ``ANY``/``ALL``/``[*]`` (lexed but dead in the
reference, parser.go:278-326) are implemented here via Spark
``exists``/``forall`` higher-order functions.
"""

from syzgydb_spark.query.lexer import tokenize, Token
from syzgydb_spark.query.parser import parse, ast_repr
from syzgydb_spark.query.compiler import compile_filter, compile_to_column, where_filter
from syzgydb_spark.query.typed import compile_filter_typed, where_filter_typed

__all__ = [
    "tokenize",
    "Token",
    "parse",
    "ast_repr",
    "compile_filter",
    "compile_to_column",
    "where_filter",
    "compile_filter_typed",
    "where_filter_typed",
]
