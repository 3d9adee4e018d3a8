"""HTML → text extraction — Catalyst regexp expressions.

Web corpora arrive as markup; the standard first transform (the
WET-extraction step of CommonCrawl-derived pipelines, cf. C4 / CCNet /
RefinedWeb) strips tags and resolves character entities before any
tokenization or quality pass. Full DOM-aware readability extraction is
a per-document parser (a `mapInPandas` stage when a deployment wants
trafilatura-grade output); this module is the scalable regex tier that
handles the overwhelmingly common cases — tags, script/style/comment
blocks, the high-frequency entities — as pure whole-stage-codegen
expressions, zero Python.

Regexes stay inside the Java-regex ∩ RE2 intersection ((?s)/(?i)
flags, lazy quantifiers, classes — no lookaround, no backrefs) so any
engine replays them identically; the DuckDB oracle runs the same
chain.

Reference: none (the reference stores caller-provided text); part of
the training-data-pipeline superset.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: entity → replacement, applied in a fixed order (amp LAST, so
#: double-escaped text like ``&amp;lt;`` resolves one level per pass,
#: the standard single-pass contract)
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def strip_html(col: Column | str) -> Column:
    """Visible text of an HTML fragment:

    1. ``<script>``/``<style>`` elements removed WITH their content
       (case-insensitive, dot-matches-newline, lazy to the matching
       close tag);
    2. HTML comments removed;
    3. block-level close tags (``</p> </div> </li> </h1..6> </tr>``
       and ``<br>``) become newlines, every other tag a space — so
       words from adjacent blocks never fuse;
    4. the common character entities resolved (one pass, ``&amp;``
       last);
    5. horizontal whitespace runs collapsed to one space, per-line
       trimmed, blank lines dropped, outer trim.

    NULL stays NULL. Pure codegen — no UDF at any scale."""
    x = _c(col)
    x = F.regexp_replace(x, r"(?is)<script[^>]*>.*?</script>", " ")
    x = F.regexp_replace(x, r"(?is)<style[^>]*>.*?</style>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(
        x, r"(?i)</(p|div|li|h[1-6]|tr|ul|ol|table|blockquote)>|<br[^>]*>", "\n"
    )
    x = F.regexp_replace(x, r"(?s)<[^>]*>", " ")
    for ent, repl in _ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(repl))
    x = F.regexp_replace(x, r"[ \t\r]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n+", "\n")
    x = F.regexp_replace(x, r"^\n|\n$", "")  # trim() only strips spaces
    return F.trim(x)


def html_title(col: Column | str) -> Column:
    """Contents of the first ``<title>`` element (entities resolved,
    whitespace collapsed), or '' when absent."""
    x = F.regexp_extract(_c(col), r"(?is)<title[^>]*>(.*?)</title>", 1)
    for ent, repl in _ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(repl))
    return F.trim(F.regexp_replace(x, r"\s+", " "))


def html_link_count(col: Column | str) -> Column:
    """Number of ``<a ...>`` open tags — the link-density signal
    boilerplate classifiers (and Gopher's link-ratio rule) use."""
    x = _c(col)
    stripped = F.regexp_replace(x, r"(?i)<a[\s>]", "")
    return F.when(x.isNull(), F.lit(None).cast("long")).otherwise(
        ((F.length(x) - F.length(stripped)) / 3).cast("long")
    )
