"""HTML → text extraction (functions/html.py)."""

import pyspark.sql.functions as F

from syzgydb_spark.functions.html import html_link_count, html_title, strip_html


def _one(spark, html, expr):
    df = spark.createDataFrame([(html,)], ["h"])
    return df.select(expr("h").alias("v")).collect()[0]["v"]


def test_strip_html_basic(spark):
    h = "<html><body><p>Hello <b>world</b></p><p>second</p></body></html>"
    assert _one(spark, h, strip_html) == "Hello world\nsecond"


def test_strip_html_script_style_comment(spark):
    h = (
        "<head><style>p {color: red}</style></head>"
        "<script type='x'>if (a < b) { alert('<p>') }</script>"
        "keep<!-- a <b> comment -->ing"
    )
    assert _one(spark, h, strip_html) == "keep ing"


def test_strip_html_case_insensitive_blocks(spark):
    h = "<SCRIPT>x</SCRIPT><P>a</P><DIV>b</DIV>"
    assert _one(spark, h, strip_html) == "a\nb"


def test_strip_html_br_and_entities(spark):
    h = "a&nbsp;&lt;tag&gt;<br/>b &quot;q&quot; &#39;s&#39; &amp;amp;"
    # &amp; resolves one level only (single-pass contract)
    assert _one(spark, h, strip_html) == 'a <tag>\nb "q" \'s\' &amp;'


def test_strip_html_whitespace_collapse(spark):
    h = "<p>a   b\t c</p>\n\n<p>  d  </p>"
    assert _one(spark, h, strip_html) == "a b c\nd"


def test_strip_html_null(spark):
    df = spark.createDataFrame([(None,)], "h string")
    assert df.select(strip_html("h")).collect()[0][0] is None


def test_html_title(spark):
    h = "<html><head><TITLE> A &amp; B\n  C </TITLE></head><title>x</title>"
    assert _one(spark, h, html_title) == "A & B C"
    assert _one(spark, "<p>no title</p>", html_title) == ""


def test_html_link_count(spark):
    h = '<a href="/x">x</a><A HREF="/y">y</A><a>z</a><abbr>not a link</abbr>'
    assert _one(spark, h, html_link_count) == 3
    assert _one(spark, "plain", html_link_count) == 0


def test_strip_html_is_codegen(spark):
    """The whole extraction must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython nodes in the plan."""
    df = spark.createDataFrame([("<p>x</p>",)], ["h"]).select(
        strip_html("h"), html_title("h"), html_link_count("h")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
