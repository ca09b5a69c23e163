"""Markup extraction: the HTML behavior the plain-text fixture can't
exercise, pinned on literal frames — and cross-engine (the same
DuckDB twin the q_html_extract oracle uses)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.functions.html import (
    markup_ratio,
    strip_markup,
    strip_markup_sql,
)

CASES = [
    # raw, expected visible text
    ("<p>Hello <b>world</b></p>", "Hello world"),
    (
        "<html><head><style>p {color: red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body>Real content</body></html>",
        "Real content",
    ),
    ("<!-- hidden\ncomment -->visible", "visible"),
    ("Tom &amp; Jerry &lt;3 &quot;cheese&quot;&#39;s", "Tom & Jerry <3 \"cheese\"'s"),
    ("no markup at all", "no markup at all"),
    ("<div>\n  spread\n  over\n  lines\n</div>", "spread over lines"),
    ("<script>\nmultiline\n</script>after", "after"),
    ("a &nbsp; b", "a b"),
    ("", ""),
]


def test_strip_markup_literal_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i int, text string"
    )
    got = {
        r["i"]: r["clean"]
        for r in df.select(
            "i", strip_markup(F.col("text")).alias("clean")
        ).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, got[i], want)


def test_strip_markup_sql_twin_matches_spark(spark):
    """The DuckDB twin must produce byte-identical visible text —
    that equality is what makes q_html_extract oracle-checkable."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(CASES)))
        + ") v(i, text)",
        [raw for raw, _ in CASES],
    )
    duck = {
        i: clean
        for i, clean in con.execute(
            f"SELECT i, {strip_markup_sql('text')} FROM t"
        ).fetchall()
    }
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i int, text string"
    )
    sp = {
        r["i"]: r["clean"]
        for r in df.select(
            "i", strip_markup(F.col("text")).alias("clean")
        ).collect()
    }
    assert duck == sp


def test_markup_ratio_bounds(spark):
    df = spark.createDataFrame(
        [(0, "<b><i><u>x</u></i></b>"), (1, "plain"), (2, "")],
        "i int, text string",
    )
    out = {
        r["i"]: r["ratio"]
        for r in df.select(
            "i",
            markup_ratio(
                F.col("text"), strip_markup(F.col("text"))
            ).alias("ratio"),
        ).collect()
    }
    assert out[0] > 0.9  # tag soup
    assert out[1] == 0.0  # untouched prose
    assert out[2] == 0.0  # empty guard, no div-by-zero


def test_dom_extract_drops_boilerplate_and_counts_links(spark):
    from data_engineering_project_spotify_app_spark.functions.html import (
        dom_extract,
    )

    raw = (
        "<html><body>"
        "<nav>Home | About | <a href='/x'>Contact</a></nav>"
        "<header><h1>Site</h1></header>"
        "<main>Article text with <a href='/y'>one link</a> inside.</main>"
        "<footer>(c) 2026</footer>"
        "</body></html>"
    )
    df = spark.createDataFrame(
        [(0, raw), (1, "plain prose, no tags")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in dom_extract(df).collect()}
    # nav/header/footer subtrees dropped entirely
    assert got[0]["main_text"] == "Article text with one link inside."
    # nav link excluded; only the in-content link counts
    assert got[0]["n_links"] == 1
    assert 0.0 < got[0]["link_density"] < 0.5
    assert got[1]["main_text"] == "plain prose, no tags"
    assert got[1]["n_links"] == 0 and got[1]["link_density"] == 0.0
