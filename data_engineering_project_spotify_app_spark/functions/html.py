"""HTML/markup extraction — the stage a crawl pipeline runs BEFORE
every text operator in this package (tokenize/quality/dedup assume
visible text, not markup).

All pure built-in expressions (regexp_replace / replace chains) so
extraction runs inside WholeStageCodegen over 100 TB of raw crawl —
no parser library in the hot path. This is deliberately the
"trafilatura-lite" tier: tag removal, script/style/comment dropping,
entity decoding, whitespace normalization, and a markup-ratio signal
for filtering. Real boilerplate REMOVAL (nav/footer detection) needs
per-document DOM heuristics — that tier belongs in an Arrow-batched
mapInPandas with a proper parser, gated on the library being present
(the multimodal.py precedent).

Every helper has a DuckDB twin template (the *_SQL strings) so
queries over these expressions stay oracle-checkable. Regex subset is
chosen to behave identically under Java regex and RE2: character
classes, (?s) dotall, non-greedy — no backreferences, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# script/style blocks go first (their CONTENT must vanish, not just the
# tags), then comments, then remaining tags. (?s): dot spans newlines.
_BLOCK_RE = r"(?s)<(script|style)[^>]*>.*?</\1>"
# RE2 (DuckDB) has no backreferences — expand the alternation.
_BLOCK_RE_SQL = r"(?s)<script[^>]*>.*?</script>|(?s)<style[^>]*>.*?</style>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"<[^>]+>"

_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: else &amp;lt; would double-decode
]


def strip_markup(col: Column) -> Column:
    """Visible text from raw HTML: drop script/style content, comments,
    tags; decode the common entities; collapse whitespace runs."""
    out = F.regexp_replace(col, _BLOCK_RE, " ")
    out = F.regexp_replace(out, _COMMENT_RE, " ")
    out = F.regexp_replace(out, _TAG_RE, " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def strip_markup_sql(col: str) -> str:
    """DuckDB twin of strip_markup (regexp_replace with 'g', RE2)."""
    out = f"regexp_replace({col}, '{_BLOCK_RE_SQL}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_COMMENT_RE}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_TAG_RE}', ' ', 'g')"
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{rep_sql}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


def markup_ratio(raw: Column, text: Column) -> Column:
    """Share of raw characters that were markup/boilerplate syntax —
    the crawl-quality dial (near 1.0 = a page of tag soup with no
    prose; C4/CCNet-style pipelines drop those before tokenizing)."""
    n = F.length(raw)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round((n - F.length(text)) / n, 4)
    )


def markup_ratio_sql(raw: str, text: str) -> str:
    return (
        f"CASE WHEN length({raw}) = 0 THEN 0.0 "
        f"ELSE round((length({raw}) - length({text})) * 1.0 "
        f"/ length({raw}), 4) END"
    )


# ---------------------------------------------------------------------------
# DOM-aware tier: stdlib html.parser inside Arrow-batched mapInPandas —
# the escape hatch for semantics the regex tier can't express
# (boilerplate containers, link density). No external dependency:
# html.parser ships with CPython.

_BOILERPLATE_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "script", "style", "noscript"}
)

DOM_EXTRACT_SCHEMA = (
    "doc_id bigint, main_text string, n_links bigint, link_density double"
)


def _dom_extract_one(raw: str) -> tuple[str, int, float]:
    """Visible main text (boilerplate containers dropped), link count,
    and link density (share of visible chars inside <a>)."""
    from html.parser import HTMLParser

    class _P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.chunks: list[str] = []
            self.link_chars = 0
            self.n_links = 0
            self.boiler_depth = 0
            self.a_depth = 0

        def handle_starttag(self, tag, attrs):
            if tag in _BOILERPLATE_TAGS:
                self.boiler_depth += 1
            elif tag == "a":
                self.a_depth += 1
                if self.boiler_depth == 0:
                    self.n_links += 1

        def handle_endtag(self, tag):
            if tag in _BOILERPLATE_TAGS and self.boiler_depth:
                self.boiler_depth -= 1
            elif tag == "a" and self.a_depth:
                self.a_depth -= 1

        def handle_data(self, data):
            if self.boiler_depth:
                return
            self.chunks.append(data)
            if self.a_depth:
                self.link_chars += len(data.strip())

    p = _P()
    p.feed(raw or "")
    p.close()
    text = " ".join(" ".join(p.chunks).split())
    n = len(text)
    density = round(p.link_chars / n, 4) if n else 0.0
    return text, p.n_links, density


def dom_extract(docs):
    """mapInPandas DOM extraction over a (doc_id, text) frame →
    (doc_id, main_text, n_links, link_density). Boilerplate containers
    (nav/header/footer/aside + script/style) are dropped subtree-wide;
    link density is the classic boilerplate-detection feature
    (Kohlschütter et al., boilerpipe) a keep/drop rule thresholds on.

    Scale: Arrow batches into pandas, one Python parse per document —
    the sanctioned slow path for real parsing (multimodal.py
    precedent); everything downstream stays codegen. Not registered as
    a driver query: DuckDB cannot parse HTML, and on the plain-text
    fixture it degenerates to q_html_extract — semantics are pinned on
    literal HTML frames in tests/test_html.py instead.
    """
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = [
                (did, *_dom_extract_one(txt))
                for did, txt in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "main_text", "n_links", "link_density"],
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, schema=DOM_EXTRACT_SCHEMA
    )
