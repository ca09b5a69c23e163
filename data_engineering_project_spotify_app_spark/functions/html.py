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
