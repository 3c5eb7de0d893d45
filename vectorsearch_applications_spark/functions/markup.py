"""HTML/markup stripping for training-corpus curation.

Web-crawl text arrives wrapped in markup; every public curation recipe
(C4, RefinedWeb, Dolma) strips tags before quality scoring. Like the PII
scrubber (functions/scrub.py) this is a pure projection — chained
``regexp_replace``/``replace`` expressions inside whole-stage codegen,
zero shuffle, zero Python, scan-speed at 100 TB.

Patterns stay in the RE2 ∩ java.util.regex common dialect; block rules
use the inline ``(?s)`` flag (both dialects) instead of an engine-specific
DOTALL option. Order is load-bearing and documented:

  1. script/style blocks and comments go first (their CONTENT must die,
     not just their tags);
  2. remaining tags are replaced by a space (word-boundary preservation:
     ``a<br>b`` → ``a b``, not ``ab``);
  3. entities decode AFTER tag removal so escaped markup (``&lt;b&gt;``)
     decodes to literal text instead of becoming a strippable tag;
  4. whitespace collapses last.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BLOCK_PATTERNS: list[str] = [
    r"(?s)<script[^>]*>.*?</script>",
    r"(?s)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
]
TAG_PATTERN = r"</?[A-Za-z][^>]*>"
ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last: &amp;lt; must yield &lt;, not <
]


def strip_markup(col: Column) -> Column:
    """Markup → clean text, in the documented order."""
    out = col
    for p in BLOCK_PATTERNS:
        out = F.regexp_replace(out, p, " ")
    out = F.regexp_replace(out, TAG_PATTERN, " ")
    for ent, ch in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def strip_markup_sql(expr: str) -> str:
    """DuckDB-side equivalent of strip_markup over a SQL expression."""
    out = expr
    for p in BLOCK_PATTERNS:
        out = f"regexp_replace({out}, '{p}', ' ', 'g')"
    out = f"regexp_replace({out}, '{TAG_PATTERN}', ' ', 'g')"
    for ent, ch in ENTITIES:
        ch_sql = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{ch_sql}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


__all__ = ["BLOCK_PATTERNS", "TAG_PATTERN", "ENTITIES", "strip_markup", "strip_markup_sql"]
