"""HTML → text extraction, byte-identical per url (SURVEY.md §2.B B3).

Contract [BASELINE.json:15]: the per-row invariant vs the reference is
byte-identical extracted text per url. The extractor is therefore one pinned
pure function (`extract_text`) shared by BOTH the corpus generator (synth.py
renders html such that extract(html) == text) and the pipeline — making the
invariant testable without the (empty) reference mount: SURVEY.md §7 risk 2.

Pinned rules, in order:
  1. decode utf-8 (strict — corpus is generated utf-8)
  2. take the content of <body>…</body> (first match, case-insensitive)
  3. drop <script>/<style> elements with their content
  4. strip every remaining tag
  5. unescape exactly these entities, in this order:
     &lt; &gt; &quot; &#39; and finally &amp;

Runs as an Arrow-batched pandas transformation (Series in → Series out),
never per-row Python inside Spark.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_BODY_RE = re.compile(r"<body[^>]*>(.*?)</body>", re.IGNORECASE | re.DOTALL)
_SCRIPT_RE = re.compile(r"<(script|style)[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")

_UNESCAPES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def escape_text(text: str) -> str:
    """The generator-side inverse of the unescape step."""
    out = text.replace("&", "&amp;")
    out = out.replace("<", "&lt;").replace(">", "&gt;")
    out = out.replace('"', "&quot;").replace("'", "&#39;")
    return out


def render_page(text: str, title: str = "") -> bytes:
    """Pinned page template. extract_text(render_page(t)) == t for any t."""
    body = escape_text(text)
    html = (
        "<!DOCTYPE html><html><head><title>"
        + escape_text(title)
        + '</title><style>p{margin:0}</style><script>var x=1;</script></head>'
        + "<body>"
        + body
        + "</body></html>"
    )
    return html.encode("utf-8")


def _extract_series(html: pd.Series) -> pd.Series:
    s = html.map(lambda b: b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else (b or ""))
    body = s.str.extract(_BODY_RE, expand=False).fillna("")
    body = body.str.replace(_SCRIPT_RE, "", regex=True)
    body = body.str.replace(_TAG_RE, "", regex=True)
    for ent, ch in _UNESCAPES:
        body = body.str.replace(ent, ch, regex=False)
    return body


def extract_text(html: bytes | str) -> str:
    """Scalar reference implementation (used by the generator and tests)."""
    return _extract_series(pd.Series([html])).iloc[0]


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return _extract_series(html)


def extract_text_col(html_col: Column | str) -> Column:
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    return extract_text_udf(c)
