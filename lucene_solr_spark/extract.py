"""HTML -> text extraction with HTMLStripCharFilter semantics.

Reference parity: lucene/analysis/common/src/java/org/apache/lucene/analysis/
charfilter/HTMLStripCharFilter.java (JFlex spec HTMLStripCharFilter.jflex):
strips tags/comments/CDATA, drops <script>/<style> content entirely, decodes
character entities, block tags become whitespace. Our engine additionally
normalizes runs of whitespace to a single space and trims — which is exactly
the fixture template's inverse, giving the per-row byte-identity invariant
``extract(html) == text`` of BASELINE.json `input_hint`.

Pure-Python over str/bytes so it serves both the oracle and the Arrow-batched
pandas UDF (regexes run in C; no Spark-level per-row Python).
"""

from __future__ import annotations

import html as _html
import re

_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_SCRIPT_STYLE_RE = re.compile(r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")


def html_strip(html) -> str:
    """Strip markup, drop script/style, decode entities, collapse whitespace."""
    s = html.decode("utf-8") if isinstance(html, (bytes, bytearray)) else html
    s = _COMMENT_RE.sub(" ", s)
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()
