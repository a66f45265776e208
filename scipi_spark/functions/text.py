"""Scalar string-validation functions (P3/P4).

Reference semantics (``ScipiStream.java:218-257``):

- ``validateStr``: null→null; strip every char outside ``[a-zA-Z0-9\\s]``;
  trim; empty→null; lowercase.
- ``validateTopics``: per-element validateStr; drop null/empty or >30-char
  results; dedup.

Implemented as pure Column expressions — they stay inside whole-stage
codegen (no Python round-trip), so the 100 TB ingest path is JVM-only.
``*_py`` twins are the executable spec used by property tests; both sides
pin ``\\s`` to the Java-regex ASCII class ``[ \\t\\n\\x0b\\f\\r]`` so the
JVM and Python agree on unicode inputs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_WS = " \t\n\x0b\f\r"  # Java regex \s (ASCII-only)
_STRIP_RE = r"[^a-zA-Z0-9\s]"
_TRIM_RE = r"^\s+|\s+$"
MAX_TOPIC_LEN = 30


def validate_str(col: Column | str) -> Column:
    """P3: clean a scalar string; returns NULL for null/empty-after-clean.

    One regex (the character-class strip), then ``btrim`` with the Java
    ``\\s`` ASCII set — byte-equivalent to the ``^\\s+|\\s+$`` regex trim
    but codegen'd and regex-free, which matters because this expression
    runs ~45x per record on the ingest path (6 scalar fields + 3 arrays;
    measured ~25% off p1_p5 validation wall at sf0.1)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.lower(F.btrim(F.regexp_replace(c, _STRIP_RE, ""), F.lit(_WS)))
    return F.nullif(cleaned, F.lit(""))


def validate_topics(col: Column | str, max_len: int = MAX_TOPIC_LEN) -> Column:
    """P4: clean every element, drop null/empty/too-long, dedup.

    NULL input stays NULL (reference treats a missing set as missing, not
    empty)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.transform(c, lambda x: validate_str(x))
    kept = F.filter(cleaned, lambda x: x.isNotNull() & (F.length(x) <= max_len))
    return F.array_distinct(kept)


def clean_authors(col: Column | str) -> Column:
    """Author-set cleaning (``ScipiStream.java:573-597``): per-element
    validateStr, drop nulls, dedup — unlike topics there is NO length cap."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.transform(c, lambda x: validate_str(x))
    return F.array_distinct(F.filter(cleaned, lambda x: x.isNotNull()))


# ---------------------------------------------------------------------------
# Pure-Python executable spec (property-test oracle)
# ---------------------------------------------------------------------------

def validate_str_py(s: str | None) -> str | None:
    if s is None:
        return None
    cleaned = re.sub(rf"[^a-zA-Z0-9{_WS}]", "", s)
    cleaned = cleaned.strip(_WS).lower()
    return cleaned or None


def validate_topics_py(items: list[str] | None, max_len: int = MAX_TOPIC_LEN):
    if items is None:
        return None
    out: list[str] = []
    for s in items:
        c = validate_str_py(s)
        if c is not None and len(c) <= max_len and c not in out:
            out.append(c)
    return out


# ---------------------------------------------------------------------------
# UDTF registration surface (SURVEY §2.7: absent in the reference —
# its "UDFs" are hardcoded map/flatMap/reduce classes; a full engine
# exposes user-registered table functions callable from SQL)
# ---------------------------------------------------------------------------

def register_word_lens_udtf(spark) -> None:
    """Register the ``word_lens(text)`` Python UDTF: one output row per
    whitespace token — (pos, wlen). Arrow-optimized (``useArrow=True``:
    the plan node is ArrowEvalPythonUDTF — batched Arrow transfer, never
    the row-pickling BatchEvalPython path the plan audit forbids).
    Callable from SQL via LATERAL:

        SELECT d.doc_id, s.pos, s.wlen
        FROM documents d, LATERAL word_lens(d.text) s

    Idempotent: re-registration replaces the previous definition."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, wlen int", useArrow=True)
    class WordLens:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield i, len(w)

    spark.udtf.register("word_lens", WordLens)
