"""Deterministic html→text extraction as native Spark expressions (T27).

The graft input_hint requires byte-identical extracted text per url.  The
algorithm is defined once (see ``datagen.extract_text_py`` for the pure-
Python reference implementation) and re-expressed here with JVM-side
``regexp_replace``/``split``/``transform`` so extraction runs inside
WholeStageCodegen with no Python worker in the loop.  Byte-identity between
the two implementations is asserted in tests/test_pipeline_e2e.py::test_extract_text_byte_identity over the
synthetic pages corpus.

Order matters and is part of the contract:
  1. drop <script>/<style> subtrees
  2. block-level close tags (+<br>) → newline
  3. strip all remaining tags
  4. unescape the 5 XML entities (&amp; first — double-escapes stay escaped)
  5. collapse runs of spaces/tabs
  6. per-line trim, drop empty lines, join with '\n'
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ENTITIES = [
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
]


def extract_text(html_bin: Column) -> Column:
    """binary html → extracted text (byte-identical to extract_text_py)."""
    x = F.decode(html_bin, "UTF-8")
    x = F.regexp_replace(x, r"(?is)<(script|style)\b.*?</\1>", "")
    x = F.regexp_replace(x, r"(?i)<(?:/p|/div|/li|/h[1-6]|/title|br ?/?)>", "\n")
    x = F.regexp_replace(x, r"(?s)<[^>]*>", "")
    for ent, ch in _ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(ch))
    x = F.regexp_replace(x, r"[ \t]+", " ")
    lines = F.split(x, "\n")
    lines = F.transform(lines, lambda s: F.regexp_replace(s, r"^\s+|\s+$", ""))
    lines = F.filter(lines, lambda s: F.length(s) > 0)
    return F.array_join(lines, "\n")


def first_address_line(text: Column) -> Column:
    """Pull the address-bearing line out of an extracted page: in the
    synthetic corpus the listing layout puts address on line 2, locality on
    line 3 and postcode on line 4 (datagen._TEMPLATE)."""
    lines = F.split(text, "\n")
    return F.element_at(lines, 3)


def page_postcode(text: Column) -> Column:
    lines = F.split(text, "\n")
    return F.element_at(lines, 5)


def page_town(text: Column) -> Column:
    lines = F.split(text, "\n")
    return F.regexp_replace(F.element_at(lines, 4), r" & surroundings$", "")
