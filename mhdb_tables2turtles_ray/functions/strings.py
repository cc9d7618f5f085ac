"""Scalar string / literal / IRI-minting primitives.

Bit-exact reimplementations of the reference engine's string semantics
(reference: ``mhdb/write_ttl.py:24-260`` — ``return_string``,
``language_string``, ``convert_string_to_label``, ``check_iri``,
``create_label``; truncation constant ``mhdb/ingest.py:25``).

These are the canonicalization primitives the whole KG depends on: the
triple-set precision/recall metric is won or lost in the exact casing,
filtering and escaping rules here, so the algorithms match the
reference observably (conformance-tested against the reference module
in ``tests/test_strings_conformance.py``), while the implementation is
our own (caching, vectorized column appliers for Arrow batches).

Everything in this module is a pure function of its arguments — safe
to ship into Ray tasks / actors via closure capture.
"""

from __future__ import annotations

from functools import lru_cache

# Subject labels minted from long free-text fields are truncated to this
# many characters BEFORE label conversion (reference mhdb/ingest.py:25
# ``limit_label = 50`` and usage :3336-3338). IRI identity depends on it.
LABEL_TRUNCATE = 50

_PASCAL = "PascalCase"
_CAMEL = "camelCase"
_DELIMITED = "delimited"
_KEEP_CHARS = frozenset("-_")


def clean_string(value, replace=(), replace_with=()) -> str:
    """Strip + escape a raw cell value into a Turtle-safe fragment.

    Semantics of reference ``return_string`` (mhdb/write_ttl.py:61-101):
    falsy input → ``""``; else ``str()`` it, fold newlines to spaces,
    escape ``"`` as ``\\"``, strip outer whitespace, then apply the
    optional pairwise substitutions (which run AFTER the escaping, so a
    ``'"' -> "'"`` pair rewrites the just-escaped ``\\"`` into ``\\'`` —
    quirk preserved on purpose).
    """
    if not value:
        return ""
    text = value if isinstance(value, str) else str(value)
    text = text.replace("\n", " ").replace('"', '\\"').strip()
    if replace:
        if len(replace) != len(replace_with):
            raise ValueError("replace and replace_with must be the same length")
        for old, new in zip(replace, replace_with):
            text = text.replace(old, new)
    return text


def language_string(value, lang: str = "en") -> str:
    """Language-tagged Turtle literal: ``\"\"\"text\"\"\"@lang``.

    Reference ``language_string`` (mhdb/write_ttl.py:24-58): double
    quotes inside the text end up as ``\\'`` via the clean_string
    substitution chain.
    """
    return '"""{}"""@{}'.format(clean_string(value, ('"',), ("'",)), lang)


def _to_pascal(text: str) -> str:
    # str.title() then drop whitespace — digit-led tokens come out like
    # ``8waJ7W3QcJc`` → ``8Waj7W3Qcjc`` (title() lowercases mid-token
    # uppercase); observed in the reference golden output.
    return "".join(ch for ch in text.title() if not ch.isspace())


def _to_camel(text: str) -> str:
    parts = text.split(" ")
    return parts[0].lower() + "".join(p.title() for p in parts[1:] if not p.isspace())


def _to_delimited(text: str) -> str:
    while " " in text:
        text = text.replace(" ", "_")
    while "__" in text:
        text = text.replace("__", "_")
    text = text.replace("_-_", "-")
    while "--" in text:
        text = text.replace("--", "-")
    return text


@lru_cache(maxsize=65536)
def convert_string_to_label(value: str, label_type: str = _DELIMITED) -> str:
    """Normalize a string into an IRI-safe label.

    Reference ``convert_string_to_label`` (mhdb/write_ttl.py:140-216):
    apply the requested casing, keep only alphanumerics plus ``-``/``_``,
    and right-strip. An unknown ``label_type`` leaves the string as-is
    apart from the character filter (the reference evaluates — but does
    not raise — an Exception in that branch; we preserve the fall-through
    behavior deliberately).
    """
    if not value:
        raise ValueError(f"{value!r} is not a labelable string")
    if label_type == _PASCAL:
        cased = _to_pascal(value)
    elif label_type == _CAMEL:
        cased = _to_camel(value)
    elif label_type == _DELIMITED:
        cased = _to_delimited(value)
    else:
        cased = value
    return "".join(
        ch for ch in str(cased) if ch.isalnum() or ch in _KEEP_CHARS
    ).rstrip()


@lru_cache(maxsize=65536)
def check_iri(value, label_type: str = _DELIMITED) -> str:
    """Mint an IRI / CURIE / label from an arbitrary cell value.

    Reference ``check_iri`` (mhdb/write_ttl.py:219-260), branch order
    preserved exactly:

    1. ``str()`` + strip.
    2. Contains ``:`` and no whitespace at all:
       a. trailing ``:`` → recurse without it;
       b. looks like a URL (``:/``) and is not already ``<...>``-wrapped
          → ``<label>`` where the URL is run through the label
          converter *inside* the brackets (a destructive reference
          quirk — live emitters route real URLs through typed
          ``xsd:anyURI`` literals instead; so do ours);
       c. otherwise pass through unchanged (CURIE like ``ICD9CM:x``).
    3. Anything else → ``:`` + converted label.
    """
    text = str(value).strip()
    if ":" in text and not any(ch.isspace() for ch in text):
        if text.endswith(":"):
            return check_iri(text[:-1], label_type)
        if ":/" in text and not text.startswith("<") and not text.endswith(">"):
            return "<{}>".format(convert_string_to_label(text, label_type))
        return text
    return ":" + convert_string_to_label(text, label_type)


def create_label(value) -> tuple[str, str]:
    """Return ``(display_string, label_string)`` for a cell value.

    Reference ``create_label`` (mhdb/write_ttl.py:104-137): strips and
    removes quotes/newlines for the display string, then derives the
    delimited label. Raises on non-string / empty input like the
    reference does.
    """
    if not value:
        raise ValueError("create_label: empty input")
    if not isinstance(value, str):
        raise TypeError("create_label: input is not a string")
    display = clean_string(value, ('"', "\n"), ("", ""))
    if not display:
        return "", ""
    return display, convert_string_to_label(display)


# --- typed RDF literals -------------------------------------------------
# The reference formats these inline per column (e.g. xsd:anyURI at
# mhdb/ingest.py:3441, xsd:gyear :3446, xsd:nonNegativeInteger :1027,
# xsd:decimal :2050, xsd:int :3431, xsd:string :3543).

def typed_literal(value, xsd_type: str) -> str:
    """``"value"^^xsd:type`` literal."""
    return '"{}"^^{}'.format(value, xsd_type)


def anyuri_literal(url: str) -> str:
    return typed_literal(url, "xsd:anyURI")


def gyear_literal(year) -> str:
    return typed_literal(int(year), "xsd:gyear")


def int_literal(value) -> str:
    return typed_literal(int(value), "xsd:int")


def nonneg_literal(value) -> str:
    return typed_literal(int(value), "xsd:nonNegativeInteger")


def decimal_literal(value) -> str:
    return typed_literal(value, "xsd:decimal")


def string_literal(value) -> str:
    return typed_literal(value, "xsd:string")
