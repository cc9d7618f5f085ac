"""Vectorized (Arrow-kernel) fast paths for the hot scalar string
functions, bit-exact with the scalar ports by construction:

- values a kernel chain can handle exactly are processed vectorized;
- every value where Arrow semantics could diverge from CPython string
  semantics (non-ASCII — ``str.isalnum`` is Unicode-aware while the
  regex class is ASCII; the control chars ``\\x1c-\\x1f`` + ``\\x85``
  where ``str.isspace`` disagrees with Unicode White_Space trimming)
  routes to the scalar implementation.

Equivalence is enforced by ``tests/test_vectorized.py`` (hypothesis
fuzz: vectorized == scalar on arbitrary text).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .strings import check_iri, convert_string_to_label, language_string

# Characters whose Python str.isspace()/isalnum() behavior diverges from
# the ASCII regex classes / Arrow utf8 trimming used in the fast path.
_DIVERGENT = r"[\x1c-\x1f\x85]"


def _fallback_mask(arr: pa.Array) -> pa.Array:
    """True where the value must take the scalar path."""
    non_ascii = pc.invert(pc.string_is_ascii(arr))
    divergent = pc.match_substring_regex(arr, _DIVERGENT)
    return pc.or_kleene(non_ascii, divergent)


def _merge(fast: pa.Array, mask, values: list, scalar_fn) -> pa.Array:
    """Replace fast-path results with scalar results where mask is set."""
    mask_np = np.asarray(mask.to_pandas(), dtype=object)
    out = fast.to_pylist()
    for i, flagged in enumerate(mask_np):
        if flagged:
            out[i] = scalar_fn(values[i]) if values[i] is not None else None
    return pa.array(out, pa.string())


def delimited_label_vec(arr: pa.Array) -> pa.Array:
    """Vectorized ``convert_string_to_label(x, 'delimited')``.

    Kernel chain mirrors the scalar algorithm exactly for ASCII input:
    spaces→underscores, collapse runs, ``_-_``→``-``, collapse dashes,
    strip non-[alnum_-] (the final rstrip is a no-op post-filter).
    Empty labels raise in the scalar path; here empties simply produce
    empty strings — callers gate empties beforehand (the emitter does).
    """
    x = pc.replace_substring(arr, " ", "_")
    x = pc.replace_substring_regex(x, "_{2,}", "_")
    x = pc.replace_substring(x, "_-_", "-")
    x = pc.replace_substring_regex(x, "-{2,}", "-")
    x = pc.replace_substring_regex(x, "[^0-9A-Za-z_-]", "")
    mask = _fallback_mask(arr)
    if not pc.any(mask).as_py():
        return x
    return _merge(
        x, mask, arr.to_pylist(), lambda v: convert_string_to_label(v, "delimited")
    )


def _check_iri_or_none(v) -> str | None:
    """Scalar ``check_iri`` that maps strip-to-empty inputs to None.

    ``check_iri`` raises ValueError exactly when the value strips to
    empty (e.g. a whitespace-only cell made of non-ASCII whitespace like
    U+00A0, which is what routes such values here in the first place).
    The emitter's own empty-after-strip gate skips those rows — so the
    vectorized path must return a skippable None, not crash the batch.
    """
    try:
        return check_iri(v, "delimited")
    except ValueError:
        return None


def check_iri_delimited_vec(arr: pa.Array) -> pa.Array:
    """Vectorized ``check_iri(x, 'delimited')``.

    Fast path covers the dominant branch — no ``:`` in the (stripped)
    value → ``:`` + delimited label. Values containing ``:`` (CURIE /
    URL / trailing-colon branches) or needing unicode semantics route
    to the scalar function; values that strip to empty yield null.
    """
    stripped = pc.utf8_trim_whitespace(arr)
    has_colon = pc.match_substring(stripped, ":")
    fallback = pc.or_kleene(has_colon, _fallback_mask(arr))
    fast = pc.binary_join_element_wise(
        pa.array([":"] * len(arr), pa.string()), delimited_label_vec(stripped), ""
    )
    if not pc.any(fallback).as_py():
        return fast
    return _merge(fast, fallback, arr.to_pylist(), _check_iri_or_none)


def language_string_vec(arr: pa.Array, lang: str = "en") -> pa.Array:
    """Vectorized ``language_string``: newline fold, quote escape chain
    (``"`` → ``\\"`` → ``\\'``), trim, wrap ``\"\"\"...\"\"\"@lang``."""
    x = pc.replace_substring(arr, "\n", " ")
    x = pc.replace_substring(x, '"', "\\'")  # the two-step escape nets \'
    x = pc.utf8_trim_whitespace(x)
    n = len(arr)
    fast = pc.binary_join_element_wise(
        pa.array(['"""'] * n, pa.string()),
        x,
        pa.array([f'"""@{lang}'] * n, pa.string()),
        "",
    )
    mask = _fallback_mask(arr)
    if not pc.any(mask).as_py():
        return fast
    return _merge(fast, mask, arr.to_pylist(), lambda v: language_string(v, lang))
