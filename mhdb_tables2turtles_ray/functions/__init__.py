from .strings import (
    LABEL_TRUNCATE,
    check_iri,
    clean_string,
    convert_string_to_label,
    create_label,
    language_string,
    typed_literal,
)

__all__ = [
    "LABEL_TRUNCATE",
    "check_iri",
    "clean_string",
    "convert_string_to_label",
    "create_label",
    "language_string",
    "typed_literal",
]
