"""Parser for the reference's committed golden Turtle artifact.

The golden file (``/root/reference/output/chills.ttl``) is
``write_header(...) + turtle_from_dict(statements)`` output
(reference ``mhdb/write_ttl.py:263-322,387-432``): PREFIX lines, then
statement blocks ``subj pred obj ; pred obj ... .``. Objects may be
``\"\"\"...\"\"\"@lang`` strings spanning lines (the ontology comment
contains blank lines, so a naive ``\\n\\n`` block split corrupts it),
``"..."^^xsd:*`` typed literals, ``<...>`` IRIs, or bare CURIEs. This
module tokenizes with quote awareness and yields the (s, p, o) set —
the ground truth for the golden-artifact gate (VERDICT r4 item 1).
"""

from __future__ import annotations

import re

_TOKEN = re.compile(
    r"""
    (?P<triple>\"\"\"(?:[^"]|"(?!""))*\"\"\"(?:@[A-Za-z-]+|\^\^\S+)?)
  | (?P<quoted>"(?:[^"\\]|\\.)*"(?:@[A-Za-z-]+|\^\^\S+)?)
  | (?P<iri><[^>]*>)
  | (?P<punct>[;.](?=\s|$))
  | (?P<word>\S+)
    """,
    re.VERBOSE | re.DOTALL,
)


def tokenize(text: str):
    """Quote-aware token stream: literals, IRIs, ';'/'.', bare words."""
    for m in _TOKEN.finditer(text):
        kind = m.lastgroup
        yield kind, m.group()


def parse_triples(text: str) -> set[tuple[str, str, str]]:
    """Parse the golden dialect into a set of (subj, pred, obj).

    Grammar: ``subject (pred obj+)(';' pred obj+)* '.'`` — tolerant of
    the header block's layout. PREFIX lines are dropped first (they are
    declarations, not triples).
    """
    body = "\n".join(
        line for line in text.split("\n") if not line.startswith("PREFIX")
    )
    triples: set[tuple[str, str, str]] = set()
    subject = None
    pred = None
    pending: list[str] = []

    def flush():
        for obj in pending:
            triples.add((subject, pred, obj))
        pending.clear()

    for kind, tok in tokenize(body):
        if kind == "punct":
            flush()
            if tok == ".":
                subject = None
                pred = None
            else:  # ';' — next token is a predicate for the same subject
                pred = None
            continue
        if subject is None:
            subject = tok
        elif pred is None:
            pred = tok
        else:
            pending.append(tok)
    flush()  # tolerate a missing final terminator
    return triples


def load_golden(path: str = "/root/reference/output/chills.ttl"):
    with open(path, encoding="utf-8") as f:
        return parse_triples(f.read())
