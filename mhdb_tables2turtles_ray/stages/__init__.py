from .emit import EmissionSpec, Literal, ForeignKey, TripleEmitter, emit_triples
from .dedup import dedup_triples
from .prefixes import used_prefixes
from .enumerate_groups import enumerate_in_groups
from .linker import EntityLinker, link_column
from .materialize import materialize_turtle, render_turtle_blocks, write_header

__all__ = [
    "EmissionSpec",
    "Literal",
    "ForeignKey",
    "TripleEmitter",
    "emit_triples",
    "dedup_triples",
    "used_prefixes",
    "enumerate_in_groups",
    "EntityLinker",
    "link_column",
    "materialize_turtle",
    "render_turtle_blocks",
    "write_header",
]
