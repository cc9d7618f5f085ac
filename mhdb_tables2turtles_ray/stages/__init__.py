from .emit import EmissionSpec, Literal, ForeignKey, TripleEmitter, emit_triples
from .dedup import dedup_triples
from .prefixes import used_prefixes
from .enumerate_groups import enumerate_in_groups
from .linker import EntityLinker, link_column
from .materialize import materialize_turtle, render_turtle_blocks, write_header
from .provenance import flag_sourced
from .reify import reify_triples, statement_bnode
from .salted import salted_group_count
from .seq import SeqEmitter, event_sequences, parse_response_options
from .twohop import two_hop_lookup
from .validate import validate_turtle_dir

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
    "flag_sourced",
    "reify_triples",
    "statement_bnode",
    "salted_group_count",
    "SeqEmitter",
    "event_sequences",
    "parse_response_options",
    "two_hop_lookup",
    "validate_turtle_dir",
]
