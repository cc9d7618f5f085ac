from .tables import read_table, load_lookup
from .corpus import corpus_from_documents, synthesize_corpus
from .vocab import language_vocab, build_vocab_bundle

__all__ = [
    "read_table",
    "load_lookup",
    "corpus_from_documents",
    "synthesize_corpus",
    "language_vocab",
    "build_vocab_bundle",
]
