from .kg import corpus_specs, kg_build, kg_triples, tbox_triples

__all__ = ["corpus_specs", "kg_build", "kg_triples", "tbox_triples"]
