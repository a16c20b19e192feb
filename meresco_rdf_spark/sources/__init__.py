from .rdf_source import (  # noqa: F401
    read_nquads_quads,
    read_ntriples_triples,
    read_rdf_directory,
    read_rdfxml_documents,
    read_rdfxml_triples,
    read_trig_quads,
)
from .sparql_json import decode_bindings  # noqa: F401
from .transcripts import TRANSCRIPT_SCHEMA, synthesize_transcripts  # noqa: F401
