from .rdf_source import read_rdfxml_documents, read_rdfxml_triples  # noqa: F401
from .sparql_json import decode_bindings  # noqa: F401
from .transcripts import TRANSCRIPT_SCHEMA, synthesize_transcripts  # noqa: F401
