"""RDF/XML parse + serialize (pure per-document functions, no Spark deps).

Spark adapters: ``sources.rdf_source`` (parse via mapInPandas) and
``sinks.rdfxml_sink`` (serialize via applyInPandas).
"""

from .ntriples import parse_ntriples, unescape  # noqa: F401
from .parser import RDFParser, get_text, parse_rdfxml  # noqa: F401
from .serializer import Triples2RdfXml, serialize_triples  # noqa: F401
