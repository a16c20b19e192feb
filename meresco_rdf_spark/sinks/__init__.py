from .jsonld_sink import jsonld_lines, write_jsonld  # noqa: F401
from .nquads_sink import nquads_lines, write_nquads  # noqa: F401
from .trig_sink import trig_lines, write_trig  # noqa: F401
from .nt_sink import ntriples_lines, write_ntriples  # noqa: F401
from .turtle_sink import turtle_lines, write_turtle  # noqa: F401
from .rdfxml_sink import serialize_shards, write_rdfxml_shards  # noqa: F401
