from .rdfxml_sink import serialize_shards, write_rdfxml_shards  # noqa: F401
