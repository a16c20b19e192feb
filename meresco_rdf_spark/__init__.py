"""meresco_rdf_spark — a PySpark-native knowledge-graph construction engine.

From-scratch reimplementation of the capabilities of seecr/meresco-rdf
(reference at /root/reference; Python 2, in-memory, single-node) as a
distributed, DataFrame-first Spark engine:

- ``model``        triple schema + Uri/BNode/Literal node semantics
- ``namespaces``   CURIE <-> URI table (replaces external meresco.xml dep)
- ``graph``        local in-memory Graph with reference-exact semantics
                   (test/fixture anchor; NOT the scale path)
- ``rdfxml``       RDF/XML parser + deterministic serializer (pure per-doc
                   functions; Spark adapters in sources/sinks)
- ``operators``    Graph semantics as DataFrame operators (masked scan,
                   projection, label resolution, BGP self-joins, set ops)
- ``sources``      ingest: RDF/XML files/dirs -> triples DF, transcript
                   synthesis, SPARQL-JSON binding decode
- ``sinks``        egress: subject-sharded RDF/XML, triple/adjacency tables
- ``kg``           the scale pipeline: transcripts -> mentions -> triples ->
                   entity canonicalization -> materialized KG
- ``functions``    training-data ops: dedup (exact/minhash/simhash/jaccard/
                   embedding), ANN similarity, text analysis, multimodal
- ``streaming``    Structured Streaming incremental triple extraction
"""

__version__ = "0.1.0"
