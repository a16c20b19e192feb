"""KG-construction pipeline: transcripts -> mentions -> triples -> canonical graph."""
