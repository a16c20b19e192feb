"""OWL-lite entailment materialization (operators/owl.py):
inverseOf / SymmetricProperty / TransitiveProperty closure semantics,
orbit pre-composition, the quadratic-pattern guard, and parity with a
pure-Python fixpoint reference."""

import pytest

from meresco_rdf_spark.operators.owl import (
    OWL_EQUIV_CLASS,
    OWL_EQUIV_PROPERTY,
    OWL_FUNCTIONAL,
    OWL_INV_FUNCTIONAL,
    OWL_INVERSE_OF,
    OWL_SYMMETRIC,
    OWL_TRANSITIVE,
    RDF_TYPE,
    OwlUnsupportedPattern,
    _orbits,
    owl_closure,
    owl_key_links,
)

U = "uri"


def df(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj_value string, "
        "obj_kind string, obj_lang string")


def rowset(frame):
    return {tuple(r) for r in frame.collect()}


def axiom_inv(p, q):
    return (p, OWL_INVERSE_OF, q, U, None)


def axiom_type(p, cls):
    return (p, RDF_TYPE, cls, U, None)


# --------------------------------------------------------------------------
# pure-Python fixpoint reference (naive chase to convergence)
# --------------------------------------------------------------------------

def naive_owl_fixpoint(instance, axioms):
    inv = set()
    sym, trans = set(), set()
    for s, p, o, k, l in axioms:
        if p == OWL_INVERSE_OF:
            inv.add((s, o))
            inv.add((o, s))
        elif p == RDF_TYPE and o == OWL_SYMMETRIC:
            sym.add(s)
        elif p == RDF_TYPE and o == OWL_TRANSITIVE:
            trans.add(s)
    closure = set(instance)
    while True:
        new = set()
        for s, p, o, k, l in closure:
            for a, b in inv:
                if p == a and k != "literal":
                    kind = "bnode" if s.startswith("_:") else "uri"
                    new.add((o, b, s, kind, None))
            if p in sym and k != "literal":
                kind = "bnode" if s.startswith("_:") else "uri"
                new.add((o, p, s, kind, None))
        for s, p, o, k, l in list(closure | new):
            if p in trans and k != "literal":
                for s2, p2, o2, k2, l2 in list(closure | new):
                    if p2 == p and s2 == o and k2 != "literal":
                        new.add((s, p, o2, k2, None))
        if new <= closure:
            return closure
        closure |= new


# --------------------------------------------------------------------------
# orbit pre-composition
# --------------------------------------------------------------------------

def test_orbit_inverse_pair():
    o = _orbits([("ex:within", "ex:contains")], [])
    assert o["ex:within"] == [("ex:contains", True), ("ex:within", False)]
    assert o["ex:contains"] == [("ex:contains", False), ("ex:within", True)]


def test_orbit_symmetric_self():
    o = _orbits([], ["ex:adj"])
    assert o["ex:adj"] == [("ex:adj", False), ("ex:adj", True)]


def test_orbit_inverse_of_symmetric_chains():
    # p inv q, q symmetric: one (s p o) entails all four forms
    o = _orbits([("ex:p", "ex:q")], ["ex:q"])
    assert o["ex:p"] == [("ex:p", False), ("ex:p", True),
                         ("ex:q", False), ("ex:q", True)]


# --------------------------------------------------------------------------
# rule semantics
# --------------------------------------------------------------------------

def test_inverse_of_emits_swapped(spark):
    inst = [("urn:a", "ex:within", "urn:b", U, None)]
    out = rowset(owl_closure(
        df(spark, inst),
        schema_triples=df(spark, [axiom_inv("ex:within", "ex:contains")])))
    assert ("urn:b", "ex:contains", "urn:a", U, None) in out
    assert ("urn:a", "ex:within", "urn:b", U, None) in out


def test_inverse_works_both_directions(spark):
    inst = [("urn:a", "ex:contains", "urn:b", U, None)]
    out = rowset(owl_closure(
        df(spark, inst),
        schema_triples=df(spark, [axiom_inv("ex:within", "ex:contains")])))
    assert ("urn:b", "ex:within", "urn:a", U, None) in out


def test_symmetric_emits_both_orientations(spark):
    inst = [("urn:a", "ex:adj", "urn:b", U, None)]
    out = rowset(owl_closure(
        df(spark, inst),
        schema_triples=df(spark, [axiom_type("ex:adj", OWL_SYMMETRIC)])))
    assert ("urn:b", "ex:adj", "urn:a", U, None) in out


def test_literal_objects_never_swap(spark):
    inst = [("urn:a", "ex:adj", "five", "literal", None),
            ("urn:a", "ex:within", "label", "literal", "en")]
    out = rowset(owl_closure(
        df(spark, inst),
        schema_triples=df(spark, [
            axiom_type("ex:adj", OWL_SYMMETRIC),
            axiom_inv("ex:within", "ex:contains")])))
    subjects = {r[0] for r in out}
    assert "five" not in subjects and "label" not in subjects
    # the forward rows survive untouched
    assert ("urn:a", "ex:adj", "five", "literal", None) in out


def test_bnode_subject_swaps_with_bnode_kind(spark):
    inst = [("_:b0", "ex:within", "urn:b", U, None)]
    out = rowset(owl_closure(
        df(spark, inst),
        schema_triples=df(spark, [axiom_inv("ex:within", "ex:contains")])))
    assert ("urn:b", "ex:contains", "_:b0", "bnode", None) in out


def test_transitive_chain_closes(spark):
    inst = [("urn:1", "ex:part", "urn:2", U, None),
            ("urn:2", "ex:part", "urn:3", U, None),
            ("urn:3", "ex:part", "urn:4", U, None)]
    out = rowset(owl_closure(
        df(spark, inst),
        schema_triples=df(spark, [axiom_type("ex:part", OWL_TRANSITIVE)])))
    assert ("urn:1", "ex:part", "urn:4", U, None) in out
    assert ("urn:1", "ex:part", "urn:3", U, None) in out
    assert ("urn:2", "ex:part", "urn:4", U, None) in out


def test_transitive_inverse_also_closed(spark):
    # closure(inv(E)) == inv(closure(E)): derived whole-of edges exist
    inst = [("urn:1", "ex:part", "urn:2", U, None),
            ("urn:2", "ex:part", "urn:3", U, None)]
    out = rowset(owl_closure(
        df(spark, inst),
        schema_triples=df(spark, [
            axiom_type("ex:part", OWL_TRANSITIVE),
            axiom_inv("ex:part", "ex:whole")])))
    assert ("urn:3", "ex:whole", "urn:1", U, None) in out


def test_passthrough_untouched_predicates(spark):
    inst = [("urn:a", "ex:label", "A", "literal", "en"),
            ("urn:a", "ex:within", "urn:b", U, None)]
    out = rowset(owl_closure(
        df(spark, inst),
        schema_triples=df(spark, [axiom_inv("ex:within", "ex:contains")])))
    assert ("urn:a", "ex:label", "A", "literal", "en") in out


def test_no_axioms_is_identity_plus_dedup(spark):
    inst = [("urn:a", "ex:p", "urn:b", U, None),
            ("urn:a", "ex:p", "urn:b", U, None)]
    out = owl_closure(df(spark, inst))
    assert out.count() == 1


def test_schema_rows_ride_into_output(spark):
    inst = [("urn:a", "ex:within", "urn:b", U, None)]
    schema = [axiom_inv("ex:within", "ex:contains")]
    out = rowset(owl_closure(df(spark, inst),
                             schema_triples=df(spark, schema)))
    assert tuple(schema[0]) in out


def test_symmetric_transitive_rejected(spark):
    inst = [("urn:a", "ex:adj", "urn:b", U, None)]
    with pytest.raises(OwlUnsupportedPattern, match="clique"):
        owl_closure(df(spark, inst), schema_triples=df(spark, [
            axiom_type("ex:adj", OWL_SYMMETRIC),
            axiom_type("ex:adj", OWL_TRANSITIVE)]))


def test_self_inverse_transitive_rejected(spark):
    inst = [("urn:a", "ex:p", "urn:b", U, None)]
    with pytest.raises(OwlUnsupportedPattern, match="clique"):
        owl_closure(df(spark, inst), schema_triples=df(spark, [
            axiom_inv("ex:p", "ex:p"),
            axiom_type("ex:p", OWL_TRANSITIVE)]))


def test_axioms_mined_from_instance_when_no_schema_arg(spark):
    inst = [("urn:a", "ex:within", "urn:b", U, None),
            axiom_inv("ex:within", "ex:contains")]
    out = rowset(owl_closure(df(spark, inst)))
    assert ("urn:b", "ex:contains", "urn:a", U, None) in out


# --------------------------------------------------------------------------
# incremental maintenance (streaming/owl_stream.py)
# --------------------------------------------------------------------------

CHAIN_AXIOMS = [axiom_type("ex:part", OWL_TRANSITIVE),
                axiom_inv("ex:part", "ex:whole"),
                axiom_type("ex:adj", OWL_SYMMETRIC)]
CHAIN_INST = [("urn:1", "ex:part", "urn:2", U, None),
              ("urn:2", "ex:part", "urn:3", U, None),
              ("urn:3", "ex:part", "urn:4", U, None),
              ("urn:4", "ex:part", "urn:5", U, None),
              ("urn:a", "ex:adj", "urn:b", U, None),
              ("urn:1", "ex:label", "one", "literal", "en")]


def _write_chain_slices(spark, tmp_path, rows, n_slices):
    """One edge per slice file: transitive paths exist ONLY across
    micro-batches, so per-batch closure alone would under-infer —
    exactly what the seeded delta closure must repair."""
    import os

    from pyspark.sql import functions as F

    from meresco_rdf_spark.sinks.nquads_sink import write_nquads

    in_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(in_dir)
    per = max(1, len(rows) // n_slices)
    for i in range(n_slices):
        chunk = rows[i * per: len(rows) if i == n_slices - 1
                     else (i + 1) * per]
        quads = df(spark, chunk).withColumn(
            "context", F.lit(None).cast("string"))
        write_nquads(quads, os.path.join(in_dir, "slice%d" % i),
                     num_files=1)
    return in_dir


def _run_owl_maintenance(spark, tmp_path, in_dir, axioms, name="t"):
    import os

    from meresco_rdf_spark.streaming.owl_stream import run_owl_maintenance
    from meresco_rdf_spark.streaming.quad_stream import read_nquads_stream

    table = os.path.join(str(tmp_path), name, "table")
    q = run_owl_maintenance(
        read_nquads_stream(spark, in_dir, glob="*.txt",
                           max_files_per_trigger=1).drop("context"),
        df(spark, axioms), table,
        os.path.join(str(tmp_path), name, "ckpt"))
    q.awaitTermination(300)
    return table


def test_stream_owl_equals_batch_closure_cross_batch_paths(spark, tmp_path):
    in_dir = _write_chain_slices(spark, tmp_path, CHAIN_INST, n_slices=5)
    table = _run_owl_maintenance(spark, tmp_path, in_dir, CHAIN_AXIOMS)
    got = {tuple(r) for r in spark.read.parquet(table).collect()}
    batch = {tuple(r) for r in owl_closure(
        df(spark, CHAIN_INST),
        schema_triples=df(spark, CHAIN_AXIOMS)).collect()}
    assert got == batch
    # the cross-batch derivation specifically: 1 -> 5 spans 4 slices
    assert ("urn:1", "ex:part", "urn:5", U, None) in got
    assert ("urn:5", "ex:whole", "urn:1", U, None) in got


def test_stream_owl_replay_is_noop(spark, tmp_path):
    import os

    from meresco_rdf_spark.streaming.owl_stream import run_owl_maintenance
    from meresco_rdf_spark.streaming.quad_stream import read_nquads_stream

    in_dir = _write_chain_slices(spark, tmp_path, CHAIN_INST, n_slices=2)
    table = _run_owl_maintenance(spark, tmp_path, in_dir, CHAIN_AXIOMS,
                                 name="a")
    n1 = spark.read.parquet(table).count()
    q = run_owl_maintenance(
        read_nquads_stream(spark, in_dir, glob="*.txt",
                           max_files_per_trigger=1).drop("context"),
        df(spark, CHAIN_AXIOMS), table,
        os.path.join(str(tmp_path), "a", "ckpt2"))
    q.awaitTermination(300)
    assert spark.read.parquet(table).count() == n1


def test_stream_owl_rejects_axioms_on_stream(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    poisoned = CHAIN_INST + [axiom_type("ex:other", OWL_TRANSITIVE)]
    in_dir = _write_chain_slices(spark, tmp_path, poisoned, n_slices=1)
    with pytest.raises(StreamingQueryException, match="fixed\\s+schema"):
        _run_owl_maintenance(spark, tmp_path, in_dir, CHAIN_AXIOMS)


# --------------------------------------------------------------------------
# equivalence axioms + functional keys (owl:equivalentProperty /
# owl:equivalentClass / owl:FunctionalProperty / InverseFunctionalProperty)
# --------------------------------------------------------------------------

def test_orbit_equivalent_property_renames():
    o = _orbits([], [], [("ex:p", "ex:q")])
    assert o["ex:p"] == [("ex:p", False), ("ex:q", False)]
    assert o["ex:q"] == [("ex:p", False), ("ex:q", False)]


def test_orbit_equiv_composes_with_inverse():
    # p ≡ q, q inverseOf r: (s p o) also entails (o r s)
    o = _orbits([("ex:q", "ex:r")], [], [("ex:p", "ex:q")])
    assert ("ex:r", True) in o["ex:p"]
    assert ("ex:q", False) in o["ex:p"]


def test_equiv_property_emits_renamed(spark):
    inst = [("urn:a", "ex:locatedIn", "urn:b", U, None)]
    out = rowset(owl_closure(
        df(spark, inst),
        schema_triples=df(spark, [
            ("ex:locatedIn", OWL_EQUIV_PROPERTY, "ex:within", U, None)])))
    assert ("urn:a", "ex:within", "urn:b", U, None) in out
    assert ("urn:a", "ex:locatedIn", "urn:b", U, None) in out


def test_equiv_property_transitive_propagates(spark):
    # mixed-predicate chain closes because p ≡ q makes them one relation
    inst = [("urn:1", "ex:p", "urn:2", U, None),
            ("urn:2", "ex:q", "urn:3", U, None)]
    out = rowset(owl_closure(
        df(spark, inst),
        schema_triples=df(spark, [
            ("ex:p", OWL_EQUIV_PROPERTY, "ex:q", U, None),
            axiom_type("ex:q", OWL_TRANSITIVE)])))
    assert ("urn:1", "ex:p", "urn:3", U, None) in out
    assert ("urn:1", "ex:q", "urn:3", U, None) in out


def test_equiv_of_symmetric_transitive_rejected(spark):
    inst = [("urn:a", "ex:p", "urn:b", U, None)]
    with pytest.raises(OwlUnsupportedPattern, match="clique"):
        owl_closure(df(spark, inst), schema_triples=df(spark, [
            ("ex:p", OWL_EQUIV_PROPERTY, "ex:q", U, None),
            axiom_type("ex:q", OWL_SYMMETRIC),
            axiom_type("ex:p", OWL_TRANSITIVE)]))


def test_equiv_class_expands_types_through_chain(spark):
    inst = [("urn:x", RDF_TYPE, "ex:Corp", U, None),
            ("urn:x", "ex:label", "x", "literal", None)]
    out = rowset(owl_closure(
        df(spark, inst),
        schema_triples=df(spark, [
            ("ex:Corp", OWL_EQUIV_CLASS, "ex:Company", U, None),
            ("ex:Company", OWL_EQUIV_CLASS, "ex:Firm", U, None)])))
    assert ("urn:x", RDF_TYPE, "ex:Company", U, None) in out
    assert ("urn:x", RDF_TYPE, "ex:Firm", U, None) in out
    # non-type rows and unrelated classes untouched
    assert ("urn:x", "ex:label", "x", "literal", None) in out


def test_equiv_class_works_both_directions(spark):
    inst = [("urn:y", RDF_TYPE, "ex:Firm", U, None)]
    out = rowset(owl_closure(
        df(spark, inst),
        schema_triples=df(spark, [
            ("ex:Corp", OWL_EQUIV_CLASS, "ex:Firm", U, None)])))
    assert ("urn:y", RDF_TYPE, "ex:Corp", U, None) in out


def test_rdf_type_property_axiom_rejected(spark):
    inst = [("urn:a", "ex:p", "urn:b", U, None)]
    with pytest.raises(OwlUnsupportedPattern, match="rdf:type"):
        owl_closure(df(spark, inst), schema_triples=df(spark, [
            (RDF_TYPE, OWL_INVERSE_OF, "ex:typeOf", U, None)]))


def test_equiv_class_over_axiom_vocab_rejected(spark):
    inst = [("urn:a", "ex:p", "urn:b", U, None)]
    with pytest.raises(OwlUnsupportedPattern, match="vocabulary"):
        owl_closure(df(spark, inst), schema_triples=df(spark, [
            ("ex:MyClass", OWL_EQUIV_CLASS, OWL_TRANSITIVE, U, None)]))


def test_functional_links_are_star_shaped(spark):
    inst = [("urn:s", "ex:hq", "urn:c", U, None),
            ("urn:s", "ex:hq", "urn:a", U, None),
            ("urn:s", "ex:hq", "urn:b", U, None),
            ("urn:other", "ex:hq", "urn:z", U, None)]
    links = {tuple(r) for r in owl_key_links(
        df(spark, inst),
        schema_triples=df(spark, [
            axiom_type("ex:hq", OWL_FUNCTIONAL)])).collect()}
    # star from the min object; the lone group emits nothing
    assert links == {("urn:a", "urn:b"), ("urn:a", "urn:c")}


def test_functional_skips_literal_objects(spark):
    inst = [("urn:s", "ex:hq", "urn:a", U, None),
            ("urn:s", "ex:hq", "HQ", "literal", None)]
    links = {tuple(r) for r in owl_key_links(
        df(spark, inst),
        schema_triples=df(spark, [
            axiom_type("ex:hq", OWL_FUNCTIONAL)])).collect()}
    assert links == set()


def test_inverse_functional_literal_keys(spark):
    # the mbox case: a literal key merges subjects, and a uri object of
    # equal spelling is a DIFFERENT key (kind rides the grouping)
    inst = [("urn:a", "ex:mbox", "x@y.z", "literal", None),
            ("urn:b", "ex:mbox", "x@y.z", "literal", None),
            ("urn:c", "ex:mbox", "x@y.z", U, None)]
    links = {tuple(r) for r in owl_key_links(
        df(spark, inst),
        schema_triples=df(spark, [
            axiom_type("ex:mbox", OWL_INV_FUNCTIONAL)])).collect()}
    assert links == {("urn:a", "urn:b")}


def test_key_links_found_through_orbit(spark):
    # p functional, p inverseOf q, data arrives in q-form only:
    # q is inverse-functional by propagation, so the links still appear
    inst = [("urn:o1", "ex:q", "urn:s", U, None),
            ("urn:o2", "ex:q", "urn:s", U, None)]
    links = {tuple(r) for r in owl_key_links(
        df(spark, inst),
        schema_triples=df(spark, [
            axiom_inv("ex:p", "ex:q"),
            axiom_type("ex:p", OWL_FUNCTIONAL)])).collect()}
    assert links == {("urn:o1", "urn:o2")}


def test_key_sameas_smush_composition(spark):
    from meresco_rdf_spark.operators.owl import owl_key_sameas_triples
    from meresco_rdf_spark.operators.sameas import sameas_canonicalize

    inst = [("urn:a", "ex:mbox", "x@y.z", "literal", None),
            ("urn:b", "ex:mbox", "x@y.z", "literal", None),
            ("urn:a", "ex:name", "A", "literal", None),
            ("urn:b", "ex:knows", "urn:q", U, None)]
    schema = [axiom_type("ex:mbox", OWL_INV_FUNCTIONAL)]
    data = df(spark, inst)
    links = owl_key_sameas_triples(data, schema_triples=df(spark, schema))
    out = rowset(sameas_canonicalize(data.unionByName(links)))
    # everything collapses onto urn:a (min IRI)
    assert ("urn:a", "ex:knows", "urn:q", U, None) in out
    assert all(r[0] != "urn:b" for r in out)


def test_stream_owl_maintains_class_equivalence(spark, tmp_path):
    axioms = CHAIN_AXIOMS + [
        ("ex:Corp", OWL_EQUIV_CLASS, "ex:Company", U, None)]
    inst = CHAIN_INST + [("urn:1", RDF_TYPE, "ex:Corp", U, None),
                         ("urn:2", RDF_TYPE, "ex:Company", U, None)]
    in_dir = _write_chain_slices(spark, tmp_path, inst, n_slices=4)
    table = _run_owl_maintenance(spark, tmp_path, in_dir, axioms,
                                 name="cls")
    got = {tuple(r) for r in spark.read.parquet(table).collect()}
    batch = {tuple(r) for r in owl_closure(
        df(spark, inst), schema_triples=df(spark, axioms)).collect()}
    assert got == batch
    assert ("urn:1", RDF_TYPE, "ex:Company", U, None) in got
    assert ("urn:2", RDF_TYPE, "ex:Corp", U, None) in got


def naive_owl_fixpoint_eq(instance, axioms):
    """The naive chase extended with the equivalence renames."""
    closure = naive_owl_fixpoint(instance, axioms)
    ep, ec = set(), set()
    for s, p, o, k, l in axioms:
        if p == OWL_EQUIV_PROPERTY:
            ep |= {(s, o), (o, s)}
        elif p == OWL_EQUIV_CLASS:
            ec |= {(s, o), (o, s)}
    while True:
        new = set()
        for s, p, o, k, l in closure:
            for a, b in ep:
                if p == a:
                    new.add((s, b, o, k, l))
            if p == RDF_TYPE:
                for a, b in ec:
                    if o == a:
                        new.add((s, RDF_TYPE, b, "uri", None))
        if new <= closure:
            return closure
        closure |= new
        # renames can feed inverse/symmetric/transitive rules and back
        closure = naive_owl_fixpoint(closure, axioms)


def test_parity_with_naive_fixpoint_equivalence(spark):
    import random

    rng = random.Random(11)
    nodes = ["urn:n%d" % i for i in range(10)]
    classes = ["ex:C1", "ex:C2", "ex:C3", "ex:Other"]
    inst = []
    for _ in range(30):
        p = rng.choice(["ex:p", "ex:q", "ex:r", "ex:other"])
        inst.append((rng.choice(nodes), p, rng.choice(nodes), U, None))
    for _ in range(10):
        inst.append((rng.choice(nodes), RDF_TYPE, rng.choice(classes),
                     U, None))
    axioms = [("ex:p", OWL_EQUIV_PROPERTY, "ex:q", U, None),
              axiom_inv("ex:q", "ex:r"),
              axiom_type("ex:r", OWL_TRANSITIVE),
              ("ex:C1", OWL_EQUIV_CLASS, "ex:C2", U, None),
              ("ex:C2", OWL_EQUIV_CLASS, "ex:C3", U, None)]
    got = rowset(owl_closure(df(spark, inst),
                             schema_triples=df(spark, axioms)))
    want = naive_owl_fixpoint_eq(set(inst), axioms) | set(
        tuple(a) for a in axioms)
    assert got == want


def test_parity_with_naive_fixpoint(spark):
    import random

    rng = random.Random(7)
    nodes = ["urn:n%d" % i for i in range(12)]
    inst = []
    for _ in range(40):
        p = rng.choice(["ex:part", "ex:within", "ex:adj", "ex:other"])
        inst.append((rng.choice(nodes), p, rng.choice(nodes), U, None))
    inst.append(("urn:n0", "ex:other", "txt", "literal", None))
    axioms = [axiom_type("ex:part", OWL_TRANSITIVE),
              axiom_inv("ex:part", "ex:whole"),
              axiom_type("ex:adj", OWL_SYMMETRIC)]
    got = rowset(owl_closure(df(spark, inst),
                             schema_triples=df(spark, axioms)))
    want = naive_owl_fixpoint(set(inst), axioms) | set(
        tuple(a) for a in axioms)
    assert got == want


class TestPropertyChains:
    S = ("subj string, pred string, obj_value string, obj_kind string, "
         "obj_lang string")

    def _chain(self, head, steps, tag):
        from meresco_rdf_spark.operators.owl import (
            OWL_PROPERTY_CHAIN, RDF_FIRST, RDF_NIL, RDF_REST)
        rows = [(head, OWL_PROPERTY_CHAIN, "_:l%s0" % tag, "bnode", None)]
        for i, s in enumerate(steps):
            rows.append(("_:l%s%d" % (tag, i), RDF_FIRST, s, "uri", None))
            nxt = ("_:l%s%d" % (tag, i + 1) if i + 1 < len(steps)
                   else RDF_NIL)
            rows.append(("_:l%s%d" % (tag, i), RDF_REST, nxt,
                         "uri" if nxt == RDF_NIL else "bnode", None))
        return rows

    def _family(self, spark):
        return spark.createDataFrame([
            ("urn:me", "urn:parent", "urn:mom", "uri", None),
            ("urn:mom", "urn:parent", "urn:gran", "uri", None),
            ("urn:gran", "urn:parent", "urn:ggran", "uri", None),
            ("urn:mom", "urn:brother", "urn:bob", "uri", None),
        ], self.S)

    def test_two_chains_one_pass(self, spark):
        from meresco_rdf_spark.operators.owl import owl_chain_closure
        schema = spark.createDataFrame(
            self._chain("urn:gp", ("urn:parent", "urn:parent"), "a")
            + self._chain("urn:uncle", ("urn:parent", "urn:brother"),
                          "b"), self.S)
        out = owl_chain_closure(self._family(spark),
                                schema_triples=schema)
        got = sorted((r.subj, r.pred, r.obj_value) for r in out.collect()
                     if r.pred in ("urn:gp", "urn:uncle"))
        assert got == [("urn:me", "urn:gp", "urn:gran"),
                       ("urn:me", "urn:uncle", "urn:bob"),
                       ("urn:mom", "urn:gp", "urn:ggran")]

    def test_recursive_chain_converges(self, spark):
        # anc <- parent∘parent seeds; anc <- parent∘anc extends — the
        # classic recursive axiom, bounded by the chain depth
        from meresco_rdf_spark.operators.owl import owl_chain_closure
        schema = spark.createDataFrame(
            self._chain("urn:anc", ("urn:parent", "urn:parent"), "c")
            + self._chain("urn:anc", ("urn:parent", "urn:anc"), "d"),
            self.S)
        out = owl_chain_closure(self._family(spark),
                                schema_triples=schema)
        got = sorted((r.subj, r.obj_value) for r in out.collect()
                     if r.pred == "urn:anc")
        assert got == [("urn:me", "urn:ggran"), ("urn:me", "urn:gran"),
                       ("urn:mom", "urn:ggran")]

    def test_literal_never_continues_a_chain(self, spark):
        from meresco_rdf_spark.operators.owl import owl_chain_closure
        schema = spark.createDataFrame(
            self._chain("urn:gn", ("urn:parent", "urn:name"), "e"),
            self.S)
        inst = spark.createDataFrame([
            ("urn:me", "urn:parent", "urn:mom", "uri", None),
            ("urn:mom", "urn:name", "Mom", "literal", None),
            # a literal with a name-subject spelling collision must not
            # be walked through
            ("urn:x", "urn:parent", "urn:mom", "literal", None),
        ], self.S)
        out = owl_chain_closure(inst, schema_triples=schema)
        got = [(r.subj, r.obj_value, r.obj_kind) for r in out.collect()
               if r.pred == "urn:gn"]
        assert got == [("urn:me", "Mom", "literal")]

    def test_inverse_step_and_short_chain_rejected(self, spark):
        import pytest as _pytest

        from meresco_rdf_spark.operators.owl import (
            OWL_PROPERTY_CHAIN, OwlUnsupportedPattern, RDF_FIRST,
            RDF_NIL, RDF_REST, owl_chain_closure)
        inst = self._family(spark)
        inv = spark.createDataFrame([
            ("urn:p", OWL_PROPERTY_CHAIN, "_:i0", "bnode", None),
            ("_:i0", RDF_FIRST, "_:invstep", "bnode", None),
            ("_:i0", RDF_REST, "_:i1", "bnode", None),
            ("_:i1", RDF_FIRST, "urn:parent", "uri", None),
            ("_:i1", RDF_REST, RDF_NIL, "uri", None),
        ], self.S)
        with _pytest.raises(OwlUnsupportedPattern, match="Inverse"):
            owl_chain_closure(inst, schema_triples=inv)
        short = spark.createDataFrame(
            self._chain("urn:p", ("urn:parent",), "s"), self.S)
        with _pytest.raises(OwlUnsupportedPattern, match="two steps"):
            owl_chain_closure(inst, schema_triples=short)


class TestPerGraphClosure:
    """owl_closure_quads: graph-encoded per-graph closure — each graph
    closes under its own axioms, nothing leaks."""

    QSCHEMA = ("context string, subj string, pred string, "
               "obj_value string, obj_kind string, obj_lang string")

    def _run(self, spark, rows):
        from meresco_rdf_spark.operators.owl import owl_closure_quads
        q = spark.createDataFrame(rows, self.QSCHEMA)
        return {tuple(r) for r in owl_closure_quads(q).collect()}

    def test_matches_per_graph_triple_closure(self, spark):
        g1 = [("ex:part", RDF_TYPE, OWL_TRANSITIVE, "uri", None),
              ("urn:a", "ex:part", "urn:b", "uri", None),
              ("urn:b", "ex:part", "urn:c", "uri", None)]
        g2 = [("ex:part", OWL_INVERSE_OF, "ex:whole", "uri", None),
              ("urn:a", "ex:part", "urn:b", "uri", None)]
        rows = [("g1",) + r for r in g1] + [("g2",) + r for r in g2]
        got = self._run(spark, rows)
        want = set()
        for g, tri in (("g1", g1), ("g2", g2)):
            want |= {(g,) + tuple(r)
                     for r in owl_closure(df(spark, tri)).collect()}
        assert got == want
        # the transitive hop exists only in g1; the inverse only in g2
        assert ("g1", "urn:a", "ex:part", "urn:c", "uri", None) in got
        assert ("g2", "urn:b", "ex:whole", "urn:a", "uri", None) in got
        assert ("g2", "urn:a", "ex:part", "urn:c", "uri", None) not in got
        assert ("g1", "urn:b", "ex:whole", "urn:a", "uri", None) not in got

    def test_default_graph_is_null_context(self, spark):
        rows = [(None, "ex:knows", RDF_TYPE, OWL_SYMMETRIC, "uri", None),
                (None, "urn:a", "ex:knows", "urn:b", "uri", None)]
        got = self._run(spark, rows)
        assert (None, "urn:b", "ex:knows", "urn:a", "uri", None) in got

    def test_literals_never_encoded(self, spark):
        rows = [("g", "ex:p", OWL_INVERSE_OF, "ex:q", "uri", None),
                ("g", "urn:a", "ex:name", "plain text", "literal", "en")]
        got = self._run(spark, rows)
        assert ("g", "urn:a", "ex:name", "plain text", "literal", "en") \
            in got

    def test_unencodable_reserved_rows_rejected(self, spark):
        rows = [("g", "http://www.w3.org/2002/07/owl#Thing",
                 "http://www.w3.org/2000/01/rdf-schema#label",
                 "thing", "literal", None)]
        with pytest.raises(OwlUnsupportedPattern, match="reserved"):
            self._run(spark, rows)

    def test_axiom_over_reserved_term_rejected(self, spark):
        # (c1 equivalentClass owl:Thing) in g1 + (c2 equivalentClass
        # owl:Thing) in g2: owl:Thing stays unprefixed, so the two
        # graphs' class orbits would merge through it — g1 would gain
        # (x rdf:type ex:c2) from g2's axiom.  Must be refused, not
        # silently leaked.
        thing = "http://www.w3.org/2002/07/owl#Thing"
        rows = [("g1", "ex:c1", OWL_EQUIV_CLASS, thing, "uri", None),
                ("g2", "ex:c2", OWL_EQUIV_CLASS, thing, "uri", None),
                ("g1", "urn:x", RDF_TYPE, "ex:c1", "uri", None)]
        with pytest.raises(OwlUnsupportedPattern, match="leak"):
            self._run(spark, rows)
        # reserved SUBJECT endpoint is the symmetric leak
        rows2 = [("g1", thing, OWL_EQUIV_CLASS, "ex:c1", "uri", None)]
        with pytest.raises(OwlUnsupportedPattern, match="leak"):
            self._run(spark, rows2)
        # inverseOf onto a reserved predicate leaks the property orbit
        rows3 = [("g1", "ex:p", OWL_INVERSE_OF,
                  "http://www.w3.org/2000/01/rdf-schema#seeAlso",
                  "uri", None)]
        with pytest.raises(OwlUnsupportedPattern, match="leak"):
            self._run(spark, rows3)
