"""Recursive-descent parser for the supported SPARQL SELECT subset.

Grammar (case-insensitive keywords):

    Query        := Prefix* Select Where Modifiers
    Prefix       := 'PREFIX' PNAME_NS IRIREF
    Select       := 'SELECT' ('DISTINCT' | 'REDUCED')? ( Var+ | '*' )
    Where        := 'WHERE'? GroupGraphPattern
    GroupGraphPattern := '{' ( TriplesBlock | Filter | Optional | Group
                               ('UNION' Group)* )* '}'
    Filter       := 'FILTER' '(' Expr ')'
    Optional     := 'OPTIONAL' GroupGraphPattern
    Modifiers    := ('ORDER' 'BY' OrderCond+)? ('LIMIT' INT)? ('OFFSET' INT)?
    OrderCond    := Var | ('ASC'|'DESC') '(' Var ')'
    Expr         := OrExpr;  standard precedence  ! > comparison > && > ||
    Primary      := Var | Literal | NumericLiteral | IRI
                  | 'regex' '(' Expr ',' STRING ')'
                  | 'lang' '(' Var ')' | 'str' '(' Var ')'
                  | 'bound' '(' Var ')' | '(' Expr ')'

Triple terms: IRIREF ``<uri>``, prefixed name ``foaf:name``, the ``a``
keyword (rdf:type), ``?var``, literals ``"s"``, ``"s"@lang``,
``"s"^^<dtype>``, blank-node labels ``_:b``.  Predicate-object lists
(``;``) and object lists (``,``) are expanded.

Property paths (predicate position): sequence ``p1/p2`` (desugared into
chained patterns over fresh internal variables), inverse ``^p`` (subject/
object swap), alternation ``p1|p2`` (desugared to UNION branches),
negated property sets ``!p`` / ``!(p1|p2)`` / ``!^q`` / ``!(p|^q)``
/ ``^!set``
(a NOT-IN predicate filter, no variable bound; inverse members swap the
endpoint terms and a mixed set desugars to the union of its forward and
inverse components per §18.4), and the quantifiers over an IRI, an alternation of
IRIs, or any ``|``/``/``/``^`` combination of IRIs (DNF ``branches`` of
fwd/inv steps — e.g. ``(skos:broader|^skos:narrower)+``, ``(p/q)*``,
``^p+``): one-or-more ``p+`` (``PathPlus`` — the compiler runs an
iterative closure), zero-or-more ``p*`` (``PathStar`` — the closure
UNION the zero-length identity matches per SPARQL 1.1 §18.4), and
zero-or-one ``p?`` (``PathOpt``).  Negated sets are also valid under
quantifiers and inside quantified groups (``!(p)+``, ``(!p/q)*`` — the
closure runs over the predicate-COMPLEMENT edge relation); nested
quantifiers are rejected with a clear error.

Aggregates: ``SELECT ?g (COUNT(?v) AS ?n) ... GROUP BY ?g`` with
COUNT (incl. ``*`` and DISTINCT) / SUM / AVG / MIN / MAX / SAMPLE /
GROUP_CONCAT (with ``; SEPARATOR="..."``), parsed into ``AggSelect``
entries compiled to one hash aggregation, plus ``HAVING`` constraints
over the aggregate aliases.  SAMPLE and GROUP_CONCAT are free to pick
any value/order per the spec; we pin the deterministic refinement
(lexical minimum / lexically sorted) so results are reproducible and
oracle-checkable.

Group-level forms beyond BGP: ``OPTIONAL``, ``UNION``, ``FILTER`` (incl.
``FILTER EXISTS { }`` / ``FILTER NOT EXISTS { }``), ``MINUS { }``,
``VALUES`` inline bindings (single-var and full-row forms, ``UNDEF``
supported), ``BIND (expr AS ?v)`` for the supported scalar functions and
arithmetic, and sub-selects ``{ SELECT ... }`` with their own modifiers.

``CONSTRUCT { template } WHERE { ... }`` parses into the same AST with
``construct_template`` set; template terms are IRIs, literals, variables,
and blank-node labels (instantiated per solution by the compiler).
Update requests (``INSERT DATA`` / ``DELETE DATA`` / ``DELETE WHERE`` /
``DELETE {} INSERT {} WHERE {}``) parse into ``UpdateQuery``.

This is a deliberately scoped subset (no federated SERVICE, no named
graphs); unsupported syntax raises ``SparqlSyntaxError`` with position
info rather than mis-parsing.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional as Opt, Sequence, Tuple, Union

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class SparqlSyntaxError(ValueError):
    pass


# Scalar built-ins accepted in FILTER / BIND expressions (SPARQL 1.1 §17.4
# subset).  Boolean-valued: bound, regex, isuri/isiri, isblank, isliteral,
# contains, strstarts, strends, langmatches, sameterm.  Term-valued:
# str, lang, ucase, lcase, strlen, substr, concat, strbefore, strafter,
# replace, coalesce, if, abs, ceil, floor, round, encode_for_uri.
# IN / NOT IN parse as RelationalExpression tails and desugar to =/!=
# chains; IRIs are valid expression primaries.
_FUNC_NAMES = frozenset((
    "regex", "lang", "str", "bound",
    "isuri", "isiri", "isblank", "isliteral", "isnumeric",
    "contains", "strstarts", "strends", "langmatches",
    "ucase", "lcase", "strlen", "substr", "concat",
    "strbefore", "strafter", "replace", "coalesce", "if",
    "abs", "ceil", "floor", "round",
    "sameterm", "encode_for_uri",
    # §17.4.4 hashes; §17.4.5 dateTime accessors (lexical-form based —
    # the term model carries no datatype, matching the reference's
    # datatype-less Literal); constructors / nondeterministic
    "md5", "sha1", "sha256", "sha384", "sha512",
    "year", "month", "day", "hours", "minutes", "seconds",
    "timezone", "tz",
    "uuid", "struuid", "now", "rand", "bnode",
    # §17.4.2 constructors expressible under the datatype-less term
    # model (STRDT is NOT: rejected loudly below)
    "datatype", "iri", "uri", "strlang",
))


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Iri:
    uri: str


@dataclass(frozen=True)
class Lit:
    value: str
    lang: Opt[str] = None
    dtype: Opt[str] = None


@dataclass(frozen=True)
class BNodeRef:
    label: str


PathBranches = Tuple[Tuple[Tuple[str, str], ...], ...]


@dataclass(frozen=True)
class PathPlus:
    """One-or-more path over one predicate IRI or an alternation of IRIs
    (``preds`` — the compiler's single-filter fast path), or over any
    ``|``/``/``/``^`` combination of IRIs (``branches`` — DNF: one tuple
    of ('fwd'|'inv', iri) steps per alternation branch; the compiler
    builds the step-join edge relation and closes over it).  Exactly one
    of the two is non-empty."""
    preds: Tuple[str, ...]
    branches: PathBranches = ()


@dataclass(frozen=True)
class PathStar:
    """Zero-or-more path ``p*``: the transitive closure UNION the
    zero-length identity matches (every RDF term in the graph bound to
    itself; a constant endpoint contributes its own identity row).
    ``preds``/``branches`` as in ``PathPlus``."""
    preds: Tuple[str, ...]
    branches: PathBranches = ()


@dataclass(frozen=True)
class PathOpt:
    """Zero-or-one path ``p?``: the base edge set UNION the zero-length
    identity matches.  ``preds``/``branches`` as in ``PathPlus``."""
    preds: Tuple[str, ...]
    branches: PathBranches = ()


@dataclass(frozen=True)
class NegatedSet:
    """Negated property set ``!iri`` / ``!(iri1|iri2|...)``: matches any
    triple whose predicate is NOT one of the listed IRIs.  Does not bind
    a predicate variable (SPARQL 1.1 §9.1)."""
    preds: Tuple[str, ...]


Term = Union[Var, Iri, Lit, BNodeRef]
Pred = Union[Term, PathPlus, PathStar, PathOpt, NegatedSet]
TriplePattern = Tuple[Term, Pred, Term]

# every non-plain predicate node (guards that forbid property paths in
# CONSTRUCT/DELETE templates etc. check against this tuple)
PATH_PREDS = (PathPlus, PathStar, PathOpt, NegatedSet)


@dataclass(frozen=True)
class Cmp:
    op: str  # = != < > <= >=
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class BoolOp:
    op: str  # and / or
    parts: Tuple["Expr", ...]


@dataclass(frozen=True)
class NotExpr:
    inner: "Expr"


@dataclass(frozen=True)
class FuncCall:
    name: str  # one of _FUNC_NAMES (SPARQL 1.1 §17.4 subset)
    args: Tuple["Expr", ...]


@dataclass(frozen=True)
class Num:
    value: float
    text: str


@dataclass(frozen=True)
class Arith:
    op: str  # + - * /
    left: "Expr"
    right: "Expr"


Expr = Union[Cmp, BoolOp, NotExpr, FuncCall, Var, Lit, Num, Arith]


@dataclass(frozen=True)
class AggSelect:
    func: str            # count / sum / avg / min / max / sample / group_concat
    var: Opt[str]        # None for COUNT(*) or when ``expr`` is set
    distinct: bool
    alias: str
    separator: str = " "  # GROUP_CONCAT only (SPARQL default is one space)
    expr: Opt["Expr"] = None  # non-variable aggregate argument


@dataclass
class TriplesBlock:
    patterns: List[TriplePattern] = field(default_factory=list)
    # property-path alternations: each entry is a list of branches, each
    # branch a pattern list — the group parser lifts these into UNIONs
    alts: List[List[List[TriplePattern]]] = field(default_factory=list)


@dataclass
class Filter:
    expr: Expr


@dataclass
class OptionalPattern:
    group: "GroupPattern"


@dataclass
class UnionPattern:
    groups: List["GroupPattern"]


@dataclass
class ExistsPattern:
    """FILTER EXISTS / FILTER NOT EXISTS: keep (or drop) the solutions
    that are join-compatible with the sub-group."""
    group: "GroupPattern"
    positive: bool


@dataclass
class MinusPattern:
    """MINUS: drop solutions compatible with the sub-group ON AT LEAST ONE
    shared variable (SPARQL 1.1 §8.3 — disjoint domains remove nothing)."""
    group: "GroupPattern"


@dataclass
class NamedGraphPattern:
    """GRAPH <iri> { } / GRAPH ?g { }: scope the inner group to one named
    graph (constant) or iterate named graphs binding the variable.  The
    relation must carry a ``context`` column (quads) — the shape the
    multi-document ingest emits (sources/rdf_source.py: one graph per
    source document, context = file: IRI)."""
    term: Union["Iri", "Var"]
    group: "GroupPattern"


@dataclass
class ValuesPattern:
    """Inline solution sequence. ``rows`` holds one Optional[Term] per
    variable per row (None = UNDEF)."""
    variables: List[str]
    rows: List[List[Opt[Term]]]


@dataclass
class BindPattern:
    """BIND (expr AS ?v): extends each solution with a computed binding."""
    expr: "Expr"
    alias: str


@dataclass
class SubSelect:
    """Nested ``{ SELECT ... }`` (SPARQL 1.1 §12): evaluated bottom-up,
    its projected solutions join the enclosing group on shared
    variables.  Aggregate aliases surface as plain-literal bindings."""
    query: "SelectQuery"


@dataclass
class GroupPattern:
    parts: List[Union[TriplesBlock, Filter, OptionalPattern, UnionPattern,
                      ExistsPattern, MinusPattern, ValuesPattern,
                      BindPattern, SubSelect, NamedGraphPattern]] \
        = field(default_factory=list)


@dataclass
class SelectQuery:
    variables: Union[str, List[str]]  # '*' or var names (no '?')
    distinct: bool
    where: GroupPattern
    order_by: List[Tuple[str, bool]] = field(default_factory=list)  # (var, asc)
    limit: Opt[int] = None
    offset: Opt[int] = None
    aggregates: List[AggSelect] = field(default_factory=list)
    group_by: List[str] = field(default_factory=list)
    having: List["Expr"] = field(default_factory=list)
    # CONSTRUCT form: template patterns to instantiate per solution
    construct_template: Opt[List[TriplePattern]] = None
    # ASK form: existence test over the WHERE group
    ask: bool = False
    # DESCRIBE form: resources to describe (Iri constants and/or Vars
    # bound by the WHERE group)
    describe_terms: Opt[List[Term]] = None
    # dataset clauses (§13.2): FROM graphs merge into the default graph,
    # FROM NAMED graphs are the ones visible to GRAPH.  Empty = use the
    # relation's own dataset (NULL context = default, rest named).
    from_graphs: List[str] = field(default_factory=list)
    from_named: List[str] = field(default_factory=list)


@dataclass
class GraphManage:
    """SPARQL 1.1 Update graph-management operation over a quad relation:
    CLEAR / DROP / CREATE / ADD / COPY / MOVE.  ``src``/``dst`` are graph
    IRIs or the markers ``"DEFAULT"`` / ``"NAMED"`` / ``"ALL"`` (markers
    are spelled upper-case and cannot collide with IRIs, which always
    contain ``:``)."""
    op: str
    src: Opt[str] = None
    dst: Opt[str] = None
    silent: bool = False


@dataclass
class UpdateQuery:
    """SPARQL 1.1 Update request (single operation):
    ``INSERT DATA`` / ``DELETE DATA`` (ground quad templates, no WHERE),
    ``DELETE WHERE`` (the pattern doubles as the delete template),
    the full ``(WITH <g>)? DELETE {} INSERT {} WHERE {}`` form (either
    template optional, at least one present), and the graph-management
    forms (``manage`` set, everything else None).

    ``delete_graphs`` / ``insert_graphs`` run parallel to the templates:
    one graph IRI per pattern (None = the WITH graph, or the default
    graph when no WITH)."""
    delete_template: Opt[List[TriplePattern]] = None
    insert_template: Opt[List[TriplePattern]] = None
    where: Opt[GroupPattern] = None
    data_form: bool = False
    delete_graphs: Opt[List[Opt[str]]] = None
    insert_graphs: Opt[List[Opt[str]]] = None
    with_graph: Opt[str] = None
    manage: Opt[GraphManage] = None

    def uses_quads(self) -> bool:
        return (self.manage is not None or self.with_graph is not None
                or any(g is not None for g in (self.delete_graphs or []))
                or any(g is not None for g in (self.insert_graphs or [])))


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
  | (?P<STRING>"(?:[^"\\]|\\.)*")
  | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<DTYPE>\^\^)
  | (?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<BNODE>_:[A-Za-z0-9_]+)
  | (?P<NUMBER>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<PNAME>[A-Za-z_][A-Za-z0-9_-]*?:[A-Za-z0-9_.-]*|[A-Za-z_][A-Za-z0-9_-]*:)
  | (?P<NAME>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<OP>&&|\|\||!=|<=|>=|[{}().;,=<>!*/^|+?-])
""", re.VERBOSE)


def _tokenize(text: str) -> List[Tuple[str, str, int]]:
    tokens = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise SparqlSyntaxError(
                "unrecognized syntax at offset %d: %r" % (pos, text[pos:pos + 20]))
        pos = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        tokens.append((kind, m.group(), m.start()))
    tokens.append(("EOF", "", len(text)))
    return tokens


_UNESCAPE = {
    "\\n": "\n", "\\t": "\t", "\\r": "\r", "\\\\": "\\",
    "\\\"": '"', "\\'": "'",
}


def _unquote(raw: str) -> str:
    body = raw[1:-1]
    return re.sub(r"\\.", lambda m: _UNESCAPE.get(m.group(), m.group()[1]), body)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

class _Parser:
    def __init__(self, text: str):
        self.tokens = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self._fresh = 0  # counter for internal path-join variables
        # when parsing a HAVING expression: the query's AggSelect list,
        # so inline aggregate calls can register hidden aliases
        self._in_having: Opt[List[AggSelect]] = None

    # -- token helpers --
    def peek(self) -> Tuple[str, str, int]:
        return self.tokens[self.i]

    def next(self) -> Tuple[str, str, int]:
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def at_kw(self, word: str) -> bool:
        kind, val, _ = self.peek()
        return kind == "NAME" and val.upper() == word

    def eat_kw(self, word: str) -> None:
        if not self.at_kw(word):
            self.fail("expected %s" % word)
        self.next()

    def at_op(self, op: str) -> bool:
        kind, val, _ = self.peek()
        return kind == "OP" and val == op

    def eat_op(self, op: str) -> None:
        if not self.at_op(op):
            self.fail("expected %r" % op)
        self.next()

    def fail(self, msg: str):
        kind, val, pos = self.peek()
        raise SparqlSyntaxError("%s at offset %d (got %s %r)"
                                % (msg, pos, kind, val))

    # -- grammar --
    def parse(self) -> Union[SelectQuery, UpdateQuery]:
        while self.at_kw("PREFIX"):
            self.next()
            kind, val, _ = self.next()
            if kind != "PNAME" or not val.endswith(":"):
                self.fail("expected prefix name")
            ns = val[:-1]
            kind2, iri, _ = self.next()
            if kind2 != "IRIREF":
                self.fail("expected IRI for prefix %s" % ns)
            self.prefixes[ns] = iri[1:-1]

        if self.at_kw("CONSTRUCT"):
            return self._construct_query()
        if self.at_kw("ASK"):
            return self._ask_query()
        if self.at_kw("DESCRIBE"):
            return self._describe_query()
        if self.at_kw("INSERT") or self.at_kw("DELETE") or self.at_kw("WITH"):
            return self._update_query()
        if any(self.at_kw(w) for w in
               ("CLEAR", "DROP", "CREATE", "ADD", "COPY", "MOVE", "LOAD")):
            return self._manage_query()
        query = self._select_body()
        self._end()
        return query

    def _select_body(self) -> SelectQuery:
        """The SELECT form proper — shared by the top-level query and
        sub-selects (which stop before the enclosing '}' instead of EOF;
        the caller owns the terminator)."""
        self.eat_kw("SELECT")
        distinct = False
        if self.at_kw("DISTINCT"):
            self.next()
            distinct = True
        elif self.at_kw("REDUCED"):
            # §18.2.4.3 permits any amount of duplicate elimination for
            # REDUCED, including all of it — compile as DISTINCT
            self.next()
            distinct = True
        variables: Union[str, List[str]]
        aggregates: List[AggSelect] = []
        if self.at_op("*"):
            self.next()
            variables = "*"
        else:
            names: List[str] = []
            while True:
                if self.peek()[0] == "VAR":
                    names.append(self.next()[1][1:])
                elif self.at_op("("):
                    aggregates.append(self._agg_select())
                else:
                    break
            if not names and not aggregates:
                self.fail("expected projection variables, aggregates, or *")
            variables = names

        from_graphs, from_named = self._dataset_clauses()
        if self.at_kw("WHERE"):
            self.next()
        where = self.group_graph_pattern()

        group_by: List[str] = []
        if self.at_kw("GROUP"):
            self.next()
            self.eat_kw("BY")
            while True:
                if self.peek()[0] == "VAR":
                    group_by.append(self.next()[1][1:])
                elif self.at_op("("):
                    # '(' expr ('AS' ?var)? ')' — grouping on a computed
                    # key desugars into a BIND evaluated before the
                    # aggregation (same codegen stage); an un-aliased
                    # expression gets a hidden non-projectable key
                    self.next()
                    gexpr = self.expr()
                    if self.at_kw("AS"):
                        self.next()
                        galias = self._expect_var()
                    else:
                        galias = "_grp%d" % len(group_by)
                    self.eat_op(")")
                    where.parts.append(BindPattern(gexpr, galias))
                    group_by.append(galias)
                else:
                    break
            if not group_by:
                self.fail("expected GROUP BY variables")
        having: List[Expr] = []
        while self.at_kw("HAVING"):
            if not aggregates and not group_by:
                self.fail("HAVING requires aggregates or GROUP BY")
            self.next()
            self.eat_op("(")
            # inline aggregate calls (HAVING (COUNT(?x) > 2)) parse into
            # hidden _hav<N>-aliased AggSelects — same hash-agg stage,
            # referenced through the alias, excluded from the projection
            self._in_having = aggregates
            try:
                having.append(self.expr())
            finally:
                self._in_having = None
            self.eat_op(")")
        if aggregates and variables != "*":
            loose = [v for v in variables if v not in group_by]
            if loose:
                self.fail("projected variables not in GROUP BY: %s"
                          % ", ".join("?" + v for v in loose))
        if aggregates and variables == "*":
            self.fail("SELECT * cannot be combined with aggregates")
        if group_by and not aggregates:
            self.fail("GROUP BY requires at least one aggregate "
                      "(in the projection or HAVING)")

        order_by: List[Tuple[Union[str, "Expr"], bool]] = []
        if self.at_kw("ORDER"):
            self.next()
            self.eat_kw("BY")
            while True:
                if self.at_kw("ASC") or self.at_kw("DESC"):
                    asc = self.next()[1].upper() == "ASC"
                    self.eat_op("(")
                    if self.peek()[0] == "VAR" and \
                            self.tokens[self.i + 1][:2] == ("OP", ")"):
                        order_by.append((self.next()[1][1:], asc))
                    else:
                        order_by.append((self.expr(), asc))
                    self.eat_op(")")
                elif self.peek()[0] == "VAR":
                    order_by.append((self.next()[1][1:], True))
                elif self.at_op("("):
                    # bracketted order expression: ORDER BY (?a + ?b)
                    self.next()
                    order_by.append((self.expr(), True))
                    self.eat_op(")")
                elif self.peek()[0] == "NAME" and \
                        self.peek()[1].lower() in _FUNC_NAMES:
                    # builtin-call order condition: ORDER BY strlen(?n)
                    order_by.append((self.expr(), True))
                else:
                    break
            if not order_by:
                self.fail("expected order condition")

        limit = offset = None
        # LIMIT/OFFSET accepted in either order (SPARQL 1.1 allows both)
        for _ in range(2):
            if self.at_kw("LIMIT"):
                self.next()
                limit = self._expect_int()
            elif self.at_kw("OFFSET"):
                self.next()
                offset = self._expect_int()
        if self.at_kw("VALUES"):
            # §10.2 trailing ValuesClause: per the §18.2.4.3 algebra the
            # data joins the query pattern (after grouping, before
            # projection/modifiers).  Joining inside the WHERE group is
            # equivalent for plain queries and for VALUES over GROUP BY
            # keys (restricting key rows pre-aggregation restricts the
            # same groups); VALUES over an aggregate alias cannot be
            # pre-joined and is rejected.
            self.next()
            vp = self._values_pattern()
            agg_aliases = {a.alias for a in aggregates}
            clash = [v for v in vp.variables if v in agg_aliases]
            if clash:
                self.fail("trailing VALUES over aggregate alias ?%s is "
                          "not supported" % clash[0])
            where.parts.append(vp)
        return SelectQuery(variables=variables, distinct=distinct,
                           where=where, order_by=order_by,
                           limit=limit, offset=offset,
                           aggregates=aggregates, group_by=group_by,
                           having=having, from_graphs=from_graphs,
                           from_named=from_named)

    def _dataset_clauses(self) -> Tuple[List[str], List[str]]:
        """('FROM' 'NAMED'? IRI)* — §13.2 dataset description."""
        from_graphs: List[str] = []
        from_named: List[str] = []
        while self.at_kw("FROM"):
            self.next()
            named = False
            if self.at_kw("NAMED"):
                self.next()
                named = True
            t = self.term(position="subject")
            if not isinstance(t, Iri):
                self.fail("FROM takes an IRI")
            (from_named if named else from_graphs).append(t.uri)
        return from_graphs, from_named

    def _ask_query(self) -> SelectQuery:
        """'ASK' Dataset* 'WHERE'? GroupGraphPattern — existence test."""
        self.eat_kw("ASK")
        from_graphs, from_named = self._dataset_clauses()
        if self.at_kw("WHERE"):
            self.next()
        where = self.group_graph_pattern()
        if self.peek()[0] != "EOF":
            self.fail("unexpected trailing syntax")
        return SelectQuery(variables=[], distinct=False, where=where,
                           ask=True, from_graphs=from_graphs,
                           from_named=from_named)

    def _describe_query(self) -> SelectQuery:
        """'DESCRIBE' (IRI | Var)+ ('WHERE'? GroupGraphPattern)? —
        variables require a WHERE group that binds them."""
        self.eat_kw("DESCRIBE")
        terms: List[Term] = []
        while True:
            kind, _, _ = self.peek()
            if kind == "VAR":
                terms.append(Var(self.next()[1][1:]))
            elif kind in ("IRIREF", "PNAME"):
                t = self.term(position="subject")
                if not isinstance(t, Iri):
                    self.fail("DESCRIBE takes IRIs or variables")
                terms.append(t)
            else:
                break
        if not terms:
            self.fail("DESCRIBE requires at least one resource")
        from_graphs, from_named = self._dataset_clauses()
        where = GroupPattern()
        if self.at_kw("WHERE") or self.at_op("{"):
            if self.at_kw("WHERE"):
                self.next()
            where = self.group_graph_pattern()
        if any(isinstance(t, Var) for t in terms) and not where.parts:
            self.fail("DESCRIBE with variables requires a WHERE group")
        if self.peek()[0] != "EOF":
            self.fail("unexpected trailing syntax")
        return SelectQuery(variables=[], distinct=True, where=where,
                           describe_terms=terms, from_graphs=from_graphs,
                           from_named=from_named)

    def _construct_query(self) -> SelectQuery:
        """'CONSTRUCT' '{' template '}' 'WHERE'? GroupGraphPattern
        (LIMIT/OFFSET accepted; ORDER BY is meaningless on a graph result
        and rejected).  The template is a plain triples block: IRI/var
        predicates only — property paths describe matching, not
        construction.  The §10.2.3 shorthand ``CONSTRUCT WHERE { bgp }``
        (no template) copies the matched pattern itself — the WHERE must
        then be a plain BGP."""
        self.eat_kw("CONSTRUCT")
        if self.at_kw("WHERE") or self.at_op("{") is False:
            # shorthand form: template := the WHERE pattern
            if self.at_kw("WHERE"):
                self.next()
            where = self.group_graph_pattern()
            template = TriplesBlock(
                self._plain_bgp_template(where, "CONSTRUCT WHERE"))
            limit = offset = None
            for _ in range(2):
                if self.at_kw("LIMIT"):
                    self.next()
                    limit = self._expect_int()
                elif self.at_kw("OFFSET"):
                    self.next()
                    offset = self._expect_int()
            self._end()
            return SelectQuery(variables="*", distinct=True, where=where,
                               limit=limit, offset=offset,
                               construct_template=template.patterns)
        template = TriplesBlock(self._template("CONSTRUCT"))
        from_graphs, from_named = self._dataset_clauses()
        if self.at_kw("WHERE"):
            self.next()
        where = self.group_graph_pattern()
        limit = offset = None
        for _ in range(2):
            if self.at_kw("LIMIT"):
                self.next()
                limit = self._expect_int()
            elif self.at_kw("OFFSET"):
                self.next()
                offset = self._expect_int()
        if self.peek()[0] != "EOF":
            self.fail("unexpected trailing syntax")
        return SelectQuery(variables="*", distinct=True, where=where,
                           limit=limit, offset=offset,
                           construct_template=template.patterns,
                           from_graphs=from_graphs, from_named=from_named)

    def _template(self, what: str) -> List[TriplePattern]:
        """'{' triples '}' — a template block: plain IRI/var/literal/bnode
        patterns only; property paths describe matching, not
        construction/deletion."""
        self.eat_op("{")
        template = TriplesBlock()
        while not self.at_op("}"):
            subj = self.term(position="subject")
            self._predicate_object_list(template, subj)
            if self.at_op("."):
                self.next()
        self.eat_op("}")
        if template.alts or any(isinstance(p, PATH_PREDS)
                                for _, p, _ in template.patterns):
            self.fail("property paths are not allowed in a %s template"
                      % what)
        if any(isinstance(t, Var) and t.name.startswith("_path")
               for pat in template.patterns for t in pat):
            self.fail("path sequences are not allowed in a %s template"
                      % what)
        if not template.patterns:
            self.fail("empty %s template" % what)
        return template.patterns

    def _check_ground(self, template: List[TriplePattern], what: str,
                      allow_bnodes: bool) -> None:
        for pat in template:
            for t in pat:
                if isinstance(t, Var):
                    self.fail("%s requires ground triples (no variables)"
                              % what)
                if isinstance(t, BNodeRef) and not allow_bnodes:
                    self.fail("blank nodes are not allowed in %s" % what)

    def _graph_ref(self, allow_markers: bool = False) -> str:
        """'GRAPH'? iri, or (when allowed) DEFAULT / NAMED / ALL."""
        if allow_markers:
            for marker in ("DEFAULT", "NAMED", "ALL"):
                if self.at_kw(marker):
                    self.next()
                    return marker
        if self.at_kw("GRAPH"):
            self.next()
        term = self.term(position="subject")
        if not isinstance(term, Iri):
            self.fail("expected a graph IRI")
        return term.uri

    def _manage_query(self) -> UpdateQuery:
        """Graph management: CLEAR/DROP (GRAPH iri | DEFAULT | NAMED |
        ALL), CREATE GRAPH iri, ADD/COPY/MOVE src TO dst, and
        LOAD doc-iri (INTO GRAPH iri)?."""
        _, op, _ = self.next()
        op = op.upper()
        silent = False
        if self.at_kw("SILENT"):
            self.next()
            silent = True
        if op == "LOAD":
            doc = self.term(position="subject")
            if not isinstance(doc, Iri):
                self.fail("expected a document IRI after LOAD")
            dst = "DEFAULT"
            if self.at_kw("INTO"):
                self.next()
                self.eat_kw("GRAPH")
                g = self.term(position="subject")
                if not isinstance(g, Iri):
                    self.fail("expected a graph IRI after INTO GRAPH")
                dst = g.uri
            self._end()
            return UpdateQuery(manage=GraphManage(op, src=doc.uri, dst=dst,
                                                  silent=silent))
        if op in ("CLEAR", "DROP"):
            src = self._graph_ref(allow_markers=True)
            self._end()
            return UpdateQuery(manage=GraphManage(op, src=src,
                                                  silent=silent))
        if op == "CREATE":
            self.eat_kw("GRAPH")
            term = self.term(position="subject")
            if not isinstance(term, Iri):
                self.fail("expected a graph IRI")
            self._end()
            return UpdateQuery(manage=GraphManage(op, src=term.uri,
                                                  silent=silent))
        # ADD / COPY / MOVE
        src = self._graph_ref(allow_markers=True)
        if src in ("NAMED", "ALL"):
            self.fail("%s source must be a graph IRI or DEFAULT" % op)
        self.eat_kw("TO")
        dst = self._graph_ref(allow_markers=True)
        if dst in ("NAMED", "ALL"):
            self.fail("%s destination must be a graph IRI or DEFAULT" % op)
        self._end()
        return UpdateQuery(manage=GraphManage(op, src=src, dst=dst,
                                              silent=silent))

    def _quad_template(self, what: str
                       ) -> Tuple[List[TriplePattern], List[Opt[str]]]:
        """'{' (triples | 'GRAPH' iri '{' triples '}')* '}' — a QUAD
        template: each pattern carries its graph label (None = the
        enclosing WITH graph / default graph).  Graph labels must be
        constant IRIs (variable graph targets in templates are not
        supported — fail loudly, don't mis-insert)."""
        self.eat_op("{")
        patterns: List[TriplePattern] = []
        graphs: List[Opt[str]] = []

        def collect(block: TriplesBlock, label: Opt[str]) -> None:
            if block.alts or any(isinstance(p, PATH_PREDS)
                                 for _, p, _ in block.patterns):
                self.fail("property paths are not allowed in a %s "
                          "template" % what)
            if any(isinstance(t, Var) and t.name.startswith("_path")
                   for pat in block.patterns for t in pat):
                self.fail("path sequences are not allowed in a %s "
                          "template" % what)
            patterns.extend(block.patterns)
            graphs.extend([label] * len(block.patterns))

        while not self.at_op("}"):
            if self.at_kw("GRAPH"):
                self.next()
                term = self.term(position="subject")
                if not isinstance(term, Iri):
                    self.fail("%s template GRAPH label must be a constant "
                              "IRI" % what)
                self.eat_op("{")
                inner = TriplesBlock()
                while not self.at_op("}"):
                    subj = self.term(position="subject")
                    self._predicate_object_list(inner, subj)
                    if self.at_op("."):
                        self.next()
                self.eat_op("}")
                collect(inner, term.uri)
                if self.at_op("."):
                    self.next()
                continue
            block = TriplesBlock()
            subj = self.term(position="subject")
            self._predicate_object_list(block, subj)
            if self.at_op("."):
                self.next()
            collect(block, None)
        self.eat_op("}")
        if not patterns:
            self.fail("empty %s template" % what)
        return patterns, graphs

    def _update_query(self) -> UpdateQuery:
        """SPARQL 1.1 Update, single operation:
        'INSERT'|'DELETE' 'DATA' QuadData
        | 'DELETE' 'WHERE' GroupGraphPattern
        | ('WITH' iri)? ('DELETE' QuadTpl)? ('INSERT' QuadTpl)?
          'WHERE' Group"""
        with_graph: Opt[str] = None
        if self.at_kw("WITH"):
            self.next()
            term = self.term(position="subject")
            if not isinstance(term, Iri):
                self.fail("WITH takes a graph IRI")
            with_graph = term.uri
            if not (self.at_kw("DELETE") or self.at_kw("INSERT")):
                self.fail("WITH must be followed by DELETE or INSERT")
        if self.at_kw("DELETE"):
            self.next()
            if self.at_kw("DATA"):
                if with_graph is not None:
                    self.fail("WITH is not allowed with DELETE DATA")
                self.next()
                tpl, graphs = self._quad_template("DELETE DATA")
                # spec §3.1.2: bnodes are scoped labels, meaningless to
                # delete by — disallowed
                self._check_ground(tpl, "DELETE DATA", allow_bnodes=False)
                self._end()
                return UpdateQuery(delete_template=tpl, data_form=True,
                                   delete_graphs=graphs)
            if self.at_kw("WHERE"):
                if with_graph is None:
                    self.next()
                    where = self.group_graph_pattern()
                    tpl = self._plain_bgp_template(where, "DELETE WHERE")
                    self._end()
                    return UpdateQuery(delete_template=tpl, where=where)
                self.fail("WITH requires an explicit DELETE template")
            delete_t, delete_g = self._quad_template("DELETE")
            self._no_template_bnodes(delete_t, "DELETE")
            insert_t = insert_g = None
            if self.at_kw("INSERT"):
                self.next()
                insert_t, insert_g = self._quad_template("INSERT")
            self.eat_kw("WHERE")
            where = self.group_graph_pattern()
            self._end()
            return UpdateQuery(delete_template=delete_t,
                               insert_template=insert_t, where=where,
                               delete_graphs=delete_g,
                               insert_graphs=insert_g,
                               with_graph=with_graph)
        self.eat_kw("INSERT")
        if self.at_kw("DATA"):
            if with_graph is not None:
                self.fail("WITH is not allowed with INSERT DATA")
            self.next()
            tpl, graphs = self._quad_template("INSERT DATA")
            # bnode labels in INSERT DATA are kept verbatim (deterministic;
            # the caller owns label freshness — documented deviation from
            # the spec's per-request relabeling)
            self._check_ground(tpl, "INSERT DATA", allow_bnodes=True)
            self._end()
            return UpdateQuery(insert_template=tpl, data_form=True,
                               insert_graphs=graphs)
        insert_t, insert_g = self._quad_template("INSERT")
        self.eat_kw("WHERE")
        where = self.group_graph_pattern()
        self._end()
        return UpdateQuery(insert_template=insert_t, where=where,
                           insert_graphs=insert_g, with_graph=with_graph)

    def _no_template_bnodes(self, template: List[TriplePattern],
                            what: str) -> None:
        if any(isinstance(t, BNodeRef) for pat in template for t in pat):
            self.fail("blank nodes are not allowed in a %s template" % what)

    def _plain_bgp_template(self, where: GroupPattern,
                            what: str) -> List[TriplePattern]:
        """DELETE WHERE's pattern doubles as the delete template: it must
        be a single plain BGP (no OPTIONAL/UNION/FILTER/paths/bnodes)."""
        if len(where.parts) != 1 or not isinstance(where.parts[0],
                                                   TriplesBlock):
            self.fail("%s takes a plain basic graph pattern" % what)
        block = where.parts[0]
        if block.alts or any(isinstance(p, PATH_PREDS)
                             for _, p, _ in block.patterns):
            self.fail("property paths are not allowed in %s" % what)
        if any(isinstance(t, Var) and t.name.startswith("_path")
               for pat in block.patterns for t in pat):
            self.fail("path sequences are not allowed in %s" % what)
        self._no_template_bnodes(block.patterns, what)
        return block.patterns

    def _end(self) -> None:
        if self.peek()[0] != "EOF":
            self.fail("unexpected trailing syntax")

    _AGG_FUNCS = ("COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE",
                  "GROUP_CONCAT")

    def _agg_select(self) -> AggSelect:
        """'(' AGG '(' 'DISTINCT'? (Var | '*')
               (';' 'SEPARATOR' '=' STRING)? ')' 'AS' Var ')'"""
        self.eat_op("(")
        kind, val, _ = self.next()
        if kind != "NAME" or val.upper() not in self._AGG_FUNCS:
            self.fail("expected aggregate function (%s)"
                      % "/".join(self._AGG_FUNCS))
        func = val.lower()
        self.eat_op("(")
        distinct = False
        if self.at_kw("DISTINCT"):
            self.next()
            distinct = True
        var: Opt[str] = None
        agg_expr: Opt[Expr] = None
        if self.at_op("*"):
            if func != "count":
                self.fail("* argument is only valid in COUNT")
            self.next()
        elif self.peek()[0] == "VAR" and \
                self.tokens[self.i + 1][:2] in (("OP", ")"), ("OP", ";")):
            var = self.next()[1][1:]
        else:
            # arbitrary expression argument: SUM(?a * ?b),
            # MIN(strlen(?n)), COUNT(coalesce(?x, ?y)), ...
            agg_expr = self.expr()
        separator = " "
        if self.at_op(";"):
            if func != "group_concat":
                self.fail("SEPARATOR is only valid in GROUP_CONCAT")
            self.next()
            self.eat_kw("SEPARATOR")
            self.eat_op("=")
            skind, sval, _ = self.next()
            if skind != "STRING":
                self.fail("expected separator string literal")
            separator = _unquote(sval)
        self.eat_op(")")
        self.eat_kw("AS")
        alias = self._expect_var()
        self.eat_op(")")
        return AggSelect(func=func, var=var, distinct=distinct, alias=alias,
                         separator=separator, expr=agg_expr)

    def _expect_var(self) -> str:
        kind, val, _ = self.next()
        if kind != "VAR":
            self.fail("expected variable")
        return val[1:]

    def _expect_int(self) -> int:
        kind, val, _ = self.next()
        if kind != "NUMBER" or not re.fullmatch(r"\d+", val):
            self.fail("expected non-negative integer")
        return int(val)

    def group_graph_pattern(self) -> GroupPattern:
        self.eat_op("{")
        group = GroupPattern()
        while not self.at_op("}"):
            if self.at_kw("FILTER"):
                self.next()
                if self.at_kw("EXISTS"):
                    self.next()
                    group.parts.append(
                        ExistsPattern(self.group_graph_pattern(), True))
                elif self.at_kw("NOT"):
                    self.next()
                    self.eat_kw("EXISTS")
                    group.parts.append(
                        ExistsPattern(self.group_graph_pattern(), False))
                else:
                    self.eat_op("(")
                    expr = self.expr()
                    self.eat_op(")")
                    group.parts.append(Filter(expr))
            elif self.at_kw("MINUS"):
                self.next()
                group.parts.append(MinusPattern(self.group_graph_pattern()))
            elif self.at_kw("VALUES"):
                self.next()
                group.parts.append(self._values_pattern())
            elif self.at_kw("BIND"):
                self.next()
                self.eat_op("(")
                expr = self.expr()
                self.eat_kw("AS")
                alias = self._expect_var()
                self.eat_op(")")
                group.parts.append(BindPattern(expr, alias))
            elif self.at_kw("OPTIONAL"):
                self.next()
                group.parts.append(OptionalPattern(self.group_graph_pattern()))
            elif self.at_kw("SERVICE"):
                # without this a SERVICE clause dies as a generic
                # "expected ..." — name the unsupported feature instead
                self.fail(
                    "SERVICE (federated query) is not supported: this "
                    "engine evaluates against its own triple relations; "
                    "ingest the remote data (read_rdf_directory / LOAD) "
                    "and query it as a named graph instead")
            elif self.at_kw("GRAPH"):
                self.next()
                gterm = self.term(position="subject")
                if not isinstance(gterm, (Iri, Var)):
                    self.fail("GRAPH name must be an IRI or a variable")
                group.parts.append(
                    NamedGraphPattern(gterm, self.group_graph_pattern()))
            elif self.at_op("{"):
                nxt = self.tokens[self.i + 1]
                if nxt[0] == "NAME" and nxt[1].upper() == "SELECT":
                    self.next()  # '{'
                    sub = SubSelect(self._select_body())
                    self.eat_op("}")
                    if self.at_kw("UNION"):
                        self.fail("a sub-select cannot be a UNION branch")
                    group.parts.append(sub)
                else:
                    branches = [self.group_graph_pattern()]
                    while self.at_kw("UNION"):
                        self.next()
                        branches.append(self.group_graph_pattern())
                    group.parts.append(UnionPattern(branches))
            else:
                block = self.triples_block()
                group.parts.append(block)
                # property-path alternations become UNION parts joined to
                # the rest of the group on their shared variables
                for branches in block.alts:
                    group.parts.append(UnionPattern(
                        [GroupPattern([TriplesBlock(b)]) for b in branches]))
                block.alts = []
            if self.at_op("."):
                self.next()
        self.eat_op("}")
        return group

    def _values_term(self) -> Opt[Term]:
        if self.at_kw("UNDEF"):
            self.next()
            return None
        term = self.term(position="object")
        if isinstance(term, Var):
            self.fail("VALUES data must be constant terms or UNDEF")
        return term

    def _values_pattern(self) -> ValuesPattern:
        """'VALUES' ( Var '{' Term* '}'
                    | '(' Var+ ')' '{' ( '(' Term* ')' )* '}' )"""
        variables: List[str] = []
        rows: List[List[Opt[Term]]] = []
        if self.peek()[0] == "VAR":
            variables.append(self.next()[1][1:])
            self.eat_op("{")
            while not self.at_op("}"):
                rows.append([self._values_term()])
            self.eat_op("}")
        else:
            self.eat_op("(")
            while self.peek()[0] == "VAR":
                variables.append(self.next()[1][1:])
            if not variables:
                self.fail("expected VALUES variables")
            self.eat_op(")")
            self.eat_op("{")
            while self.at_op("("):
                self.next()
                row: List[Opt[Term]] = []
                while not self.at_op(")"):
                    row.append(self._values_term())
                self.eat_op(")")
                if len(row) != len(variables):
                    self.fail("VALUES row arity %d != %d variables"
                              % (len(row), len(variables)))
                rows.append(row)
            self.eat_op("}")
        if len(set(variables)) != len(variables):
            self.fail("duplicate VALUES variable")
        return ValuesPattern(variables, rows)

    def triples_block(self) -> TriplesBlock:
        block = TriplesBlock()
        while True:
            subj = self.term(position="subject")
            self._predicate_object_list(block, subj)
            if self.at_op("."):
                self.next()
                kind, val, _ = self.peek()
                if kind in ("VAR", "IRIREF", "PNAME", "BNODE") or \
                        (kind == "NAME" and val == "a"):
                    continue
            break
        return block

    def _predicate_object_list(self, block: TriplesBlock, subj: Term) -> None:
        while True:
            if self.peek()[0] == "VAR":
                branches = [[("fwd", Iri(""))]]  # placeholder, replaced below
                pred_var: Opt[Term] = Var(self.next()[1][1:])
            else:
                pred_var = None
                branches = self.parse_path()
            while True:
                obj = self.term(position="object")
                if pred_var is not None:
                    block.patterns.append((subj, pred_var, obj))
                elif len(branches) == 1:
                    block.patterns.extend(
                        self._expand_steps(subj, branches[0], obj))
                else:
                    block.alts.append(
                        [self._expand_steps(subj, b, obj) for b in branches])
                if self.at_op(","):
                    self.next()
                    continue
                break
            if self.at_op(";"):
                self.next()
                # allow trailing ';' before '.' or '}'
                kind, val, _ = self.peek()
                if kind in ("VAR", "IRIREF", "PNAME") or \
                        (kind == "NAME" and val == "a") or self.at_op("^"):
                    continue
            break

    # -- property paths --
    def parse_path(self) -> List[List[tuple]]:
        """Path := Seq ('|' Seq)*; returns DNF branches, each a step list.
        A step is ('fwd', Iri) / ('inv', Iri) / ('plus', (uri, ...));
        parenthesized groups (('alt', branches) placeholders from
        ``_path_elt``) are distributed over the sequence — cross-product
        expansion, so ``a/(b|c)/d`` becomes two branches."""
        branches = [self._path_seq()]
        while self.at_op("|"):
            self.next()
            branches.append(self._path_seq())
        out: List[List[tuple]] = []
        for br in branches:
            out.extend(self._path_dnf(br))
        return out

    def _path_dnf(self, steps: List[tuple]) -> List[List[tuple]]:
        acc: List[List[tuple]] = [[]]
        for step in steps:
            if step[0] == "alt":
                acc = [prefix + expansion
                       for prefix in acc
                       for sub in step[1]
                       for expansion in self._path_dnf(sub)]
            else:
                acc = [prefix + [step] for prefix in acc]
        return acc

    def _path_seq(self) -> List[tuple]:
        steps = [self._path_elt()]
        while self.at_op("/"):
            self.next()
            steps.append(self._path_elt())
        return steps

    _QUANT_TAG = {"+": "plus", "*": "star", "?": "opt"}

    def _path_quantifier(self) -> Opt[str]:
        """Consume a trailing path quantifier (+ * ?) if present and
        return its step tag."""
        for op, tag in self._QUANT_TAG.items():
            if self.at_op(op):
                self.next()
                return tag
        return None

    def _quant_group(self, inner: List[List[tuple]], quant: str,
                     inverse: bool) -> Tuple[tuple, tuple]:
        """Normalize the group a quantifier applies to into
        ``(preds, branches)``: an alternation of bare IRIs folds to the
        ``preds`` fast path (one predicate-set filter), any other
        ``|``/``/``/``^`` combination becomes DNF ``branches`` of
        ('fwd'|'inv', iri) steps.  ``^(group)quant`` inverts every
        branch (reverse the step order, flip each step's direction) —
        the closure of reversed edges IS the reversed closure.  Nested
        quantifiers and negated sets stay unsupported."""
        branches = []
        for br in inner:
            steps = []
            for step in br:
                if step[0] == "fwd":
                    steps.append(("fwd", step[1].uri))
                elif step[0] == "inv":
                    steps.append(("inv", step[1].uri))
                elif step[0] == "neg":
                    steps.append(("negf", step[1]))
                elif step[0] == "neg_inv":
                    steps.append(("negi", step[1]))
                else:
                    self.fail(
                        "%s applies to |, / , ^ and ! combinations "
                        "only (no nested quantifiers)" % quant)
            branches.append(tuple(steps))
        if inverse:
            flip = {"fwd": "inv", "inv": "fwd",
                    "negf": "negi", "negi": "negf"}
            branches = [tuple((flip[d], u) for d, u in reversed(br))
                        for br in branches]
        if all(len(br) == 1 and br[0][0] == "fwd"
               and isinstance(br[0][1], str) for br in branches):
            return tuple(br[0][1] for br in branches), ()
        return (), tuple(branches)

    def _negated_set_elt(self, inverse: bool) -> tuple:
        """Parse a negated property set (the ``!`` is already consumed)
        into its step/alt/closure tuple.  ``inverse`` applies an outer
        ``^``: inverting an NPS swaps every member's direction
        (``^!(p|^q)`` ≡ ``!(^p|q)``), so the member lists just trade
        places before the usual desugaring."""
        fwd: List[str] = []
        inv: List[str] = []

        def member():
            if self.at_op("^"):
                self.next()
                inv.append(self._path_iri().uri)
            else:
                fwd.append(self._path_iri().uri)

        if self.at_op("("):
            self.next()
            member()
            while self.at_op("|"):
                self.next()
                member()
            self.eat_op(")")
        else:
            member()
        if inverse:
            fwd, inv = inv, fwd
        tag = self._path_quantifier()
        if tag is not None:
            # !(...)+ / * / ? — SS18.4 PathPrimary includes NPS, so
            # the quantifier closes over the COMPLEMENT edge
            # relation: forward-complement edges union
            # inverse-complement edges (branch union), then the
            # ordinary closure machinery
            nbr = []
            if fwd:
                nbr.append((("negf", tuple(fwd)),))
            if inv:
                nbr.append((("negi", tuple(inv)),))
            return (tag, (), tuple(nbr))
        # §18.4: !(p1|..|^q1|..) = NPS{p} union ^NPS{q}; a component
        # is present only when its member list is non-empty.  The
        # inverse component is the same NegatedSet pattern with the
        # endpoint terms swapped (exactly how plain ^iri steps
        # desugar), and the mixed form rides the existing alt-DNF
        # expansion so each component compiles as its own branch.
        if fwd and inv:
            return ("alt", [[("neg", tuple(fwd))],
                            [("neg_inv", tuple(inv))]])
        if inv:
            return ("neg_inv", tuple(inv))
        return ("neg", tuple(fwd))

    def _path_elt(self) -> tuple:
        if self.at_op("*"):
            self.fail("a path element cannot start with '*'")
        if self.at_op("!"):
            self.next()
            return self._negated_set_elt(False)
        inverse = False
        if self.at_op("^"):
            self.next()
            inverse = True
            if self.at_op("!"):
                # ^!set — PathEltOrInverse over an NPS PathPrimary
                self.next()
                return self._negated_set_elt(True)
        if self.at_op("("):
            self.next()
            inner = self.parse_path()
            self.eat_op(")")
            tag = self._path_quantifier()
            if tag is not None:
                preds, branches = self._quant_group(inner, tag, inverse)
                return (tag, preds, branches)
            if len(inner) == 1 and len(inner[0]) == 1:
                step = inner[0][0]
                if inverse:
                    if step[0] == "fwd":
                        return ("inv", step[1])
                    if step[0] == "neg":
                        return ("neg_inv", step[1])
                    if step[0] == "neg_inv":
                        return ("neg", step[1])
                    self.fail("cannot invert this path element")
                return step
            if inverse:
                self.fail("inverse of a parenthesized path group is not "
                          "supported")
            # bare group: expanded into DNF branches by parse_path
            return ("alt", inner)
        iri = self._path_iri()
        tag = self._path_quantifier()
        if tag is not None:
            if inverse:
                # ^p+ = (^p)+: closure over the reversed edge set
                return (tag, (), ((("inv", iri.uri),),))
            return (tag, (iri.uri,), ())
        return ("inv", iri) if inverse else ("fwd", iri)

    def _path_iri(self) -> Iri:
        kind, val, pos = self.next()
        if kind == "IRIREF":
            return Iri(val[1:-1])
        if kind == "PNAME":
            ns, _, local = val.partition(":")
            if ns not in self.prefixes:
                raise SparqlSyntaxError(
                    "undeclared prefix %r at offset %d" % (ns, pos))
            return Iri(self.prefixes[ns] + local)
        if kind == "NAME" and val == "a":
            return Iri(RDF_TYPE)
        raise SparqlSyntaxError(
            "expected path IRI at offset %d (got %s %r)" % (pos, kind, val))

    def _expand_steps(self, subj: Term, steps: List[tuple],
                      obj: Term) -> List[TriplePattern]:
        """Desugar a step sequence into chained patterns over fresh
        internal variables (?_pathN — excluded from SELECT *)."""
        pats: List[TriplePattern] = []
        cur = subj
        for idx, step in enumerate(steps):
            if idx == len(steps) - 1:
                nxt: Term = obj
            else:
                nxt = Var("_path%d" % self._fresh)
                self._fresh += 1
            tag = step[0]
            if tag == "fwd":
                pats.append((cur, step[1], nxt))
            elif tag == "inv":
                pats.append((nxt, step[1], cur))
            elif tag == "neg":
                pats.append((cur, NegatedSet(step[1]), nxt))
            elif tag == "neg_inv":
                # !^q between cur and nxt = !q from nxt to cur
                pats.append((nxt, NegatedSet(step[1]), cur))
            elif tag == "star":
                pats.append((cur, PathStar(step[1], step[2]), nxt))
            elif tag == "opt":
                pats.append((cur, PathOpt(step[1], step[2]), nxt))
            else:  # plus
                pats.append((cur, PathPlus(step[1], step[2]), nxt))
            cur = nxt
        return pats

    def term(self, position: str) -> Term:
        kind, val, pos = self.next()
        if kind == "VAR":
            return Var(val[1:])
        if kind == "IRIREF":
            return Iri(val[1:-1])
        if kind == "PNAME":
            ns, _, local = val.partition(":")
            if ns not in self.prefixes:
                raise SparqlSyntaxError(
                    "undeclared prefix %r at offset %d" % (ns, pos))
            return Iri(self.prefixes[ns] + local)
        if kind == "NAME" and val == "a" and position == "predicate":
            return Iri(RDF_TYPE)
        if kind == "BNODE" and position != "predicate":
            return BNodeRef(val)
        if kind == "STRING" and position in ("object", "subject"):
            text = _unquote(val)
            nkind, nval, _ = self.peek()
            if nkind == "LANGTAG":
                self.next()
                return Lit(text, lang=nval[1:].lower())
            if nkind == "DTYPE":
                self.next()
                dkind, dval, _ = self.next()
                if dkind == "IRIREF":
                    return Lit(text, dtype=dval[1:-1])
                if dkind == "PNAME":
                    ns, _, local = dval.partition(":")
                    if ns not in self.prefixes:
                        self.fail("undeclared prefix %r" % ns)
                    return Lit(text, dtype=self.prefixes[ns] + local)
                self.fail("expected datatype IRI")
            return Lit(text)
        if kind == "NUMBER" and position in ("object", "subject"):
            return Lit(val, dtype="http://www.w3.org/2001/XMLSchema#decimal"
                       if "." in val else
                       "http://www.w3.org/2001/XMLSchema#integer")
        raise SparqlSyntaxError(
            "expected %s term at offset %d (got %s %r)"
            % (position, pos, kind, val))

    # -- expressions --
    def _reject_iri_call(self, iri: str):
        """An IRI followed by ``(`` in an expression is a §17.5 XPath
        constructor cast (``xsd:integer(?x)``) or an extension
        function — neither is supported (casts presuppose datatyped
        literals; the term model is datatype-less).  Name the feature
        instead of dying on a generic 'expected expression' (the
        SERVICE rejection pattern)."""
        if self.at_op("("):
            self.fail(
                "IRI function call <%s>(...) is not supported: XPath "
                "constructor casts and extension functions presuppose "
                "datatyped literals, and the term model is "
                "datatype-less (reference parity); use the built-in "
                "§17.4 functions instead" % iri)

    def expr(self) -> Expr:
        return self._or_expr()

    def _or_expr(self) -> Expr:
        parts = [self._and_expr()]
        while self.at_op("||"):
            self.next()
            parts.append(self._and_expr())
        return parts[0] if len(parts) == 1 else BoolOp("or", tuple(parts))

    def _and_expr(self) -> Expr:
        parts = [self._cmp_expr()]
        while self.at_op("&&"):
            self.next()
            parts.append(self._cmp_expr())
        return parts[0] if len(parts) == 1 else BoolOp("and", tuple(parts))

    def _cmp_expr(self) -> Expr:
        left = self._additive_expr()
        for op in ("=", "!=", "<=", ">=", "<", ">"):
            if self.at_op(op):
                self.next()
                right = self._additive_expr()
                return Cmp(op, left, right)
        # IN / NOT IN desugar per spec (§17.4.1.9/.10): IN -> OR of
        # equalities, NOT IN -> AND of inequalities
        if self.at_kw("IN"):
            self.next()
            items = self._expr_list()
            if not items:
                return Cmp("!=", Num(0.0, "0"), Num(0.0, "0"))  # false
            parts = tuple(Cmp("=", left, it) for it in items)
            return parts[0] if len(parts) == 1 else BoolOp("or", parts)
        if self.at_kw("NOT"):
            save = self.i
            self.next()
            if not self.at_kw("IN"):
                self.i = save
                return left
            self.next()
            items = self._expr_list()
            if not items:
                return Cmp("=", Num(0.0, "0"), Num(0.0, "0"))  # true
            parts = tuple(Cmp("!=", left, it) for it in items)
            return parts[0] if len(parts) == 1 else BoolOp("and", parts)
        return left

    def _expr_list(self) -> List[Expr]:
        self.eat_op("(")
        items: List[Expr] = []
        if not self.at_op(")"):
            items.append(self.expr())
            while self.at_op(","):
                self.next()
                items.append(self.expr())
        self.eat_op(")")
        return items

    def _additive_expr(self) -> Expr:
        left = self._mult_expr()
        while True:
            if self.at_op("+") or self.at_op("-"):
                op = self.next()[1]
                left = Arith(op, left, self._mult_expr())
            elif self.peek()[0] == "NUMBER" and self.peek()[1][0] in "+-":
                # signed-literal juxtaposition (SPARQL grammar's
                # NumericLiteralPositive/Negative): ``?x -3`` == ``?x - 3``
                _, val, _ = self.next()
                left = Arith(val[0], left,
                             Num(abs(float(val)), val.lstrip("+-")))
            else:
                return left

    def _mult_expr(self) -> Expr:
        left = self._unary_expr()
        while self.at_op("*") or self.at_op("/"):
            op = self.next()[1]
            left = Arith(op, left, self._unary_expr())
        return left

    def _unary_expr(self) -> Expr:
        if self.at_op("!"):
            self.next()
            return NotExpr(self._unary_expr())
        return self._primary()

    def _primary(self) -> Expr:
        kind, val, pos = self.peek()
        if kind == "OP" and val == "(":
            self.next()
            e = self.expr()
            self.eat_op(")")
            return e
        if kind == "VAR":
            self.next()
            return Var(val[1:])
        if kind == "IRIREF":
            self.next()
            self._reject_iri_call(val[1:-1])
            return Iri(val[1:-1])
        if kind == "PNAME":
            self.next()
            ns, _, local = val.partition(":")
            if ns not in self.prefixes:
                raise SparqlSyntaxError(
                    "undeclared prefix %r at offset %d" % (ns, pos))
            self._reject_iri_call(self.prefixes[ns] + local)
            return Iri(self.prefixes[ns] + local)
        if kind == "STRING":
            self.next()
            text = _unquote(val)
            nkind, nval, _ = self.peek()
            if nkind == "LANGTAG":
                self.next()
                return Lit(text, lang=nval[1:].lower())
            return Lit(text)
        if kind == "NUMBER":
            self.next()
            return Num(float(val), val)
        if kind == "NAME" and val.upper() in self._AGG_FUNCS \
                and self._in_having is not None:
            # inline HAVING aggregate: register under a hidden alias and
            # reference it like any aggregate alias
            func = val.lower()
            self.next()
            self.eat_op("(")
            distinct = False
            if self.at_kw("DISTINCT"):
                self.next()
                distinct = True
            var: Opt[str] = None
            agg_expr: Opt[Expr] = None
            if self.at_op("*"):
                if func != "count":
                    self.fail("* argument is only valid in COUNT")
                self.next()
            elif self.peek()[0] == "VAR" and \
                    self.tokens[self.i + 1][:2] == ("OP", ")"):
                var = self.next()[1][1:]
            else:
                agg_expr = self.expr()
            self.eat_op(")")
            alias = "_hav%d" % len(self._in_having)
            self._in_having.append(AggSelect(
                func=func, var=var, distinct=distinct, alias=alias,
                expr=agg_expr))
            return Var(alias)
        if kind == "NAME" and val.lower() == "strdt":
            # name the unsupported feature instead of a generic parse
            # error (the SERVICE pattern): STRDT constructs a
            # datatype-tagged literal, which the datatype-less term
            # model (reference meresco/rdf Literal: language only)
            # cannot represent
            self.fail(
                "STRDT is not supported: the term model is "
                "datatype-less (reference parity — Literal carries a "
                "language tag only); use STRLANG for language-tagged "
                "literals or a plain literal")
        if kind == "NAME" and val.lower() in _FUNC_NAMES:
            fname = val.lower()
            if fname == "isiri":
                fname = "isuri"  # isIRI is a synonym (SPARQL 1.1 §17.4.2.1)
            self.next()
            self.eat_op("(")
            args = []
            if not self.at_op(")"):  # NOW()/UUID()/RAND()/BNODE() are 0-ary
                args.append(self.expr())
                while self.at_op(","):
                    self.next()
                    args.append(self.expr())
            self.eat_op(")")
            return FuncCall(fname, tuple(args))
        raise SparqlSyntaxError(
            "expected expression at offset %d (got %s %r)" % (pos, kind, val))


def parse_query(text: str) -> Union[SelectQuery, UpdateQuery]:
    """Parse a SPARQL query/update string into the AST consumed by
    ``compiler.sparql_select`` (and siblings) or ``sparql_update``."""
    return _Parser(text).parse()
