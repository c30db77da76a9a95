"""ES ``query_string`` — the classic Lucene query parser as the
engine's full-syntax interactive front door.

Where ``simple_query_string`` (operators/querystring.py) is the
forgiving mini language parsed IN-PLAN, ``query_string`` is the full
classic grammar: fields, AND/OR/NOT (&&, ||, !), +/- prefixes,
parenthesized groups, quoted phrases with ``~slop``, prefix ``term*``,
wildcard ``te?m*``, fuzzy ``term~N``, regexp ``/re/``, ranges
``field:[a TO b]`` / ``{a TO b}``, and per-clause boosts ``^2``. The
reference delegates this DSL to its ES indexes
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10).

Parsing happens on the DRIVER under the collect contract (interactive
query strings; the in-plan distributed parse remains
simple_query_string's job — its grammar is regular, this one is not).
EXECUTION is fully batched and relational: however many query strings
arrive, the engine runs

- ONE ``match_scores`` call for every term clause of every query
  (composite ``qid|node`` uid — the compound/dis_max idiom),
- ONE ``phrase_hits_index`` call per DISTINCT slop value,
- ONE expansion join per multi-term kind (prefix / wildcard / fuzzy /
  regexp) against the (term, df) dictionary, constant-score rewrite,
- ONE doc-values scan for every range clause,

and folds the boolean trees bottom-up BY DEPTH: all nodes of all
queries at depth d combine into their parents with ONE groupBy per
level (node metadata rides a broadcast table), so a 200-string batch
with 3-level trees costs 3 shuffles, not 600 plans.

Boolean semantics are Lucene's documented classic-parser behavior
(QueryParserBase.addClause): a bare clause takes the default operator
(``should`` under OR, ``must`` under AND); ``AND`` promotes BOTH its
neighbors to must (unless explicitly signed); ``OR`` demotes the
following clause to should; ``NOT`` / ``-`` make must_not; ``+``
forces must. A bool with no must clauses needs >= 1 matching should
(the BooleanQuery rule); must_not never matches alone (Lucene's
pure-negative contract: no hits). Scoring is the BM25 sum of matching
positive clauses times the clause boosts — identical math to the
engine's gated bool/compound operators, so a plain ``a b`` string
scores exactly like the match query (tested).

Documented divergences: multi-term clauses (prefix/wildcard/fuzzy/
regexp) use the CONSTANT_SCORE rewrite (1.0 x boost per matching doc
— Lucene's default for wildcards; its fuzzy blended-frequency rewrite
is the standalone ``fuzzy_search_index``'s job); a term whose analysis
yields several tokens becomes a should-group (Lucene generates a
position-aware graph query); field names other than the default text
field are doc-values fields and accept equality and range clauses
(constant score 1.0 — ES filter-context semantics).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.operators.topk import topk_per_group

__all__ = [
    "parse_query_string",
    "query_string_search_index",
    "QSNode",
]

DEFAULT_FIELD = "text"


@dataclass
class QSNode:
    """One parsed node. kind in {'term','phrase','prefix','wildcard',
    'fuzzy','regexp','range','fieldterm','bool'}."""

    kind: str
    text: str | None = None
    field: str | None = None
    slop: int = 0
    max_edits: int = 2
    lo: str | None = None
    hi: str | None = None
    lo_incl: bool = True
    hi_incl: bool = True
    boost: float = 1.0
    clauses: list = dc_field(default_factory=list)  # [(occur, QSNode)]


_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<lparen>\() | (?P<rparen>\)) |
      (?P<and>AND\b|&&) | (?P<or>OR\b|\|\|) | (?P<not>NOT\b|!) |
      (?P<plus>\+) | (?P<minus>-) |
      (?P<phrase>"(?:[^"\\]|\\.)*") |
      (?P<regexp>/(?:[^/\\]|\\.)+/) |
      (?P<lbracket>[\[{]) | (?P<rbracket>[\]}]) |
      (?P<to>TO\b) |
      (?P<colon>:) |
      (?P<caret>\^(?P<boostval>[0-9]+(?:\.[0-9]+)?)) |
      (?P<tilde>~(?P<tildeval>[0-9]+(?:\.[0-9]+)?)?) |
      (?P<term>(?:[^\s()\[\]{}:^~"+\-!/\\]|\\.)(?:[^\s()\[\]{}:^~"\\]|\\.)*)
    )""",
    re.X,
)
# term first-char excludes the operator characters (+ - ! /) so clause
# prefixes lex as operators, but SUBSEQUENT chars allow them — a
# mid-term hyphen ("foo-bar") stays one term, the Lucene lexer rule


def _lex(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m or m.end() == m.start():
            if s[i:].strip() == "":
                break
            raise ValueError(f"query_string: cannot lex at {s[i:]!r}")
        i = m.end()
        kind = m.lastgroup if m.lastgroup not in ("boostval", "tildeval") else None
        for k in ("lparen", "rparen", "and", "or", "not", "plus", "minus",
                  "phrase", "regexp", "lbracket", "rbracket", "to", "colon",
                  "caret", "tilde", "term"):
            if m.group(k):
                if k == "caret":
                    out.append(("caret", m.group("boostval")))
                elif k == "tilde":
                    out.append(("tilde", m.group("tildeval") or ""))
                else:
                    out.append((k, m.group(k)))
                break
    return out


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


class _Parser:
    def __init__(self, tokens: list, default_operator: str):
        self.toks = tokens
        self.i = 0
        self.default_occur = "must" if default_operator == "and" else "should"

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    # ---- grammar ------------------------------------------------------

    def parse(self) -> QSNode:
        node = self.parse_bool()
        if self.peek()[0] is not None:
            raise ValueError(
                f"query_string: unexpected token {self.peek()[1]!r}"
            )
        return node

    def parse_bool(self) -> QSNode:
        """One parenthesis level -> a bool node, with Lucene's
        classic-parser clause/occur algorithm (module docstring)."""
        clauses: list = []  # [occur, node, explicit_sign]
        pending_conj = None  # 'and' | 'or' | None
        while True:
            k, v = self.peek()
            if k in (None, "rparen"):
                break
            if k in ("and", "or"):
                self.take()
                pending_conj = k
                continue
            sign = None
            if k in ("plus", "minus", "not"):
                self.take()
                sign = "must" if k == "plus" else "must_not"
                k, v = self.peek()
                if k in (None, "rparen"):
                    raise ValueError("query_string: dangling +/-/NOT")
            node = self.parse_clause()
            if sign is not None:
                occur = sign
            elif pending_conj == "and":
                occur = "must"
            elif pending_conj == "or":
                occur = "should"
            else:
                occur = self.default_occur
            # Lucene: AND promotes the PREVIOUS clause too, unless it
            # was explicitly signed
            if pending_conj == "and" and clauses and not clauses[-1][2]:
                if clauses[-1][0] == "should":
                    clauses[-1][0] = "must"
            clauses.append([occur, node, sign is not None])
            pending_conj = None
        if not clauses:
            raise ValueError("query_string: empty query")
        if len(clauses) == 1 and clauses[0][0] in ("should", "must"):
            return clauses[0][1]
        b = QSNode(kind="bool")
        b.clauses = [(occ, n) for occ, n, _ in clauses]
        return b

    def parse_clause(self) -> QSNode:
        k, v = self.peek()
        if k == "lparen":
            self.take()
            node = self.parse_bool()
            if self.take()[0] != "rparen":
                raise ValueError("query_string: unbalanced parentheses")
            return self._suffix(node, allow_fuzzy=False)
        field = None
        if k == "term" and self.i + 1 < len(self.toks) and self.toks[self.i + 1][0] == "colon":
            field = _unescape(v)
            self.take()
            self.take()
            k, v = self.peek()
            if k == "lparen":
                self.take()
                node = self.parse_bool()
                if self.take()[0] != "rparen":
                    raise ValueError("query_string: unbalanced parentheses")
                _set_field(node, field)
                return self._suffix(node, allow_fuzzy=False)
        return self._suffix(self.parse_atom(field), allow_fuzzy=True)

    def parse_atom(self, field: str | None) -> QSNode:
        k, v = self.take()
        if k == "phrase":
            return QSNode(kind="phrase", text=_unescape(v[1:-1]), field=field)
        if k == "regexp":
            return QSNode(kind="regexp", text=_unescape(v[1:-1]), field=field)
        if k == "lbracket":
            lo_incl = v == "["
            lo = self._range_value()
            if self.take()[0] != "to":
                raise ValueError("query_string: range needs TO")
            hi = self._range_value()
            rk, rv = self.take()
            if rk != "rbracket":
                raise ValueError("query_string: unterminated range")
            return QSNode(
                kind="range", field=field, lo=lo, hi=hi,
                lo_incl=lo_incl, hi_incl=rv == "]",
            )
        if k == "term":
            text = _unescape(v)
            if "*" in v or "?" in v:
                if v.endswith("*") and "*" not in v[:-1] and "?" not in v:
                    return QSNode(kind="prefix", text=text[:-1], field=field)
                return QSNode(kind="wildcard", text=text, field=field)
            return QSNode(kind="term", text=text, field=field)
        raise ValueError(f"query_string: unexpected {v!r}")

    def _range_value(self) -> str | None:
        k, v = self.take()
        if k != "term":
            raise ValueError(f"query_string: bad range endpoint {v!r}")
        s = _unescape(v)
        return None if s == "*" else s

    def _suffix(self, node: QSNode, allow_fuzzy: bool) -> QSNode:
        while True:
            k, v = self.peek()
            if k == "tilde":
                self.take()
                if node.kind == "phrase":
                    node.slop = int(float(v)) if v else 2
                elif node.kind == "term" and allow_fuzzy:
                    node = QSNode(
                        kind="fuzzy", text=node.text, field=node.field,
                        max_edits=int(float(v)) if v else 2, boost=node.boost,
                    )
                else:
                    raise ValueError("query_string: ~ only after a term or phrase")
            elif k == "caret":
                self.take()
                node.boost = float(v)
            else:
                return node


def _set_field(node: QSNode, field: str) -> None:
    if node.kind == "bool":
        for _, c in node.clauses:
            _set_field(c, field)
    elif node.field is None:
        node.field = field


def parse_query_string(s: str, default_operator: str = "or") -> QSNode:
    """Query string -> AST. ``default_operator``: 'or' | 'and'."""
    if default_operator not in ("or", "and"):
        raise ValueError(f"default_operator must be or|and, got {default_operator!r}")
    return _Parser(_lex(s), default_operator).parse()


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------


def _analyze_node(node: QSNode, tok, default_field: str) -> QSNode | None:
    """Analyze term/phrase texts with the index analyzer; drop clauses
    that analyze to nothing; split multi-token terms into a
    should-group (module docstring)."""
    if node.kind == "bool":
        kept = []
        for occ, c in node.clauses:
            a = _analyze_node(c, tok, default_field)
            if a is not None:
                kept.append((occ, a))
        if not kept:
            return None
        node.clauses = kept
        return node
    if node.kind in ("range",):
        if node.field is None or node.field == default_field:
            raise ValueError(
                "query_string: range clauses need a doc-values field "
                f"(got field {node.field!r})"
            )
        return node
    if node.field is not None and node.field != default_field:
        if node.kind != "term":
            raise ValueError(
                f"query_string: field {node.field!r} is a doc-values field — "
                f"only equality and ranges apply, not {node.kind}"
            )
        return node  # doc-values equality
    if node.kind == "term":
        toks = tok(node.text or "")
        if not toks:
            return None
        if len(toks) == 1:
            node.text = toks[0]
            return node
        group = QSNode(kind="bool", boost=node.boost)
        group.clauses = [
            ("should", QSNode(kind="term", text=t, field=node.field))
            for t in toks
        ]
        return group
    if node.kind == "phrase":
        toks = tok(node.text or "")
        if not toks:
            return None
        node.text = " ".join(toks)
        return node
    if node.kind == "fuzzy":
        toks = tok(node.text or "")
        if len(toks) != 1:
            raise ValueError(f"query_string: fuzzy needs one token, got {toks}")
        node.text = toks[0]
        return node
    # prefix / wildcard / regexp: used verbatim (dictionary-level)
    return node


def _collect_nodes(node: QSNode, qid, nid_box: list, parent_uid, depth: int,
                   rows: list, occur: str | None = None) -> str:
    """Assign uids, flatten the tree into metadata rows:
    (uid, qid, parent_uid, depth, occur-within-parent, kind, boost,
    n_must, n_should)."""
    uid = f"{qid}\x1f{nid_box[0]}"
    nid_box[0] += 1
    if node.kind == "bool":
        n_must = sum(1 for occ, _ in node.clauses if occ == "must")
        n_should = sum(1 for occ, _ in node.clauses if occ == "should")
    else:
        n_must = n_should = 0
    rows.append(
        {
            "uid": uid, "qid": qid, "parent": parent_uid, "depth": depth,
            "kind": node.kind, "boost": node.boost,
            "n_must": n_must, "n_should": n_should, "node": node,
            "occur": occur,
        }
    )
    if node.kind == "bool":
        for occ, c in node.clauses:
            _collect_nodes(c, qid, nid_box, uid, depth + 1, rows, occ)
    return uid


def _flat_bool_clauses(ast) -> list | None:
    """Detect the FLAT query_string shape the bool-bitmap kernel serves:
    a depth-1 boost-free bool whose clauses are single-token term /
    phrase leaves on the default field, with >= 1 positive clause.
    -> [(occur, kind, text, slop)] or None. Multi-token terms (analyzed
    should-groups), boosts, fields, multi-term expansions, ranges, and
    nested groups stay on the general by-depth executor; pure-negative
    queries too (their no-hits contract is the general fold's)."""
    if ast is None or ast.kind != "bool" or ast.boost != 1.0:
        return None
    out = []
    positives = 0
    for occur, child in ast.clauses:
        if occur not in ("must", "should", "must_not"):
            return None
        if child.kind not in ("term", "phrase"):
            return None
        if child.field not in (None, DEFAULT_FIELD) or child.boost != 1.0:
            return None
        if child.kind == "term" and (not child.text or " " in child.text):
            return None
        if occur != "must_not":
            positives += 1
        out.append((occur, child.kind, child.text, int(child.slop)))
    if positives == 0 or not out:
        return None
    return out


def _flat_bool_execute(
    spark: SparkSession,
    path: str,
    flat: list,
    qid_type: str,
    k: int,
    term_stats: DataFrame | None,
) -> DataFrame:
    """Execute flat query_string queries on the bool bitmap kernel —
    the ``simple_query_string_cogroup`` spelling: term clauses compile
    into ``bool_search_index_cogroup``'s one-pass TAAT (<= k rows per
    (query, segment) out), phrase clauses score in the positional
    kernel and enter as scored doc-bit rows. Value-identical to the
    general by-depth fold on this shape (tested): same leaf scores
    (BM25 term / phrase pseudo-term), same Lucene bool rule (no musts
    -> >= 1 should), same must_not exclusion, rounding at the ranking
    window either way. ``flat``: [(qid, [(occur, kind, text, slop)])]."""
    from sgpt_spark.operators.boolquery import bool_search_index_cogroup
    from sgpt_spark.operators.indexer import read_index
    from sgpt_spark.operators.positions import phrase_hits_index_cogroup

    postings, meta = read_index(spark, path)
    term_rows, ph_rows = [], []
    for qid, clauses in flat:
        for cid, (occur, kind, text, slop) in enumerate(clauses):
            if kind == "term":
                term_rows.append((qid, occur, text))
            else:
                ph_rows.append((qid, cid, occur, text, slop))
    term_cl = spark.createDataFrame(
        term_rows, f"qid {qid_type}, occur string, query string"
    )
    scored = None
    hits = None
    if ph_rows:
        scored = spark.createDataFrame(
            [(q, o, str(c)) for q, c, o, _, _ in ph_rows],
            f"qid {qid_type}, occur string, key string",
        )
        by_slop: dict[int, list] = {}
        for q, c, o, text, slop in ph_rows:
            by_slop.setdefault(slop, []).append((f"{c}\x1f{q}", text))
        for s_v in sorted(by_slop):
            h, _ = phrase_hits_index_cogroup(
                spark, path, by_slop[s_v], term_stats=term_stats,
                with_segment=True, slop=s_v,
            )
            hits = h if hits is None else hits.unionByName(h)
        key_c = F.substring_index(F.col("qid"), "\x1f", 1)
        real_qid = F.substring(
            F.col("qid"),
            (F.length(key_c) + F.lit(2)).cast("int"),
            F.length(F.col("qid")).cast("int"),
        ).cast(qid_type)
        hits = hits.select(
            real_qid.alias("qid"), key_c.alias("key"), "segment",
            "doc_id", "score",
        )
    return bool_search_index_cogroup(
        spark, postings, meta, term_cl, k=k, term_stats=term_stats,
        minimum_should_match=None, scored=scored, scored_hits=hits,
    )


def query_string_search_index(
    spark: SparkSession,
    path: str,
    queries,
    default_operator: str = "or",
    docvalues: DataFrame | None = None,
    k: int = 10,
    term_stats: DataFrame | None = None,
    max_expansions: int = 50,
    strategy: str | None = None,
) -> DataFrame:
    """ES ``query_string`` over a persisted positional index ->
    (qid, doc_id, score, rank). ``queries``: (qid, query_string) rows.
    ``docvalues``: (doc_id, field...) sidecar for field-scoped
    equality/range clauses (optional). See the module docstring for the
    grammar, semantics, and the batched plan shape.

    ROUTING (r6): queries whose parsed tree is the FLAT depth-1
    boost-free term/phrase shape (``_flat_bool_clauses``) execute on
    the bool bitmap kernel (``_flat_bool_execute`` — value-identical,
    tested); the rest run the general by-depth fold, and a mixed batch
    unions the two result pages (qid sets are disjoint, ranks are
    per-query). ``strategy='general'`` pins the by-depth executor (the
    verification twin); ``strategy='flat'`` demands the kernel and
    raises if any query does not fit."""
    from sgpt_spark.functions.analyzer import resolve_py_analyzer
    from sgpt_spark.operators.funcscore import match_scores
    from sgpt_spark.operators.index_search import flatten_postings
    from sgpt_spark.operators.indexer import read_index, read_term_stats
    from sgpt_spark.operators.multiterm import (
        expand_fuzzy,
        expand_prefix,
        expand_regexp,
        expand_wildcard,
    )
    from sgpt_spark.operators.positions import phrase_hits_index

    postings, meta = read_index(spark, path)
    tok = resolve_py_analyzer(meta.analyzer)
    pairs = (
        [(r["qid"], r["query"]) for r in queries.collect()]
        if isinstance(queries, DataFrame)
        else list(queries)
    )
    qid_type = (
        "bigint"
        if pairs and isinstance(pairs[0][0], (int,))
        else "string"
    )
    seg_schema = f"qid {qid_type}, doc_id long, score double"
    empty = (
        spark.createDataFrame([], seg_schema)
        .withColumn("rank", F.lit(1).cast("int"))
    )

    if strategy not in (None, "flat", "general"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use None|flat|general"
        )
    asts = []
    for qid, s in pairs:
        ast = parse_query_string(s, default_operator)
        ast = _analyze_node(ast, tok, DEFAULT_FIELD)
        if ast is not None:
            asts.append((qid, ast))
    flat_pairs, gen_asts = [], []
    if strategy != "general":
        for qid, ast in asts:
            clauses = _flat_bool_clauses(ast)
            if clauses is not None:
                flat_pairs.append((qid, clauses))
            else:
                gen_asts.append((qid, ast))
    else:
        gen_asts = asts
    if strategy == "flat" and gen_asts:
        raise ValueError(
            "strategy='flat' but these queries do not fit the flat "
            f"bool shape: {[q for q, _ in gen_asts][:5]}"
        )
    flat_df = (
        _flat_bool_execute(spark, path, flat_pairs, qid_type, k, term_stats)
        if flat_pairs
        else None
    )
    if not gen_asts:
        return flat_df if flat_df is not None else empty

    rows: list = []
    roots: dict = {}
    for qid, ast in gen_asts:
        roots[qid] = _collect_nodes(ast, qid, [0], None, 0, rows)
    if not rows:
        return flat_df if flat_df is not None else empty

    # ---- batched leaf relations ------------------------------------------
    term_leaves = [r for r in rows if r["kind"] == "term" and (
        r["node"].field in (None, DEFAULT_FIELD))]
    dv_eq_leaves = [r for r in rows if r["kind"] == "term" and
                    r["node"].field not in (None, DEFAULT_FIELD)]
    phrase_leaves = [r for r in rows if r["kind"] == "phrase"]
    range_leaves = [r for r in rows if r["kind"] == "range"]
    exp_leaves = {
        kind: [r for r in rows if r["kind"] == kind]
        for kind in ("prefix", "wildcard", "fuzzy", "regexp")
    }

    leaf_rels: list[DataFrame] = []

    if term_leaves:
        tq = [(r["uid"], r["node"].text) for r in term_leaves]
        ms = match_scores(spark, postings, meta, tq, term_stats=term_stats)
        leaf_rels.append(ms.withColumnRenamed("qid", "uid"))

    if phrase_leaves:
        by_slop: dict[int, list] = {}
        for r in phrase_leaves:
            by_slop.setdefault(r["node"].slop, []).append(r)
        for slop, rs in sorted(by_slop.items()):
            ph, _ = phrase_hits_index(
                spark, path, [(r["uid"], r["node"].text) for r in rs],
                term_stats=term_stats, slop=slop,
            )
            leaf_rels.append(ph.select("qid", "doc_id", "score")
                             .withColumnRenamed("qid", "uid"))

    need_dict = any(exp_leaves.values())
    if need_dict:
        try:
            tstats = term_stats if term_stats is not None else read_term_stats(
                spark, path
            )
        except Exception:
            tstats = postings.groupBy("term").agg(F.sum("df").alias("df"))
        exp_frames = []
        if exp_leaves["prefix"]:
            pf = spark.createDataFrame(
                [(r["uid"], r["node"].text) for r in exp_leaves["prefix"]],
                "qid string, prefix string",
            )
            exp_frames.append(
                expand_prefix(tstats, pf, max_expansions=max_expansions)
                .select("qid", "term")
            )
        if exp_leaves["wildcard"]:
            wf = spark.createDataFrame(
                [(r["uid"], r["node"].text) for r in exp_leaves["wildcard"]],
                "qid string, pattern string",
            )
            exp_frames.append(
                expand_wildcard(tstats, wf, max_expansions=max_expansions)
                .select("qid", "term")
            )
        if exp_leaves["regexp"]:
            rf = spark.createDataFrame(
                [(r["uid"], r["node"].text) for r in exp_leaves["regexp"]],
                "qid string, pattern string",
            )
            exp_frames.append(
                expand_regexp(tstats, rf, max_expansions=max_expansions)
                .select("qid", "term")
            )
        if exp_leaves["fuzzy"]:
            by_edits: dict[int, list] = {}
            for r in exp_leaves["fuzzy"]:
                by_edits.setdefault(min(r["node"].max_edits, 2), []).append(r)
            for me_, rs in sorted(by_edits.items()):
                ff = spark.createDataFrame(
                    [(r["uid"], r["node"].text) for r in rs],
                    "qid string, qterm string",
                )
                exp_frames.append(
                    expand_fuzzy(tstats, ff, max_edits=me_,
                                 max_expansions=max_expansions)
                    .select("qid", "term")
                )
        exps = exp_frames[0]
        for f_ in exp_frames[1:]:
            exps = exps.unionByName(f_)
        # constant-score rewrite: distinct matching docs at 1.0
        cand = postings.join(exps.select("term").distinct(), "term", "left_semi")
        flat = flatten_postings(cand, codec=meta.codec)
        leaf_rels.append(
            flat.join(exps, "term")
            .select(F.col("qid").alias("uid"), "doc_id")
            .distinct()
            .withColumn("score", F.lit(1.0))
        )

    if dv_eq_leaves or range_leaves:
        if docvalues is None:
            bad = sorted(
                {r["node"].field for r in dv_eq_leaves + range_leaves}
            )
            raise ValueError(
                f"query_string: field clauses {bad} need the doc-values "
                "sidecar (docvalues=)"
            )
        dvc = set(docvalues.columns)
        for r in dv_eq_leaves + range_leaves:
            if r["node"].field not in dvc:
                raise ValueError(
                    f"query_string: field {r['node'].field!r} not in "
                    f"docvalues columns {sorted(dvc)}"
                )
        dv_types = dict(docvalues.dtypes)
        for r in dv_eq_leaves:
            col = F.col(r["node"].field)
            dtype = dv_types[r["node"].field]
            pred = (
                col == F.lit(r["node"].text)
                if dtype == "string"
                else col == F.lit(r["node"].text).cast(dtype)
            )
            leaf_rels.append(
                docvalues.filter(pred)
                .select(F.lit(r["uid"]).alias("uid"), "doc_id")
                .withColumn("score", F.lit(1.0))
            )
        for r in range_leaves:
            n = r["node"]
            col = F.col(n.field)
            pred = F.lit(True)
            lo, hi = n.lo, n.hi
            numeric = dict(docvalues.dtypes)[n.field] not in ("string",)
            conv = (lambda v: float(v)) if numeric else (lambda v: v)
            if lo is not None:
                pred = pred & (col >= F.lit(conv(lo)) if n.lo_incl
                               else col > F.lit(conv(lo)))
            if hi is not None:
                pred = pred & (col <= F.lit(conv(hi)) if n.hi_incl
                               else col < F.lit(conv(hi)))
            leaf_rels.append(
                docvalues.filter(pred)
                .select(F.lit(r["uid"]).alias("uid"), "doc_id")
                .withColumn("score", F.lit(1.0))
            )

    if not leaf_rels:
        return flat_df if flat_df is not None else empty

    # ---- bottom-up fold by depth ------------------------------------------
    meta_rows = [
        (r["uid"], r["parent"], r["depth"], r["occur"], float(r["boost"]),
         int(r["n_must"]), int(r["n_should"]))
        for r in rows
    ]
    meta_df = spark.createDataFrame(
        meta_rows,
        "uid string, parent string, depth int, occur string, boost double, "
        "n_must int, n_should int",
    )
    by_uid = {r["uid"]: r for r in rows}
    leaf = leaf_rels[0]
    for f_ in leaf_rels[1:]:
        leaf = leaf.unionByName(f_)
    # apply each node's own boost at production
    leaf = leaf.join(
        F.broadcast(meta_df.select("uid", "boost", "depth")), "uid"
    ).select("uid", "doc_id", (F.col("score") * F.col("boost")).alias("score"),
             "depth")

    max_depth = max(r["depth"] for r in rows)
    pending = leaf  # (uid, doc_id, score, depth)
    for d in range(max_depth, 0, -1):
        # Single-reference fold. Rows AT depth d group under their
        # parent uid; every other row keys on its OWN uid and forms a
        # singleton group that the aggregation reproduces unchanged
        # (first() over one row). One groupBy per level keeps the
        # physical plan LINEAR in tree depth — the naive
        # filter(==d) / filter(!=d) split references the whole
        # upstream plan (postings scan included) twice per level,
        # i.e. 2^depth plan copies and re-executed scans.
        j = pending.join(
            F.broadcast(meta_df.select("uid", "parent", "occur")), "uid"
        ).withColumn("_fold", (F.col("depth") == d).cast("int"))
        fold = F.col("_fold") == 1
        key = F.when(fold, F.col("parent")).otherwise(F.col("uid"))
        pending = (
            j.groupBy(key.alias("uid"), F.col("doc_id"))
            .agg(
                F.max("_fold").alias("_isf"),
                F.sum(
                    F.when(fold & (F.col("occur") != "must_not"),
                           F.col("score"))
                ).alias("_fsum"),
                F.count(
                    F.when(fold & (F.col("occur") == "must"), F.lit(1))
                ).alias("musts"),
                F.count(
                    F.when(fold & (F.col("occur") == "should"), F.lit(1))
                ).alias("shoulds"),
                F.max(
                    F.when(fold & (F.col("occur") == "must_not"), F.lit(1))
                    .otherwise(0)
                ).alias("neg"),
                F.first("score").alias("_pscore"),
                F.first("depth").alias("_pdepth"),
            )
            .join(
                F.broadcast(
                    meta_df.select(
                        "uid", "n_must", "boost",
                        F.col("depth").alias("_ndepth"),
                    )
                ),
                "uid",
            )
            .filter(
                (F.col("_isf") == 0)
                | (
                    (F.col("neg") == 0)
                    & (F.col("musts") == F.col("n_must"))
                    & ((F.col("n_must") > 0) | (F.col("shoulds") >= 1))
                )
            )
            .select(
                "uid",
                "doc_id",
                F.when(
                    F.col("_isf") == 1,
                    F.coalesce(F.col("_fsum"), F.lit(0.0)) * F.col("boost"),
                ).otherwise(F.col("_pscore")).alias("score"),
                F.when(F.col("_isf") == 1, F.col("_ndepth"))
                .otherwise(F.col("_pdepth")).cast("int").alias("depth"),
            )
        )

    # roots: map uid -> original qid
    root_rows = [(uid, qid) for qid, uid in roots.items()]
    root_df = spark.createDataFrame(root_rows, f"uid string, out_qid {qid_type}")
    final = (
        pending.filter(F.col("depth") == 0)
        .join(F.broadcast(root_df), "uid")
        .select(F.col("out_qid").alias("qid"), "doc_id", "score")
    )
    gen_df = topk_per_group(final, k=k).select("qid", "doc_id", "score", "rank")
    return gen_df if flat_df is None else flat_df.unionByName(gen_df)
