"""Interval queries — Lucene IntervalsSource / Elasticsearch `intervals`
query analogue, with minimal-interval semantics.

The reference's Lucene backend (Anserini) ships Lucene's interval query
family (org.apache.lucene.queries.intervals): proximity matching that,
unlike the span operators (operators/phrase.py span_*), is *compositional*
— sources nest (`all_of` over `any_of` over `match`), carry per-node
`ordered` / `max_gaps` constraints, and are combined under MINIMAL-interval
semantics: a source only emits intervals that do not contain another
interval from the same source (Clarke & Cormack / Vigna; Lucene
IntervalIterator contract). dhr itself issues bag-of-words queries, so this
module is part of the fulltext-engine surface beyond the reference's own
usage, like the span/phrase layer (SURVEY.md §9).

Expression tree (plain dicts, built by the constructors below):

    match("slow query", ordered=True, max_gaps=0)   # leaf over analyzed terms
    all_of([s1, s2], ordered=False, max_gaps=4)     # combine sub-sources
    any_of([s1, s2])                                # union (minimalized)
    containing(src, flt) / not_containing(src, flt)
    contained_by(src, flt) / not_contained_by(src, flt)
    overlapping(src, flt) / not_overlapping(src, flt)

Semantics pinned here (and verified against a brute-force enumerator in
tests/test_intervals.py):

  * every node's output is its MINIMAL interval set, sorted by start;
  * `ordered` combination chains greedily — for each first-child interval,
    each later child contributes its first interval starting strictly after
    the previous child's end (Lucene Intervals.ordered); non-minimal
    candidates (same end, earlier start) are dropped;
  * `unordered` combination is the k-pointer minimal-window sweep
    (Lucene Intervals.unordered — overlaps between children allowed);
  * `max_gaps` filters the minimal stream: gaps = (end - start + 1) minus
    the positions covered by the chosen child intervals (for a term leaf:
    width - n_terms). -1 = unlimited. Filtering AFTER minimalization is
    Lucene's Intervals.maxgaps contract — a wide-but-minimal interval is
    dropped, never replaced by a non-minimal narrower one;
  * filters keep source intervals by relation to ANY filter interval
    (Lucene IntervalFilter family).

Execution is Spark-first in the same shape as the phrase layer: per-leaf
position arrays are extracted JVM-side as pure column math
(phrase.term_positions — whole-stage codegen over the corpus scan, only
docs containing at least one leaf term survive the JVM filter), and only
those small integer arrays cross into an Arrow-batched kernel that runs
the interval algebra per document. The algebra is O(occurrences · k) per
doc — position lists are tens of integers — so the kernel is bounded by
Arrow transfer, not Python compute. The index-backed twin
(operators/wand.Searcher.search_intervals) reads ONLY the leaf terms'
rows of the positional artifact (term_id pushdown into parquet row
groups), pivots per docid, and reuses the identical kernel — no corpus
scan, same results (pinned in tests/test_intervals.py).

At 100 TB: the corpus-scan path is embarrassingly parallel (zero shuffle,
column-pruned scan of (id, text)); the index path moves only
|leaf terms| position rows through one docid-grouped exchange — the same
scale shape as Searcher.search_phrase.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhr_spark.operators.phrase import _SIMPLE_RE, term_positions

# ---------------------------------------------------------------------------
# source constructors
# ---------------------------------------------------------------------------


def match(query: str, ordered: bool = True, max_gaps: int = -1) -> dict:
    """Leaf source: the analyzed terms of ``query`` as unit intervals,
    combined ordered/unordered with a gap budget (ES intervals `match`;
    ES defaults ordered=false — ours defaults True, the phrase-like mode).
    A single-term match ignores ordered/max_gaps."""
    terms = _SIMPLE_RE.findall(query.lower())
    if not terms:
        raise ValueError(f"interval match {query!r} has no indexable terms")
    return {
        "op": "match",
        "terms": terms,
        "ordered": bool(ordered),
        "max_gaps": int(max_gaps),
    }


def all_of(sources: list[dict], ordered: bool = False, max_gaps: int = -1) -> dict:
    """Combine sub-sources: one interval from each, ordered or not, with a
    gap budget over positions not covered by the chosen children."""
    if not sources:
        raise ValueError("all_of needs at least one source")
    return {
        "op": "all_of",
        "sources": list(sources),
        "ordered": bool(ordered),
        "max_gaps": int(max_gaps),
    }


def any_of(sources: list[dict]) -> dict:
    """Union of sub-sources, re-minimalized."""
    if not sources:
        raise ValueError("any_of needs at least one source")
    return {"op": "any_of", "sources": list(sources)}


_TERM_RE = __import__("re").compile(r"^[a-z0-9]+$")


def prefix(p: str) -> dict:
    """Multiterm leaf (Lucene Intervals.prefix): unit intervals at every
    token starting with ``p``. The prefix is NOT analyzed (Lucene
    semantics) — on a stemmed (lucene-chain) index it matches the stemmed
    dictionary forms, same caveat as match_phrase_prefix."""
    p = p.lower()
    if not _TERM_RE.match(p):
        raise ValueError(f"interval prefix {p!r} must be [a-z0-9]+")
    return {"op": "prefix", "prefix": p}


def wildcard(pattern: str) -> dict:
    """Multiterm leaf (Lucene Intervals.wildcard): unit intervals at every
    token matching the whole-term ``*``/``?`` pattern (not analyzed)."""
    pat = pattern.lower()
    if not __import__("re").match(r"^[a-z0-9*?]+$", pat) or not any(
        c not in "*?" for c in pat
    ):
        raise ValueError(
            f"interval wildcard {pattern!r} must be [a-z0-9*?]+ with at "
            "least one literal character"
        )
    return {"op": "wildcard", "pattern": pat}


def _filter(kind: str, source: dict, flt: dict) -> dict:
    return {"op": "filter", "kind": kind, "source": source, "filter": flt}


def containing(source: dict, flt: dict) -> dict:
    """Keep source intervals that contain >=1 filter interval."""
    return _filter("containing", source, flt)


def not_containing(source: dict, flt: dict) -> dict:
    return _filter("not_containing", source, flt)


def contained_by(source: dict, flt: dict) -> dict:
    """Keep source intervals lying inside >=1 filter interval."""
    return _filter("contained_by", source, flt)


def not_contained_by(source: dict, flt: dict) -> dict:
    return _filter("not_contained_by", source, flt)


def overlapping(source: dict, flt: dict) -> dict:
    """Keep source intervals overlapping >=1 filter interval."""
    return _filter("overlapping", source, flt)


def not_overlapping(source: dict, flt: dict) -> dict:
    return _filter("not_overlapping", source, flt)


def leaf_specs(source: dict) -> list[tuple[str, str]]:
    """All leaf specs of the tree as (kind, value) pairs — kind in
    {"term", "prefix", "wildcard"} — in first-appearance order, deduped.
    These are the position arrays the evaluator needs; multiterm leaves
    key the per-doc posmap by their spec tuple, term leaves by the bare
    term string."""
    out: list[tuple[str, str]] = []

    def add(spec: tuple[str, str]) -> None:
        if spec not in out:
            out.append(spec)

    def walk(s: dict) -> None:
        if s["op"] == "match":
            for t in s["terms"]:
                add(("term", t))
        elif s["op"] == "prefix":
            add(("prefix", s["prefix"]))
        elif s["op"] == "wildcard":
            add(("wildcard", s["pattern"]))
        elif s["op"] in ("all_of", "any_of"):
            for c in s["sources"]:
                walk(c)
        elif s["op"] == "filter":
            walk(s["source"])
            walk(s["filter"])
        else:  # pragma: no cover - constructors prevent this
            raise ValueError(f"unknown interval op {s['op']!r}")

    walk(source)
    return out


def leaf_terms(source: dict) -> list[str]:
    """Bare term leaves of the tree (back-compat helper over leaf_specs)."""
    return [v for k, v in leaf_specs(source) if k == "term"]


# ---------------------------------------------------------------------------
# per-document interval algebra (lists of (start, end, covered) tuples,
# sorted by start; covered = positions occupied by chosen children, the
# quantity max_gaps budgets against)
# ---------------------------------------------------------------------------


def _minimalize(cands: list[tuple]) -> list[tuple]:
    """Drop intervals that contain another candidate. Input sorted by
    start asc; for equal starts only the smallest end is minimal."""
    if not cands:
        return cands
    # equal starts: keep the narrowest
    by_start: list[tuple] = []
    for c in cands:
        if by_start and by_start[-1][0] == c[0]:
            if c[1] < by_start[-1][1]:
                by_start[-1] = c
        else:
            by_start.append(c)
    # right-to-left sweep: an interval is minimal iff every later-starting
    # candidate ends strictly after it
    out: list[tuple] = []
    min_end = None
    for c in reversed(by_start):
        if min_end is None or c[1] < min_end:
            out.append(c)
            min_end = c[1]
    out.reverse()
    return out


def _gaps_filter(cands: list[tuple], max_gaps: int) -> list[tuple]:
    if max_gaps < 0:
        return cands
    return [c for c in cands if (c[1] - c[0] + 1) - c[2] <= max_gaps]


def _ordered_combine(children: list[list[tuple]]) -> list[tuple]:
    """Greedy ordered chaining (Lucene Intervals.ordered): for each interval
    of child 0, later children each contribute their first interval starting
    strictly after the previous child's end."""
    if any(not ch for ch in children):
        return []
    first = children[0]
    starts = [[iv[0] for iv in ch] for ch in children]
    out: list[tuple] = []
    for s0, e0, _w0 in first:
        # covered counts each chosen child's full SPAN: parent gaps budget
        # only the positions BETWEEN children (Lucene OrderedIntervalsSource
        # .gaps()); a child's internal gaps were already budgeted by the
        # child's own max_gaps
        prev_end, covered = e0, e0 - s0 + 1
        ok = True
        for ch, ss in zip(children[1:], starts[1:]):
            j = bisect_right(ss, prev_end)
            if j == len(ch):
                ok = False
                break
            s_j, e_j, _ = ch[j]
            prev_end = e_j
            covered += e_j - s_j + 1
        if ok:
            out.append((s0, prev_end, covered))
    return _minimalize(out)


def _unordered_combine(children: list[list[tuple]]) -> list[tuple]:
    """k-pointer minimal-window sweep (Lucene Intervals.unordered): the
    current window spans the per-child current intervals; advance the child
    holding the earliest start. Child overlaps are allowed; covered
    positions are clamped to the window width."""
    if any(not ch for ch in children):
        return []
    ptr = [0] * len(children)
    out: list[tuple] = []
    while True:
        cur = [ch[p] for ch, p in zip(children, ptr)]
        s = min(iv[0] for iv in cur)
        e = max(iv[1] for iv in cur)
        # child SPANS, clamped to the window: overlapping children must not
        # count a position twice past the window width (see ordered twin
        # for the span-not-covered rationale)
        covered = min(sum(iv[1] - iv[0] + 1 for iv in cur), e - s + 1)
        out.append((s, e, covered))
        # advance the earliest-starting child
        k = min(range(len(cur)), key=lambda i: cur[i][0])
        ptr[k] += 1
        if ptr[k] == len(children[k]):
            break
    out.sort(key=lambda c: (c[0], c[1]))
    return _minimalize(out)


_REL = {
    "containing": lambda s, f: s[0] <= f[0] and f[1] <= s[1],
    "contained_by": lambda s, f: f[0] <= s[0] and s[1] <= f[1],
    "overlapping": lambda s, f: s[0] <= f[1] and f[0] <= s[1],
}


def eval_intervals(source: dict, posmap: dict[str, list[int]]) -> list[tuple]:
    """Evaluate the tree over one document's term->sorted-positions map.
    Returns the node's minimal intervals as (start, end, covered) sorted by
    start."""
    op = source["op"]
    if op == "match":
        children = [
            [(p, p, 1) for p in posmap.get(t, ())] for t in source["terms"]
        ]
        if len(children) == 1:
            return children[0]
        comb = _ordered_combine if source["ordered"] else _unordered_combine
        return _gaps_filter(comb(children), source["max_gaps"])
    if op == "prefix":
        return [(p, p, 1) for p in posmap.get(("prefix", source["prefix"]), ())]
    if op == "wildcard":
        return [
            (p, p, 1)
            for p in posmap.get(("wildcard", source["pattern"]), ())
        ]
    if op == "all_of":
        children = [eval_intervals(c, posmap) for c in source["sources"]]
        if len(children) == 1:
            return _gaps_filter(children[0], source["max_gaps"])
        comb = _ordered_combine if source["ordered"] else _unordered_combine
        return _gaps_filter(comb(children), source["max_gaps"])
    if op == "any_of":
        merged: list[tuple] = []
        for c in source["sources"]:
            merged.extend(eval_intervals(c, posmap))
        merged.sort(key=lambda c: (c[0], c[1]))
        return _minimalize(merged)
    if op == "filter":
        src = eval_intervals(source["source"], posmap)
        flt = eval_intervals(source["filter"], posmap)
        kind = source["kind"]
        neg = kind.startswith("not_")
        rel = _REL[kind[4:] if neg else kind]
        kept = [s for s in src if any(rel(s, f) for f in flt) != neg]
        return kept
    raise ValueError(f"unknown interval op {op!r}")  # pragma: no cover


# ---------------------------------------------------------------------------
# DataFrame operators
# ---------------------------------------------------------------------------

_RESULT_SCHEMA = (
    "{id} {idt}, n_matches long, first_start long, first_end long"
)


def _posmap_key(spec: tuple[str, str]):
    """posmap key for a leaf spec: bare string for term leaves (the
    eval_intervals match-leaf contract), the spec tuple for multiterm."""
    return spec[1] if spec[0] == "term" else spec


def _interval_kernel(
    source: dict, specs: list[tuple[str, str]], id_field: str
):
    """mapInPandas kernel over (id, p0..p{k-1}) rows — per-doc algebra."""
    keys = [_posmap_key(s) for s in specs]

    def _go(batches):
        for pdf in batches:
            ids, ns, fs, fe = [], [], [], []
            pcols = [pdf[f"p{j}"] for j in range(len(specs))]
            for i, did in enumerate(pdf[id_field]):
                posmap = {
                    k: list(pc.iloc[i]) for k, pc in zip(keys, pcols)
                    if len(pc.iloc[i])
                }
                ivs = eval_intervals(source, posmap)
                if ivs:
                    ids.append(did)
                    ns.append(len(ivs))
                    fs.append(ivs[0][0])
                    fe.append(ivs[0][1])
            yield pd.DataFrame(
                {
                    id_field: pd.Series(ids, dtype=pdf[id_field].dtype),
                    "n_matches": pd.Series(ns, dtype=np.int64),
                    "first_start": pd.Series(fs, dtype=np.int64),
                    "first_end": pd.Series(fe, dtype=np.int64),
                }
            )

    return _go


def _interval_batch_kernel(
    trees: list[tuple[str, dict]],
    specs: list[tuple[str, str]],
    id_field: str,
):
    """Batch twin: one posmap per doc serves every (qid, tree)."""
    keys = [_posmap_key(s) for s in specs]

    def _go(batches):
        for pdf in batches:
            qids, ids, ns, fs, fe = [], [], [], [], []
            pcols = [pdf[f"p{j}"] for j in range(len(specs))]
            for i, did in enumerate(pdf[id_field]):
                posmap = {
                    k: list(pc.iloc[i]) for k, pc in zip(keys, pcols)
                    if len(pc.iloc[i])
                }
                for qid, tree in trees:
                    ivs = eval_intervals(tree, posmap)
                    if ivs:
                        qids.append(qid)
                        ids.append(did)
                        ns.append(len(ivs))
                        fs.append(ivs[0][0])
                        fe.append(ivs[0][1])
            yield pd.DataFrame(
                {
                    "qid": pd.Series(qids, dtype=object),
                    id_field: pd.Series(ids, dtype=pdf[id_field].dtype),
                    "n_matches": pd.Series(ns, dtype=np.int64),
                    "first_start": pd.Series(fs, dtype=np.int64),
                    "first_end": pd.Series(fe, dtype=np.int64),
                }
            )

    return _go


def _spec_positions_col(toks, spec: tuple[str, str]):
    """JVM column: sorted 0-based positions of tokens matching the leaf
    spec — term equality, prefix startswith, or anchored wildcard rlike."""
    kind, value = spec
    if kind == "term":
        return term_positions(toks, value)
    if kind == "prefix":
        pred = lambda t: t.startswith(value)  # noqa: E731
    else:  # wildcard
        rx = "^" + __import__("re").escape(value).replace(
            r"\*", ".*"
        ).replace(r"\?", ".") + "$"
        pred = lambda t: t.rlike(rx)  # noqa: E731
    tagged = F.transform(
        toks, lambda t, i: F.when(pred(t), i).otherwise(F.lit(-1))
    )
    return F.array_remove(tagged, -1)


def interval_match(
    docs: DataFrame,
    source: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_matches, first_start, first_end) for docs where ``source``
    emits >=1 minimal interval; n_matches counts minimal intervals and
    (first_start, first_end) is the earliest one.

    Position extraction is JVM column math (phrase.term_positions and its
    prefix/wildcard twins) under the simple analyzer — the same contract
    as phrase_match/proximity_match, so every node has an exact DuckDB
    twin. Docs matching none of the leaf specs are dropped JVM-side
    before the kernel sees them."""
    from dhr_spark.functions.analyzer import simple_tokens_col

    specs = leaf_specs(source)
    toks = simple_tokens_col(F.col(text_col))
    proj = docs.select(
        F.col(id_col),
        *[
            _spec_positions_col(toks, s).alias(f"p{j}")
            for j, s in enumerate(specs)
        ],
    )
    gate = F.lit(False)
    for j in range(len(specs)):
        gate = gate | (F.size(F.col(f"p{j}")) > 0)
    proj = proj.filter(gate)
    idt = dict(docs.dtypes)[id_col]
    schema = _RESULT_SCHEMA.format(id=id_col, idt=idt)
    return proj.mapInPandas(_interval_kernel(source, specs, id_col), schema)
