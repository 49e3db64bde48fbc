"""Lucene classic-query-syntax parser + exact index-backed execution.

The reference serves plain-text queries (its eval sets are natural-language
passages), but the Lucene/Anserini stack underneath it accepts the classic
query syntax; a drop-in user expects `+hash -merge "nested loop"~1 tab*`
to work. This module parses the flat-clause subset and executes it EXACTLY
against a v2 index by composing the existing surfaces:

  syntax            clause kind        execution
  ------------------------------------------------------------------
  term              TERM               BM25 weight via the scoring kernel
  term*  t?rm       WILDCARD           dictionary expansion (operators/
  term~N            FUZZY              expand.py cap rules), qtf=1 each
  /regex/           REGEXP             whole-term-anchored dictionary
                                       expansion (Lucene RegexpQuery);
                                       body verbatim, never analyzed
  "a b c"           PHRASE (slop 0)    positional artifact; scored with
  "a b c"~N         PHRASE (slop N)    Lucene's sloppy-freq BM25: tf :=
                                       n_matches, df := docs matching
  +clause           MUST               must match; still contributes score
  -clause           MUST_NOT           must not match; contributes nothing
  clause^2.5        BOOST              multiplies the clause's score
                                       contribution (Lucene BoostQuery)
  field:value       FIELD              filter-context match on a doc_map
                                       docvalues column (role:user) —
                                       gates membership, never scores
                                       (Lucene keyword-field filter usage)
  field:[a TO b]    FIELD_RANGE        filter-context inclusive range over
                                       a docvalues column (* = open end) —
                                       Lucene classic TermRangeQuery
                                       syntax, executed as search_filtered
                                       semantics inside the boolean plan

Scoring-boolean semantics (Lucene BooleanQuery): a doc's score is the sum
of every matching positive clause's BM25 contribution; MUST clauses gate
membership, MUST_NOT clauses remove docs. Default operator is OR (SHOULD),
Lucene's default.

Exactness over speed for the boolean path: positive clauses are scored
with the kernel's NO-PRUNE exhaustive mode (chunk-local cut at the full
chunk width), because a MUST/MUST_NOT filter applied after a pruned top-k
would leave holes where excluded docs should have been back-filled.
Pure-SHOULD term queries take the ordinary block-max WAND path untouched.

Scale shape: everything stays term_id-pushdown reads + one |Q|-bounded
driver parse; phrase clauses read only their terms' position rows. The
MUST/MUST_NOT masks ride the same chunk partitioning as scoring, so the
combine is a chunk-colocated join, never a corpus shuffle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

SHOULD, MUST, MUST_NOT = "SHOULD", "MUST", "MUST_NOT"
TERM, PHRASE, WILDCARD, FUZZY, FIELD, REGEXP, FIELD_RANGE = (
    "TERM", "PHRASE", "WILDCARD", "FUZZY", "FIELD", "REGEXP", "FIELD_RANGE",
)

# one clause: optional +/- prefix, then a quoted phrase (optional ~slop),
# a field range (field:[lo TO hi] — inclusive, * = open end; the Lucene
# classic TermRangeQuery syntax; the body holds a space so it must be
# lexed before bare tokens), or a bare token (optional ~edits); bare
# tokens may carry * and ?; phrase/token may close with ^boost
_CLAUSE_RE = re.compile(
    r"""\s*(?P<occur>[+-])?
        (?:
          "(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?
          (?:\^(?P<pboost>\d+(?:\.\d+)?))?
        | (?P<rfield>[A-Za-z_][A-Za-z0-9_]*):
          \[(?P<rlo>[^\s\]]+)\s+TO\s+(?P<rhi>[^\s\]]+)\]
        | (?P<token>[^\s"]+)
        )""",
    re.VERBOSE,
)
_FUZZY_RE = re.compile(r"^(?P<body>.+?)~(?P<edits>\d*)$")
_BOOST_RE = re.compile(r"^(?P<body>.+?)\^(?P<boost>\d+(?:\.\d+)?)$")
# field:value — identifier-shaped field names only, so time-like tokens
# ("12:30") fall through to TERM (the analyzer strips the colon anyway)
_FIELD_RE = re.compile(r"^(?P<field>[A-Za-z_][A-Za-z0-9_]*):(?P<value>.*)$")


@dataclass(frozen=True)
class Clause:
    occur: str  # SHOULD | MUST | MUST_NOT
    kind: str  # TERM | PHRASE | WILDCARD | FUZZY | FIELD
    text: str  # raw body (unanalyzed); FIELD: the value to match
    slop: int = 0  # PHRASE only
    edits: int = 2  # FUZZY only
    boost: float = 1.0  # score multiplier (Lucene BoostQuery)
    field_name: str = ""  # FIELD / FIELD_RANGE: the doc_map docvalues column
    lo: str = ""  # FIELD_RANGE only; "*" = open end
    hi: str = ""  # FIELD_RANGE only; "*" = open end


@dataclass(frozen=True)
class ParsedQuery:
    clauses: tuple[Clause, ...] = field(default_factory=tuple)

    @property
    def pure_should_terms(self) -> bool:
        return all(
            c.occur == SHOULD and c.kind == TERM and c.boost == 1.0
            for c in self.clauses
        )


def parse_query(s: str) -> ParsedQuery:
    """Parse the flat Lucene classic subset. Unsupported syntax (field
    prefixes, parentheses, AND/OR/NOT keywords) raises ValueError rather
    than silently mis-ranking."""
    # the grouping / boolean-keyword guards must not look inside /regex/
    # clause bodies (parens and uppercase words are legal regex there)
    masked = re.sub(r'(?<!\S)[+-]?/[^\s"]*/(?:\^\d+(?:\.\d+)?)?(?!\S)', " ", s)
    for bad, what in (
        ("(", "grouping"), (")", "grouping"),
    ):
        if bad in masked:
            raise ValueError(
                f"unsupported query syntax ({what} {bad!r}) in: {s!r}"
            )
    if re.search(r"\b(AND|OR|NOT)\b", masked):
        raise ValueError(
            f"unsupported boolean keyword in: {s!r} — use +term / -term"
        )
    clauses: list[Clause] = []
    pos = 0
    while pos < len(s):
        m = _CLAUSE_RE.match(s, pos)
        if m is None or m.end() == pos:
            if s[pos:].strip():
                raise ValueError(f"cannot parse query at: {s[pos:]!r}")
            break
        pos = m.end()
        occur = {"+": MUST, "-": MUST_NOT, None: SHOULD}[m.group("occur")]
        if m.group("rfield") is not None:
            lo, hi = m.group("rlo"), m.group("rhi")
            if lo == "*" and hi == "*":
                raise ValueError(
                    f"field range open on both ends matches everything: "
                    f"{m.group(0).strip()!r}"
                )
            clauses.append(
                Clause(
                    occur, FIELD_RANGE, f"[{lo} TO {hi}]",
                    field_name=m.group("rfield"), lo=lo, hi=hi,
                )
            )
            continue
        if m.group("phrase") is not None:
            body = m.group("phrase")
            if not body.strip():
                continue
            clauses.append(
                Clause(
                    occur, PHRASE, body, slop=int(m.group("slop") or 0),
                    boost=float(m.group("pboost") or 1.0),
                )
            )
            continue
        tok = m.group("token")
        boost = 1.0
        bm = _BOOST_RE.match(tok)
        if bm:
            boost = float(bm.group("boost"))
            tok = bm.group("body")
        if "^" in tok:
            raise ValueError(
                f"malformed boost in: {tok!r} — use clause^number"
            )
        fm = _FIELD_RE.match(tok)
        if fm:
            val = fm.group("value")
            if not val:
                raise ValueError(f"empty field clause: {tok!r}")
            if any(ch in val for ch in '*?~"'):
                raise ValueError(
                    f"field clauses match docvalues exactly — no "
                    f"wildcard/fuzzy/phrase bodies: {tok!r}"
                )
            if boost != 1.0:
                raise ValueError(
                    f"field clauses are filter-context (never score) — "
                    f"boost is meaningless: {tok!r}"
                )
            clauses.append(
                Clause(occur, FIELD, val, field_name=fm.group("field"))
            )
            continue
        if tok.startswith("/") and tok.endswith("/") and len(tok) >= 2:
            body = tok[1:-1]
            if not body:
                raise ValueError(f"empty regexp clause: {tok!r}")
            # Lucene RegexpQuery via the classic /pattern/ syntax. The body
            # is NOT analyzed or lowercased (Lucene parses regex bodies
            # verbatim); the dictionary is lowercase, so patterns should be
            # written lowercase. Dialect caveats: expand.expand_regexp.
            clauses.append(Clause(occur, REGEXP, body, boost=boost))
            continue
        fz = _FUZZY_RE.match(tok)
        if fz and "*" not in tok and "?" not in tok:
            edits = fz.group("edits")
            clauses.append(
                Clause(
                    occur, FUZZY, fz.group("body"),
                    edits=int(edits) if edits else 2, boost=boost,
                )
            )
        elif "*" in tok or "?" in tok:
            clauses.append(Clause(occur, WILDCARD, tok, boost=boost))
        else:
            clauses.append(Clause(occur, TERM, tok, boost=boost))
    return ParsedQuery(tuple(clauses))
