"""Index aliases with size-based rollover — the Elasticsearch alias +
ILM-rollover analogue for continuously-ingesting deployments.

An alias is one JSON control file (``alias.json``, committed atomically
like the index manifest) naming an ordered list of member index
directories and the single WRITE member. Reads federate over every member
through :class:`~dhr_spark.operators.federate.MultiSearcher` — exact
global statistics, already proven score-identical to a union-corpus index
— so a searcher of the alias never knows rollover happened. Writes route
to the write member via the ordinary incremental append.

Rollover: when an append finds the write member at or past
``max_docs``, the batch instead becomes a NEW member built with the write
member's exact layout (analyzer / geometry / artifact flags / docvalues),
created under the alias directory and committed into ``alias.json`` in
one atomic rename. Unlike ES there is no empty-index limbo: the index is
born from the first batch that needed it, so a crash between build and
alias commit leaves only an unreferenced directory (retry rebuilds it
idempotently — the alias file is the single source of truth).

Why this matters at 10^12 turns: an ever-growing single index makes every
compaction and every docid-space operation proportional to ALL history.
Bounded members keep append cost proportional to the batch, let old
members go fully cold (compact once, then immutable), and make retention
a member-list edit instead of a delete-by-query over everything.

Reference anchor: Elasticsearch index aliases + ILM rollover
(``POST /alias/_rollover {"max_docs": N}``); Lucene itself has no alias
concept — it is exactly the multi-reader-over-N-directories pattern
(``MultiReader``) this module federates.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from dhr_spark.index.builder import load_manifest

_LAYOUT = (
    "analyzer_mode",
    "chunk_bits",
    "block_size",
    "k1",
    "b",
    "forward_index",
    "positional",
    "stored",
    "docvalues",
)


def _alias_path(alias_dir: str) -> str:
    return os.path.join(alias_dir, "alias.json")


def load_alias(alias_dir: str) -> dict:
    """The committed alias record {"members": [...], "write": dir}."""
    p = _alias_path(alias_dir)
    if not os.path.isfile(p):
        raise FileNotFoundError(f"no alias.json in {alias_dir}")
    with open(p) as f:
        return json.load(f)


def _commit_alias(alias_dir: str, rec: dict) -> None:
    os.makedirs(alias_dir, exist_ok=True)
    tmp = _alias_path(alias_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    os.replace(tmp, _alias_path(alias_dir))  # atomic commit


def create_alias(
    alias_dir: str, members: list[str], write: str | None = None
) -> dict:
    """Create an alias over existing member indexes. ``write`` defaults to
    the LAST member (the newest, ES's write-index convention)."""
    if not members:
        raise ValueError("an alias needs at least one member index")
    members = [os.path.abspath(m) for m in members]
    for m in members:
        if load_manifest(m) is None:
            raise FileNotFoundError(f"alias member has no manifest: {m}")
    write = os.path.abspath(write) if write else members[-1]
    if write not in members:
        raise ValueError(f"write index {write} is not among the members")
    rec = {"members": members, "write": write, "rollovers": 0}
    _commit_alias(alias_dir, rec)
    return rec


def open_alias(spark: SparkSession, alias_dir: str, **kw):
    """A MultiSearcher over the alias's current members (kw = k1/b/cache
    overrides). index_id in results is the member's position in the
    alias's member list."""
    from dhr_spark.operators.federate import MultiSearcher

    return MultiSearcher(spark, load_alias(alias_dir)["members"], **kw)


def append_to_alias(
    spark: SparkSession,
    transcripts: DataFrame,
    alias_dir: str,
    max_docs: int | None = None,
) -> dict:
    """Append a transcript batch through the alias: into the write member,
    or — when ``max_docs`` is set and the write member already holds at
    least that many live docs — into a freshly-rolled member built with
    the write member's exact layout. Returns the committed alias record
    (with ``"rolled": True`` when a rollover happened).

    The rollover check is manifest-only (no job). The sequence is
    crash-safe in the same way the underlying index ops are: the new
    member's build commits its own manifest first, the alias commit is one
    atomic rename, and a crash between the two leaves an unreferenced
    directory a retry simply rebuilds (mode overwrite)."""
    from dhr_spark.index.builder import build_index
    from dhr_spark.index.incremental import append_to_index

    rec = load_alias(alias_dir)
    wman = load_manifest(rec["write"])
    if wman is None:
        raise FileNotFoundError(f"write member lost its manifest: {rec['write']}")
    if wman.get("granularity") == "conversation":
        raise ValueError(
            "alias appends are turn-level; conversation-granularity "
            "members need index.incremental.append_conversations directly"
        )
    live = int(wman["n_docs"]) - int(wman.get("tombstones", 0))
    if max_docs is not None and max_docs < 1:
        raise ValueError(f"max_docs must be >= 1, got {max_docs}")
    if max_docs is None or live < max_docs:
        append_to_index(spark, transcripts, rec["write"])
        rec["rolled"] = False
        _commit_alias(alias_dir, rec)
        return rec
    gen = int(rec.get("rollovers", 0)) + 1
    new_dir = os.path.abspath(
        os.path.join(alias_dir, f"rolled-{gen:06d}")
    )
    params = {k: wman.get(k) for k in _LAYOUT}
    if params.get("docvalues") is None:
        params["docvalues"] = []
    iso = wman.get("index_sort")
    build_index(
        spark,
        transcripts,
        new_dir,
        index_sort=(iso["field"], bool(iso["ascending"])) if iso else None,
        **params,
    )
    rec["members"] = rec["members"] + [new_dir]
    rec["write"] = new_dir
    rec["rollovers"] = gen
    rec["rolled"] = True
    _commit_alias(alias_dir, rec)
    return rec
