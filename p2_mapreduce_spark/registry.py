"""UDF registry — the plugin system (reference M14) without ``.so`` files.

The reference ships user code as compiled Go plugins: client uploads the
``.so`` (cmd/client/main.go:428-461), the controller stores it in a
registry (manager.go:1815-1864), storage nodes lazily download + cache +
``plugin.Open`` + look up exported symbols (storage-node/main.go:603-730).
On Spark, code shipping is closure pickling — free — so the registry is
just a named catalog of map/reduce pairs, each optionally carrying a
``columnar`` DataFrame implementation that keeps the job JVM-side.

Registered defaults reproduce the reference's single shipped workload
(word count, mapreduce/functions/wordcount.go) plus an identity pair.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from p2_mapreduce_spark.functions.text import tokens_array
from p2_mapreduce_spark.mapreduce import associative

# Python-side mirror of TOKEN_SPLIT_REGEX (\p{L}\p{N} ≅ str.isalnum() for
# the practical plane; Python's re lacks \p classes so we split on
# non-alphanumeric per Unicode str semantics, which matches Go's
# IsLetter|IsNumber for all letters/digits, differing only on the rare
# marks/format runes that neither treats as word chars).
_PY_SPLIT = re.compile(r"[\W_]+", re.UNICODE)


@dataclass(frozen=True)
class MapUdf:
    name: str
    fn: Callable[[str, str], Iterable[tuple[str, str]]]
    columnar: Optional[Callable[..., DataFrame]] = None  # df -> DataFrame[key,value]


@dataclass(frozen=True)
class ReduceUdf:
    name: str
    fn: Callable[[str, list], str]
    columnar: Optional[Callable[[DataFrame], DataFrame]] = None
    #: algebraic combiner for the Python path (see mapreduce.associative /
    #: run_mapreduce(combiner=...)): folds partials of fn's output so the
    #: shuffle never carries a full per-key value list
    combiner: Optional[Callable[[str, list], str]] = None


@dataclass(frozen=True)
class TableUdf:
    """Row-generating plugin (UDTF — one input row in, any number of
    output rows out): ``fn(*input cols)`` is a generator of output
    tuples matching ``schema`` (a DDL string).  The third plugin kind
    next to map and reduce, completing the UDF/UDAF/UDTF triad
    (SURVEY §2 C13); the reference registry ships only scalar map /
    reduce pairs (manager.go:1815-1864)."""

    name: str
    fn: Callable[..., Iterable[tuple]]
    schema: str


class UdfRegistry:
    """Named catalog of map/reduce/table functions (controller registry
    analog)."""

    def __init__(self) -> None:
        self._maps: dict[str, MapUdf] = {}
        self._reduces: dict[str, ReduceUdf] = {}
        self._tables: dict[str, TableUdf] = {}

    def register_map(self, name, fn, columnar=None) -> None:
        self._maps[name] = MapUdf(name, fn, columnar)

    def register_reduce(self, name, fn, columnar=None, combiner=None) -> None:
        if combiner is None and getattr(fn, "associative", False):
            combiner = fn
        self._reduces[name] = ReduceUdf(name, fn, columnar, combiner)

    def register_table(self, name, fn, schema) -> None:
        self._tables[name] = TableUdf(name, fn, schema)

    def get_map(self, name: str) -> MapUdf:
        if name not in self._maps:
            raise KeyError(f"map function {name!r} not registered (have {sorted(self._maps)})")
        return self._maps[name]

    def get_reduce(self, name: str) -> ReduceUdf:
        if name not in self._reduces:
            raise KeyError(
                f"reduce function {name!r} not registered (have {sorted(self._reduces)})"
            )
        return self._reduces[name]

    def get_table(self, name: str) -> TableUdf:
        if name not in self._tables:
            raise KeyError(
                f"table function {name!r} not registered (have {sorted(self._tables)})"
            )
        return self._tables[name]

    def list(self) -> dict[str, list[str]]:
        return {
            "map": sorted(self._maps),
            "reduce": sorted(self._reduces),
            "table": sorted(self._tables),
        }


# --- the reference's shipped workload, re-expressed -------------------------


def wordcount_map(filename: str, contents: str) -> Iterable[tuple[str, str]]:
    """Tokenize + normalize + emit ("word","1") — wordcount.go:20-37
    behavior: split on non-letter/non-digit runes, lowercase, drop empties."""
    for tok in _PY_SPLIT.split(contents):
        if tok:
            yield tok.lower(), "1"


def wordcount_reduce(key: str, values: list) -> str:
    """Occurrence count — wordcount.go:41-45 (``len(values)``)."""
    return str(len(values))


def _wordcount_map_columnar(df: DataFrame, value_col: str = "contents", **_) -> DataFrame:
    col = F.col(value_col)
    return df.select(F.explode(tokens_array(col)).alias("key"), F.lit("1").alias("value"))


def _wordcount_reduce_columnar(mapped: DataFrame) -> DataFrame:
    # count replaces len(values); Spark adds the map-side partial the
    # reference lacks (its shuffle volume == token count).
    return mapped.groupBy("key").agg(F.count("*").cast("string").alias("value"))


def identity_map(filename: str, contents: str) -> Iterable[tuple[str, str]]:
    yield filename, contents


def first_value_reduce(key: str, values: list) -> str:
    return values[0] if values else ""


def make_grep_map(pattern: str) -> Callable[[str, str], Iterable[tuple[str, str]]]:
    """Grep-style plugin factory: emit (filename, line) per matching line.
    The reference bakes such constants into the compiled ``.so``; here the
    closure captures them and ships by pickle."""
    rx = re.compile(pattern)

    def grep_map(filename: str, contents: str) -> Iterable[tuple[str, str]]:
        for line in (contents or "").splitlines():
            if rx.search(line):
                yield filename, line

    return grep_map


@associative
def sum_reduce(key: str, values: list) -> str:
    """Integer sum of the value list — the controller's merge semantic
    (manager.go:1112 ``strconv.Atoi`` + sum) as a plugin reduce fn.
    Associative: a sum of partial sums is the total sum, so it is its own
    map-side combiner."""
    return str(sum(int(v) for v in values))


def _sum_reduce_columnar(mapped: DataFrame) -> DataFrame:
    return mapped.groupBy("key").agg(
        F.sum(F.col("value").cast("bigint")).cast("string").alias("value")
    )


def count_reduce(key: str, values: list) -> str:
    """Generic occurrence count (same semantic as wordcount's reduce)."""
    return str(len(values))


def sentence_split(doc_id, text) -> Iterable[tuple]:
    """Built-in table fn: one row per non-empty sentence of ``text``
    (split on ``[.!?]+`` runs), with its 0-based index among the
    KEPT sentences.  The whitespace strip set is pinned to ``" \\t\\n\\r"``
    so the DuckDB oracle's ``trim(s, ' \\t\\n\\r')`` matches exactly."""
    idx = 0
    for piece in re.split(r"[.!?]+", text or ""):
        piece = piece.strip(" \t\n\r")
        if piece:
            yield doc_id, idx, piece
            idx += 1


def apply_table_udf(df: DataFrame, tudf: TableUdf, *input_cols: str) -> DataFrame:
    """Run a registered table function as a Spark Python UDTF via a
    LATERAL join: every input row fans out to ``fn(*input_cols)``'s
    generated rows, alongside the input columns.

    The wrapper class is defined locally so cloudpickle ships it by
    value, and the generator fn's module is registered for by-value
    pickling (:func:`p2_mapreduce_spark.mapreduce._ship_by_value`) —
    executors need no engine install, same discipline as the MapReduce
    plugin path.  UDTFs are row-at-a-time Python (the slow path): the
    registry's escape hatch for genuinely row-generating plugins, not a
    substitute for ``explode``/``sequence`` built-ins.
    """
    from pyspark.sql.functions import udtf as _udtf

    from p2_mapreduce_spark.mapreduce import _ship_by_value

    _ship_by_value(tudf.fn)
    fn = tudf.fn

    @_udtf(returnType=tudf.schema)
    class _Wrapped:
        def eval(self, *args):
            yield from fn(*args)

    spark = df.sparkSession
    reg_name = f"tudf_{tudf.name}"
    view = f"tudf_in_{tudf.name}"
    spark.udtf.register(reg_name, _Wrapped)
    df.createOrReplaceTempView(view)
    args = ", ".join(input_cols)
    return spark.sql(f"SELECT t.* FROM {view}, LATERAL {reg_name}({args}) t")




def index_map(doc_id, contents) -> Iterable[tuple[str, str]]:
    """Inverted-index plugin map: tokenize like wordcount (same splitter,
    wordcount.go:20-37 behavior) but emit (token, doc_id) so the reduce
    side assembles postings — the textbook "second MapReduce program"
    (the original MapReduce paper's inverted-index example, expressible
    in the reference's plugin ABI types.go:13-14)."""
    seen = set()
    for tok in _PY_SPLIT.split(contents or ""):
        t = tok.lower()
        if t and t not in seen:
            seen.add(t)
            yield t, str(doc_id)


def postings_reduce(key: str, values: list) -> str:
    """Inverted-index plugin reduce: numerically sorted distinct doc-id
    list, comma-joined — deterministic under any partitioning/arrival
    order (the M5 grouped-values contract makes no order promise)."""
    return ",".join(str(d) for d in sorted({int(v) for v in values}))



def default_registry() -> UdfRegistry:
    reg = UdfRegistry()
    reg.register_map("wordcount", wordcount_map, columnar=_wordcount_map_columnar)
    reg.register_map("identity", identity_map)
    reg.register_reduce("first", first_value_reduce)
    reg.register_map("grep_data", make_grep_map(r"data"))
    reg.register_reduce("sum", sum_reduce, columnar=_sum_reduce_columnar)
    # count over ARBITRARY values has a two-stage fold (len, then sum) a
    # self-combiner cannot express — it stays on the plain path (or the
    # columnar one); wordcount's map contract emits only "1"s, for which
    # integer sum IS the hierarchical fold of len, so it combines.
    reg.register_reduce("count", count_reduce)
    reg.register_map("index", index_map)
    reg.register_reduce("postings", postings_reduce)
    reg.register_reduce(
        "wordcount", wordcount_reduce,
        columnar=_wordcount_reduce_columnar, combiner=sum_reduce,
    )
    reg.register_table(
        "sentence_split", sentence_split,
        "doc_id bigint, sentence_idx int, sentence string",
    )
    return reg
