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


class UdfRegistry:
    """Named catalog of map/reduce functions (controller registry analog)."""

    def __init__(self) -> None:
        self._maps: dict[str, MapUdf] = {}
        self._reduces: dict[str, ReduceUdf] = {}

    def register_map(self, name, fn, columnar=None) -> None:
        self._maps[name] = MapUdf(name, fn, columnar)

    def register_reduce(self, name, fn, columnar=None, combiner=None) -> None:
        if combiner is None and getattr(fn, "associative", False):
            combiner = fn
        self._reduces[name] = ReduceUdf(name, fn, columnar, combiner)

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

    def list(self) -> dict[str, list[str]]:
        return {"map": sorted(self._maps), "reduce": sorted(self._reduces)}


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
    reg.register_reduce(
        "wordcount", wordcount_reduce,
        columnar=_wordcount_reduce_columnar, combiner=sum_reduce,
    )
    return reg
