"""Client CLI — the reference client's command surface on the Spark engine.

Commands mirror ``cmd/client/main.go`` one-for-one:

=============================  ============================================
reference command              this CLI
=============================  ============================================
``upload <file> <key>``        text-sniff + ingest to the catalog (S2/S6)
``download <key> <file>``      export a dataset to a local TSV file (S1)
``list [prefix]``              prefix listing (S5)
``delete <key>``               remove a dataset (S4)
``mapreduce <in> <out>         run a registered map/reduce pair
  <map_id> <reduce_id>         (M1-M10 + M14); ``--reducers`` and
  [--reducers N]               ``--aggregate`` mirror the reference flags
  [--no-aggregate]``           (client main.go:60-63, 122-123)
``funcs``                      list registered plugin pairs (M14 registry)
=============================  ============================================

A user of the reference can run the same workflows verbatim:
``python -m p2_mapreduce_spark.cli upload smallt.txt smallt &&
python -m p2_mapreduce_spark.cli mapreduce smallt out wordcount wordcount``.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import tempfile

from pyspark.sql import SparkSession

DEFAULT_ROOT = os.environ.get("SPARK_GRAFT_WAREHOUSE", "spark-warehouse/dfs")


def _catalog(spark: SparkSession, root: str):
    from p2_mapreduce_spark.catalog import DatasetCatalog

    return DatasetCatalog(spark, root)


def cmd_upload(spark, root: str, local_path: str, key: str) -> str:
    """Ingest path (reference §3.2): sniff text-ness client-side, then one
    line-record dataset per key.  Non-text inputs are refused exactly like
    the reference MapReduce gate (manager.go:748-752)."""
    from p2_mapreduce_spark.sources.readers import read_text_records

    df = read_text_records(spark, local_path, require_text=True)
    _catalog(spark, root).store(df, key)
    return f"stored {key}"


def cmd_download(spark, root: str, key: str, local_path: str) -> str:
    """Export path (reference §3.3) to ONE local file.  The dataset is
    written as TSV by the executors into a temp dir (distributed, same as
    any sink), then the single part file is moved to the target — the
    analog of the client reassembling chunks locally."""
    from p2_mapreduce_spark.sources.writers import write_tsv

    df = _catalog(spark, root).load(key)
    tmp = tempfile.mkdtemp(prefix="p2dl_")
    try:
        write_tsv(df, f"{tmp}/out", single_file=True)
        part = glob.glob(f"{tmp}/out/part-*")[0]
        shutil.move(part, local_path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return f"downloaded {key} -> {local_path}"


def cmd_list(spark, root: str, prefix: str = "") -> str:
    return "\n".join(_catalog(spark, root).list(prefix))


def cmd_delete(spark, root: str, key: str) -> str:
    removed = _catalog(spark, root).delete(key)
    return f"deleted {key}" if removed else f"{key} not found"


def cmd_mapreduce(
    spark,
    root: str,
    in_key: str,
    out_key: str,
    map_id: str,
    reduce_id: str,
    reducers: int = 4,
    aggregate: bool = True,
) -> str:
    """The query path (reference §3.1): validate input exists and output is
    unused (manager.go:742-762), resolve the plugin pair from the registry
    (M14), run the dataflow, store the result under the output key."""
    from p2_mapreduce_spark.mapreduce import run_mapreduce_by_name

    cat = _catalog(spark, root)
    if cat.exists(out_key):
        raise SystemExit(f"output key {out_key!r} already exists (manager.go:755-762)")
    df = cat.load(in_key)
    for col in ("filename", "contents"):
        if col not in df.columns:
            raise SystemExit(
                f"dataset {in_key!r} is not a MapReduce input "
                f"(needs filename/contents line records; has {df.columns})"
            )
    out = run_mapreduce_by_name(
        df, map_id, reduce_id, num_partitions=reducers, aggregate=aggregate
    )
    cat.store(out, out_key)
    return f"mapreduce {in_key} -> {out_key} done"


def cmd_funcs(spark, root: str) -> str:
    from p2_mapreduce_spark.registry import default_registry

    reg = default_registry().list()
    return f"map: {', '.join(reg['map'])}\nreduce: {', '.join(reg['reduce'])}"


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="p2_mapreduce_spark", description=__doc__)
    p.add_argument("--root", default=DEFAULT_ROOT, help="catalog root URI")
    sub = p.add_subparsers(dest="cmd", required=True)
    up = sub.add_parser("upload")
    up.add_argument("local_path")
    up.add_argument("key")
    dl = sub.add_parser("download")
    dl.add_argument("key")
    dl.add_argument("local_path")
    ls = sub.add_parser("list")
    ls.add_argument("prefix", nargs="?", default="")
    rm = sub.add_parser("delete")
    rm.add_argument("key")
    mr = sub.add_parser("mapreduce")
    mr.add_argument("in_key")
    mr.add_argument("out_key")
    mr.add_argument("map_id")
    mr.add_argument("reduce_id")
    mr.add_argument("--reducers", type=int, default=4)
    mr.add_argument("--no-aggregate", dest="aggregate", action="store_false")
    sub.add_parser("funcs")
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> str:
    args = _build_parser().parse_args(argv)
    if spark is None:
        from p2_mapreduce_spark.session import get_spark

        spark = get_spark("p2-cli")
    root = args.root
    if args.cmd == "upload":
        out = cmd_upload(spark, root, args.local_path, args.key)
    elif args.cmd == "download":
        out = cmd_download(spark, root, args.key, args.local_path)
    elif args.cmd == "list":
        out = cmd_list(spark, root, args.prefix)
    elif args.cmd == "delete":
        out = cmd_delete(spark, root, args.key)
    elif args.cmd == "mapreduce":
        out = cmd_mapreduce(
            spark, root, args.in_key, args.out_key, args.map_id, args.reduce_id,
            reducers=args.reducers, aggregate=args.aggregate,
        )
    else:
        out = cmd_funcs(spark, root)
    print(out)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
