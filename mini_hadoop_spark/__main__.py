"""CLI — the reference's interactive user flows (store / retrieve /
delete / ls / info, submit the canned workloads, run any registered
query) as ``python -m mini_hadoop_spark <cmd>``.

The reference drives these from iex (mini_hadoop.ex:6-20); here each
subcommand builds the tuned session, performs one operation, prints a
small human-readable result, and exits.  Outputs that can be large go
through ``--limit`` (never an unbounded driver collect).
"""

from __future__ import annotations

import argparse
import json
import sys


def _store(args) -> int:
    from mini_hadoop_spark.session import get_spark
    from mini_hadoop_spark.sources.dfs import FileStore

    store = FileStore(get_spark("mhs-cli"), args.root)
    store.store_file(args.name, args.local_path, split_on_newline=args.newline)
    print(json.dumps(store.file_info(args.name)))
    return 0


def _retrieve(args) -> int:
    from mini_hadoop_spark.session import get_spark
    from mini_hadoop_spark.sources.dfs import FileStore

    store = FileStore(get_spark("mhs-cli"), args.root)
    n = store.retrieve_file(args.name, args.local_path)
    print(f"wrote {n} bytes to {args.local_path}")
    return 0


def _delete(args) -> int:
    from mini_hadoop_spark.session import get_spark
    from mini_hadoop_spark.sources.dfs import FileStore

    store = FileStore(get_spark("mhs-cli"), args.root)
    ok = store.delete_file(args.name)
    print("deleted" if ok else "not found")
    return 0 if ok else 1


def _ls(args) -> int:
    from mini_hadoop_spark.session import get_spark
    from mini_hadoop_spark.sources.dfs import FileStore

    for name in FileStore(get_spark("mhs-cli"), args.root).list_files():
        print(name)
    return 0


def _info(args) -> int:
    from mini_hadoop_spark.session import get_spark
    from mini_hadoop_spark.sources.dfs import FileStore

    print(json.dumps(FileStore(get_spark("mhs-cli"), args.root).file_info(args.name)))
    return 0


def _wordcount(args) -> int:
    from pyspark.sql import functions as F

    from mini_hadoop_spark.session import get_spark
    from mini_hadoop_spark.workloads.wordcount import word_count

    spark = get_spark("mhs-cli")
    docs = spark.read.text(args.path).withColumnRenamed("value", "text")
    for r in word_count(docs).orderBy(F.desc("cnt"), "word").limit(args.limit).collect():
        print(f"{r.word}\t{r.cnt}")
    return 0


def _pagerank(args) -> int:
    from pyspark.sql import functions as F

    from mini_hadoop_spark.session import get_spark
    from mini_hadoop_spark.workloads.pagerank import adjacency_edges, pagerank

    spark = get_spark("mhs-cli")
    ranks = pagerank(
        adjacency_edges(spark, args.path), iterations=args.iters, damping=args.damping
    )
    for r in ranks.orderBy(F.desc("rank"), "page").limit(args.limit).collect():
        print(f"{r.page}\t{r.rank:.8f}")
    return 0


def _query(args) -> int:
    from mini_hadoop_spark.registry import ALL_QUERIES
    from mini_hadoop_spark.session import get_spark

    if args.name not in ALL_QUERIES:
        print(f"unknown query {args.name!r}; run `queries` to list", file=sys.stderr)
        return 2
    df = ALL_QUERIES[args.name](get_spark("mhs-cli"), args.sf_dir)
    df.show(args.limit, truncate=False)
    return 0


def _queries(_args) -> int:
    from mini_hadoop_spark.registry import ALL_ORACLES, ALL_QUERIES

    for name in ALL_QUERIES:
        print(f"{name}{'' if name in ALL_ORACLES else '  (no oracle)'}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mini_hadoop_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def with_root(sp):
        sp.add_argument("--root", default="/tmp/mini_hadoop_spark_store")
        return sp

    s = with_root(sub.add_parser("store", help="ingest a local file into the block store"))
    s.add_argument("name")
    s.add_argument("local_path")
    s.add_argument("--newline", action="store_true", help="newline-aligned blocks")
    s.set_defaults(fn=_store)

    s = with_root(sub.add_parser("retrieve", help="reassemble a stored file"))
    s.add_argument("name")
    s.add_argument("local_path")
    s.set_defaults(fn=_retrieve)

    s = with_root(sub.add_parser("delete", help="delete a stored file"))
    s.add_argument("name")
    s.set_defaults(fn=_delete)

    s = with_root(sub.add_parser("ls", help="list stored files"))
    s.set_defaults(fn=_ls)

    s = with_root(sub.add_parser("info", help="stored-file info"))
    s.add_argument("name")
    s.set_defaults(fn=_info)

    s = sub.add_parser("wordcount", help="WordCount over a text file/dir")
    s.add_argument("path")
    s.add_argument("--limit", type=int, default=20)
    s.set_defaults(fn=_wordcount)

    s = sub.add_parser("pagerank", help="PageRank over an adjacency TSV")
    s.add_argument("path")
    s.add_argument("--iters", type=int, default=2)
    s.add_argument("--damping", type=float, default=0.85)
    s.add_argument("--limit", type=int, default=20)
    s.set_defaults(fn=_pagerank)

    s = sub.add_parser("query", help="run a registered query")
    s.add_argument("name")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    s.add_argument("--limit", type=int, default=20)
    s.set_defaults(fn=_query)

    s = sub.add_parser("queries", help="list registered queries")
    s.set_defaults(fn=_queries)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
