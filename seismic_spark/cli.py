"""spark-submit entry points: build / search / bench.

Cluster usage (north rule: `spark-submit --py-files` on a multi-executor
cluster):

    zip -r seismic_spark.zip seismic_spark
    spark-submit --py-files seismic_spark.zip seismic_spark/cli.py \
        build --input /data/pages --output /indexes/cc --n-postings 3500

(`tools/submit_demo.sh` runs exactly this against the sf0.001 testdata —
the zip is the only way the executors see the package.)

Local usage:
    python -m seismic_spark.cli build --input ... --output ...
    python -m seismic_spark.cli search --index ... --query "spark join window"
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def _spark(args) -> SparkSession:
    from seismic_spark.session import get_spark

    if args.master:
        b = SparkSession.builder.appName("seismic-cli").master(args.master)
        return b.getOrCreate()
    return get_spark("seismic-cli")


def cmd_build(args) -> None:
    from seismic_spark.checkpoint import CheckpointedBuild
    from seismic_spark.postings import IndexConfig
    from seismic_spark.textprep import with_extracted_text

    spark = _spark(args)
    if args.input_format != "parquet":
        # reference-format inputs carry READY vectors (no tokenize/BM25) —
        # build_from_vectors + save, mirroring from_json/from_tar/
        # read_seismic_format (SURVEY §2.1 S1-S3)
        from seismic_spark.index import SeismicSparkIndex
        from seismic_spark.sources import vectors as vsrc

        reader = {
            "jsonl": vsrc.read_jsonl_vectors,
            "tar": vsrc.read_tar_jsonl,
            "seismic-bin": vsrc.read_seismic_bin,
        }[args.input_format]
        vecs = reader(spark, args.input).select("doc_id", "terms", "weights")
        cfg = IndexConfig(
            n_postings=args.n_postings, pruning=args.pruning,
            summary_energy=args.summary_energy, blocking=args.blocking,
            value_type=args.value_type,
        )
        idx = SeismicSparkIndex.build_from_vectors(spark, vecs, cfg)
        idx.save(args.output)
        print(json.dumps({"n_docs": idx.n_docs, "dim": idx.dim}))
        return
    docs = spark.read.parquet(args.input)
    if "text" not in docs.columns and "html" in docs.columns:
        docs = with_extracted_text(docs)
    if "doc_id" not in docs.columns:
        # url→id fallback: dense ids in sorted-url order (collision-free by
        # construction at any corpus size — abs(xxhash64) is a 63-bit space
        # that expects ≈ n²/2^64 silently-merged url pairs by the birthday
        # bound, ~5×10^4 at the 10^12-doc design point).  Supply your own
        # BIGINT doc_id column to skip this join.
        from seismic_spark.vocab import assign_ordered_ids

        docs = docs.join(
            assign_ordered_ids(
                docs.select("url").distinct(), "url",
                id_col="doc_id", id_type="bigint",
            ),
            "url",
        )
    cfg = IndexConfig(
        n_postings=args.n_postings,
        pruning=args.pruning,
        summary_energy=args.summary_energy,
        blocking=args.blocking,
        value_type=args.value_type,
    )
    ckpt = CheckpointedBuild(spark, args.output, resume=not args.no_resume)
    ckpt.build(docs, cfg, batched_indexing=args.batched_indexing)
    print(json.dumps(ckpt.metrics))


def cmd_knn(args) -> None:
    from seismic_spark import knn as knn_mod
    from seismic_spark.index import SeismicSparkIndex

    spark = _spark(args)
    idx = SeismicSparkIndex.load(spark, args.index)
    knn = knn_mod.build_knn(
        idx, nknn=args.nknn, query_cut=args.query_cut,
        heap_factor=args.heap_factor,
    )
    knn_mod.save_knn(knn, args.index)
    print(json.dumps({"docs": knn.count(), "nknn": args.nknn}))


def cmd_search(args) -> None:
    from seismic_spark.index import SeismicSparkIndex

    spark = _spark(args)
    idx = SeismicSparkIndex.load(spark, args.index)
    res = idx.search_text(
        "q0", args.query, k=args.k, query_cut=args.query_cut,
        heap_factor=args.heap_factor, two_phase=args.two_phase,
    )
    # vector-built indexes carry a persisted docmap — print the ORIGINAL
    # external ids, not the internal BIGINTs (no-op for text-built indexes)
    res = idx.remap_results(res)
    for r in sorted(res.collect(), key=lambda r: r.rank):
        print(f"{r.rank}\t{r.doc_id}\t{r.score:.4f}")


def cmd_bench(args) -> None:
    import bench

    print(json.dumps(bench.run(args.sf_dir, args.cores)))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="seismic-spark")
    p.add_argument("--master", default=None, help="override Spark master URL")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from a pages/docs parquet")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument(
        "--input-format", default="parquet",
        choices=["parquet", "jsonl", "tar", "seismic-bin"],
        help="parquet pages/docs (default, tokenize+BM25 path) or the "
             "reference's vector formats (pre-weighted, no BM25 stage)",
    )
    b.add_argument("--n-postings", type=int, default=3500)
    b.add_argument("--pruning", default="fixed", choices=["fixed", "global", "none"])
    b.add_argument("--summary-energy", type=float, default=1.0)
    b.add_argument(
        "--blocking", default="geometric", choices=["geometric", "fixed", "kmeans"]
    )
    b.add_argument(
        "--value-type", default="f64",
        choices=["f64", "f32", "f16", "bf16", "fixedu8", "fixedu16"],
    )
    b.add_argument(
        "--batched-indexing", type=int, default=None,
        help="build postings in N term-range waves (bounded memory, "
             "wave-granular resume)",
    )
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="free-text search against a saved index")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--query-cut", type=int, default=10)
    s.add_argument("--heap-factor", type=float, default=1.0)
    s.add_argument("--two-phase", action="store_true",
                   help="first_sorted-style θ tightening")
    s.set_defaults(fn=cmd_search)

    kn = sub.add_parser("knn", help="build + save the κ-NN graph (one job)")
    kn.add_argument("--index", required=True)
    kn.add_argument("--nknn", type=int, default=10)
    kn.add_argument("--query-cut", type=int, default=10)
    kn.add_argument("--heap-factor", type=float, default=0.7)
    kn.set_defaults(fn=cmd_knn)

    be = sub.add_parser("bench", help="run the headline benchmark")
    be.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    be.add_argument("--cores", type=int, default=32)
    be.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
