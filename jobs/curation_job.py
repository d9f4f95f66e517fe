"""spark-submit entrypoint for the text-curation pipeline — the
training-data twin of jobs/flagship_job.py.

Deployment shape (BASELINE.json north_rule): ship the package as a zip
via ``--py-files`` and run the staged, checkpoint-resumable pipeline on
any cluster size:

    python tools/make_pyfiles.py              # builds dist/geodesk_spark.zip
    spark-submit --master local[8]  --py-files dist/geodesk_spark.zip \
        jobs/curation_job.py --rows 200000 --workdir /tmp/curation_run
    spark-submit --master local[32] --py-files dist/geodesk_spark.zip \
        jobs/curation_job.py --rows 200000 --workdir /tmp/curation_run4

Stages (each an atomic parquet snapshot via streaming.checkpoint.Pipeline;
re-running skips committed stages, so a killed job resumes where it
stopped):
  ingest — read a documents parquet (--input) or synthesize a
           deterministic caption corpus (--rows)
  scrub  — PII wash (textclean.pii_scrub: emails → IPv4 → phones),
           pure scan-side codegen
  pairs  — MinHash-LSH near-duplicate candidate pairs (one shuffle on
           the band key, bucket-capped)
  canon  — Kiveris star-contraction connected components over the pair
           graph; keep one canonical doc per duplicate group
  pack   — whitespace token counts → token-budget sequence packing
           (distributed two-phase prefix sum) → per-bin rollup

Prints per-stage lineage and one final JSON metrics line, exactly like
the flagship job, so the same N-vs-4N submit comparison applies.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000, help="synthetic corpus size")
    ap.add_argument("--input", default=None, help="existing documents parquet (else synthesized)")
    ap.add_argument("--workdir", required=True, help="checkpoint root")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--budget", type=int, default=2048, help="tokens per packed bin")
    args = ap.parse_args()

    # Import AFTER spark-submit has placed the --py-files zip on sys.path.
    from pyspark.sql import SparkSession, functions as F

    from geodesk_spark.operators import dedup, sampling, text, textclean
    from geodesk_spark.streaming.checkpoint import Pipeline

    spark = SparkSession.builder.appName("geodesk-curation").getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    t0 = time.time()
    pipe = Pipeline(spark, args.workdir)

    def ingest(s):
        if args.input:
            return s.read.parquet(args.input).select("doc_id", "text", "lang")
        import pandas as pd

        from geodesk_spark.sources.synth import captions_for_ids

        rng = s.range(0, args.rows, 1, args.partitions)

        def gen(batches):
            langs = ["en", "fr", "de", "es"]
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                yield pd.DataFrame(
                    {
                        "doc_id": ids,
                        "text": captions_for_ids(ids),
                        "lang": [langs[int(i) % 4] for i in ids],
                    }
                )

        return rng.mapInPandas(gen, schema="doc_id long, text string, lang string")

    def scrub(s):
        d = pipe.read("ingest")
        washed = textclean.pii_scrub(d)
        return washed.join(d.select("doc_id", "lang"), "doc_id").select(
            "doc_id",
            F.col("clean_text").alias("text"),
            "lang",
            (F.col("n_emails") + F.col("n_ips") + F.col("n_phones")).alias("n_pii"),
        )

    def pairs(s):
        return dedup.lsh_candidate_pairs(pipe.read("scrub"))

    def canon(s):
        docs = pipe.read("scrub")
        comp = dedup.connected_components(pipe.read("pairs"))
        out = docs.join(comp, "doc_id", "left")
        canonical = F.coalesce("comp_id", F.col("doc_id"))
        return out.select(
            "doc_id", "text", "lang", "n_pii", canonical.alias("canonical_id")
        ).filter(F.col("canonical_id") == F.col("doc_id"))

    def pack(s):
        kept = pipe.read("canon")
        counted = kept.join(text.token_count(kept), "doc_id")
        packed = sampling.pack_sequences(counted, budget=args.budget)
        return (
            packed.groupBy("bin_id")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.col("n_tokens").cast("long")).alias("n_tokens_total"),
            )
            .orderBy("bin_id")
        )

    pipe.stage("ingest", ingest)
    pipe.stage("scrub", scrub, inputs=["ingest"])
    pipe.stage("pairs", pairs, inputs=["scrub"])
    pipe.stage("canon", canon, inputs=["pairs"])
    out = pipe.stage("pack", pack, inputs=["canon"])

    bins = out.agg(
        F.count("*").alias("n_bins"), F.sum("n_tokens_total").alias("n_tokens")
    ).collect()[0]
    n_pii = pipe.read("scrub").agg(F.sum("n_pii")).collect()[0][0]
    elapsed = time.time() - t0
    n_in = pipe.lineage("ingest")["n_rows"]
    n_kept = pipe.lineage("canon")["n_rows"]
    print(
        json.dumps(
            {
                "job": "curation",
                "input_rows": n_in,
                "pii_redactions": int(n_pii or 0),
                "candidate_pairs": pipe.lineage("pairs")["n_rows"],
                "docs_kept": n_kept,
                "dup_docs_removed": n_in - n_kept,
                "n_bins": int(bins["n_bins"]),
                "n_tokens_packed": int(bins["n_tokens"] or 0),
                "elapsed_sec": round(elapsed, 2),
                "rows_per_sec": round(n_in / elapsed),
                "parallelism": spark.sparkContext.defaultParallelism,
                "executors": max(
                    spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1, 1
                ),
                "stages": {
                    s: {
                        k: pipe.lineage(s)[k]
                        for k in ("elapsed_sec", "n_rows", "rows_per_sec")
                    }
                    for s in ("ingest", "scrub", "pairs", "canon", "pack")
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
