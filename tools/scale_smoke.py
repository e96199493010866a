#!/usr/bin/env python
"""Scale-up smoke: drive the heavy LLM-pipeline operators on a K×
replicated corpus and record wall time + output growth.

    python tools/scale_smoke.py [--scale 8] [--src /root/testdata/sf0.1]

Builds `<repo>/tmp_scale/x{K}/` containing documents / embeddings /
events replicated K× (ids offset per copy, payload columns byte-
identical — every document gains K-1 exact twins, the worst case for
dedup pair expansion), with the relational tables symlinked from the
source SF.  Then runs the operators whose cost is driven by those
tables and prints one JSON line per query:

    {"query": ..., "rows_1x": ..., "rows_Kx": ..., "sec_1x": ...,
     "sec_Kx": ..., "time_ratio": ...}

What this checks that the per-SF strict runs cannot:
- fenced blocks stay fenced (all-pairs confirms, vocab caps, bounded
  broadcasts) — their cost must NOT grow ~K²;
- bucketed/banded paths (MinHash LSH, sign-bit LSH, IVF/PQ) absorb a
  K× corpus with ~K× work even when every bucket is full of exact
  twins;
- nothing driver-materializes the corpus (a collect would OOM long
  before 100 TB, but shows up here as superlinear time first).

A time_ratio wildly above K (for a K× corpus) is the smoke signal;
modest ratios are expected because local[32] overheads amortize.
Exit code is non-zero if any query fails or any ratio exceeds
--ratio-limit (default 3×K).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Operators whose cost is driven by documents/embeddings/events.
SMOKE_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_incremental",
    "sim_cosine_topk",
    "sim_lsh_ann",
    "sim_ivf_ann",
    "sim_pq_ann",
    "text_stats",
    "text_bm25_search",
    "text_keyword_tfidf",
    "text_source_drift_jsd",
    "pipeline_training_data",
    "events_dau_wau_mau",
    "window_session_batch",
    "dedup_url_canonical",
    "mix_epoch_shuffle",
    "events_concurrency_sweep",
    "events_cohort_ltv",
    "stat_chi2_independence",
    "sim_semantic_dedup",
    "sim_range_search",
    "text_gopher_filter",
]

REL_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
]


def build_corpus(src: str, out: str, scale: int) -> None:
    """Replicate documents/embeddings/events scale× with offset ids
    (text/embedding/event payloads byte-identical per copy); symlink
    the relational tables."""
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    reps = {
        "documents": ("doc_id", "text, lang, source, n_chars"),
        "embeddings": ("vec_id", "embedding, label"),
        "events": ("event_id", "ts, user_id + {off} AS user_id, "
                                "event_type, value, props"),
    }
    for table, (idcol, rest) in reps.items():
        src_file = f"{src}/{table}.parquet"
        n = con.execute(
            f"SELECT max({idcol}) + 1 FROM '{src_file}'"
        ).fetchone()[0]
        selects = []
        for k in range(scale):
            off = k * n
            cols = rest.format(off=off)
            selects.append(
                f"SELECT {idcol} + {off} AS {idcol}, {cols} "
                f"FROM '{src_file}'"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO "
            f"'{out}/{table}.parquet' (FORMAT PARQUET)"
        )
    for table in REL_TABLES:
        dst = f"{out}/{table}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{src}/{table}.parquet", dst)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=8)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--ratio-limit", type=float, default=None,
                    help="fail if sec_Kx/sec_1x exceeds this (default 3*scale)")
    args = ap.parse_args()
    ratio_limit = args.ratio_limit or 3.0 * args.scale

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "tmp_scale", f"x{args.scale}")
    if os.path.isdir(out):
        shutil.rmtree(out)
    build_corpus(args.src, out, args.scale)

    from splitserve_spark.registry import REGISTRY, load_all
    from splitserve_spark.session import get_session

    load_all()
    spark = get_session()
    failures = []
    for name in SMOKE_QUERIES:
        spec = REGISTRY[name]
        rec = {"query": name}
        try:
            for tag, sf_dir in (("1x", args.src), (f"{args.scale}x", out)):
                t0 = time.time()
                rows = spec.fn(spark, sf_dir).count()
                rec[f"rows_{tag}"], rec[f"sec_{tag}"] = rows, round(
                    time.time() - t0, 3
                )
            rec["time_ratio"] = round(
                rec[f"sec_{args.scale}x"] / max(rec["sec_1x"], 1e-9), 2
            )
            if rec["time_ratio"] > ratio_limit:
                rec["verdict"] = "SUPERLINEAR"
                failures.append(name)
            else:
                rec["verdict"] = "ok"
        except Exception as exc:  # noqa: BLE001 — report, keep smoking
            rec["error"] = f"{type(exc).__name__}: {exc}"[:300]
            failures.append(name)
        print(json.dumps(rec), flush=True)
    print(json.dumps({
        "scale": args.scale,
        "queries": len(SMOKE_QUERIES),
        "failed": failures,
    }), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
