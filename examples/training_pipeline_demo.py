#!/usr/bin/env python
"""End-to-end training-data curation demo — the extension-side twin of
``reference_demo.py`` (which walks the reference's own README workflow).

Flow, at sf0.001 so it runs in seconds:
1. load ``documents`` into a managed columnar table (zstd, epoch commits);
2. OPTIMIZE ZORDER BY (doc_id, n_chars) — multi-column skipping layout
   (z-order columns must be integer-castable, so the string column
   ``lang`` can't participate);
3. run the composed curation recipe (quality gate → exact dedup → PII
   scrub → per-(lang, source) accounting);
4. near-dup survey via MinHash LSH;
5. vector side: int8-quantize the embeddings table.

Run: python examples/training_pipeline_demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cstore_fdw_spark import CStoreCatalog, get_spark  # noqa: E402
from cstore_fdw_spark.operators import load_all, table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="training-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    with tempfile.TemporaryDirectory(prefix="cstore_demo_") as wh:
        cat = CStoreCatalog(spark, warehouse=wh)

        # 1. ingest into a managed table (new parquet 'stripes' + commit)
        docs = table(spark, SF_DIR, "documents")
        cat.create_table(
            "corpus",
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint", compression="zstd")
        cat.insert("corpus", docs)
        print(f"corpus rows: {cat.row_count('corpus')}, "
              f"bytes: {cat.table_size('corpus')}")

        # 2. cluster the layout for (doc_id, n_chars) zone-map pruning
        n_files = cat.compact("corpus", zorder_by=["doc_id", "n_chars"])
        print(f"z-ordered into {n_files} file(s); the zorder_by choice is "
              "persisted in the table options — every later compact/"
              "vacuum/rewrite re-clusters automatically")

        # 3-6. the registry operators run against the raw sf dir (same
        # data the managed table holds): the composed end-to-end recipe
        # (quality -> dedup -> decontaminate -> mixture -> pack), near-dup
        # survey, BPE tokenizer training + encoding, and the vector side
        # (SQ8 + PQ compression)
        for name in ("training_mix_pipeline", "text_curation_pipeline",
                     "dedup_minhash_lsh", "text_bpe_train",
                     "text_bpe_encode", "embedding_quantize_int8",
                     "vector_quantize_pq"):
            df = registry[name].builder(spark, SF_DIR)
            rows = df.limit(5).collect()
            print(f"{name}: {df.columns} — sample {len(rows)} rows OK")

        cat.drop_table("corpus")
    print("training pipeline demo complete")


if __name__ == "__main__":
    main()
