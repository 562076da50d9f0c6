#!/usr/bin/env python
"""The reference's end-to-end demo workflow (reference README.md:180-261),
run verbatim-in-spirit on the PySpark engine: create a compressed columnar
customer_reviews table, COPY two yearly CSVs, ANALYZE, then the two demo
queries — the customer/Dune point lookup and the title-length/rating
width_bucket correlation.

Run: python examples/reference_demo.py
"""

from __future__ import annotations

import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cstore_fdw_spark import CStoreCatalog, get_spark  # noqa: E402
from cstore_fdw_spark.io import copy_from_csv  # noqa: E402

SCHEMA = """
    customer_id string, review_date date, review_rating int,
    review_votes int, review_helpful_votes int, product_id string,
    product_title string, product_sales_rank bigint, product_group string,
    product_category string, similar_product_ids string
"""

TITLES = ["Dune", "Dune Messiah", "Children of Dune", "A Memory of Light",
          "The Hobbit", "Analysis of Columnar Stores, a Retrospective"]


def synthesize_csv(path: str, year: int, rows: int, seed: int) -> None:
    """Deterministic stand-in for the demo's Amazon review CSVs."""
    rng = random.Random(seed)
    with open(path, "w") as f:
        for i in range(rows):
            title = rng.choice(TITLES)
            cust = ("A27T7HVDXA3K2A" if i % 97 == 0
                    else f"C{rng.randrange(10_000):08d}")
            f.write(",".join([
                cust, f"{year}-{rng.randrange(1, 13):02d}-{rng.randrange(1, 29):02d}",
                str(rng.randrange(1, 6)), str(rng.randrange(50)),
                str(rng.randrange(30)), f"P{rng.randrange(3000):07d}",
                f'"{title}"', str(rng.randrange(1_000_000)), "Book",
                "Science Fiction", f'"{{P0000001,P0000002}}"']) + "\n")


def main() -> dict:
    spark = get_spark(app_name="reference-demo")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as tmp:
        catalog = CStoreCatalog(spark, warehouse=os.path.join(tmp, "wh"))

        # CREATE FOREIGN TABLE ... OPTIONS(compression 'pglz')
        catalog.create_table("customer_reviews", SCHEMA, compression="pglz")

        # \COPY customer_reviews FROM 'customer_reviews_199x.csv' WITH CSV
        for year, seed in ((1998, 1998), (1999, 1999)):
            csv = os.path.join(tmp, f"customer_reviews_{year}.csv")
            synthesize_csv(csv, year, 20_000, seed)
            copy_from_csv(catalog, "customer_reviews", csv)

        # ANALYZE customer_reviews
        stats = catalog.analyze("customer_reviews")

        catalog.sql_view("customer_reviews")

        # demo query 1: reviews by one customer on the Dune series in 1998
        dune = spark.sql("""
            SELECT customer_id, review_date, review_rating, product_id,
                   product_title
            FROM customer_reviews
            WHERE customer_id = 'A27T7HVDXA3K2A'
              AND product_title LIKE '%Dune%'
              AND review_date >= '1998-01-01'
              AND review_date <= '1998-12-31'
        """).collect()

        # demo query 2: title-length bucket vs average rating
        buckets = spark.sql("""
            SELECT CAST(LEAST(GREATEST(FLOOR((LENGTH(product_title) - 1) * 5
                       / 49.0) + 1, 0), 6) AS BIGINT) AS title_length_bucket,
                   CAST(ROUND(CAST(SUM(CAST(review_rating AS DECIMAL(12,2)))
                       AS DECIMAL(18,6)) / COUNT(*), 2) AS DOUBLE)
                     AS review_average,
                   COUNT(*) AS count
            FROM customer_reviews
            WHERE product_group = 'Book'
            GROUP BY title_length_bucket
            ORDER BY title_length_bucket
        """).collect()

        size = catalog.table_size("customer_reviews")
        out = {
            "rows": stats["rows"],
            "table_size_bytes": size,
            "dune_reviews_1998": len(dune),
            "buckets": [(r.title_length_bucket, r.review_average, r["count"])
                        for r in buckets],
        }
        print("customer_reviews rows:", out["rows"])
        print("cstore_table_size:", size, "bytes")
        print("Dune reviews by A27T7HVDXA3K2A in 1998:", len(dune))
        for b in out["buckets"]:
            print("  bucket", b[0], "avg rating", b[1], "reviews", b[2])
        return out


if __name__ == "__main__":
    main()
