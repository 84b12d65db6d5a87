"""cdn.json (CDN provider map) loader + domain → provider enrichment.

The reference resolves CNAME domains to CDN provider names with an exact
dict lookup on the domain's base (last two labels), plus one hard-coded
substring rule — any base containing "kunlun" is 阿里云 CDN
(``ipHandle/pkg/cdn/cdn.go:62-87``, base-cname parse ``:80-87``).

Spark shape: the JSON map becomes a tiny dim DataFrame and the lookup a
broadcast equi-join on a JVM-side ``base_cname`` expression — no per-row
Python at any scale.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

KUNLUN_PROVIDER = "阿里云 CDN"  # reference cdn.go:73-77


def load_cdn_map(path: str) -> dict[str, str]:
    """cdn.json → {base_domain: provider_name} (entries carry
    ``{"name": ..., "link": ...}``; only the name is used, like the
    reference's CDNResult.String)."""
    with open(path, encoding="utf-8") as f:
        raw = json.load(f)
    return {dom: entry.get("name", "") for dom, entry in raw.items()}


def cdn_map_df(spark: SparkSession, path: str) -> DataFrame:
    rows = sorted(load_cdn_map(path).items())
    return spark.createDataFrame(rows, "base_cname string, cdn_name string")


def base_cname(col: Column | str) -> Column:
    """Last two dot-labels of a domain (reference parseBaseCname,
    cdn.go:80-87); domains with fewer than two labels pass through."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat(
            F.element_at(parts, -2), F.lit("."), F.element_at(parts, -1)
        ),
    ).otherwise(c)


def enrich_cdn(
    df: DataFrame, cdn: DataFrame, domain_col: str, out_col: str = "cdn_name"
) -> DataFrame:
    """Attach the CDN provider name for a domain column.

    Exact broadcast lookup on the base cname, then the reference's kunlun
    substring fallback; unmatched domains yield NULL (the reference
    returns not-found)."""
    keyed = df.withColumn("__base_cname", base_cname(domain_col))
    joined = keyed.join(broadcast(cdn), F.col("__base_cname") == cdn.base_cname, "left")
    resolved = F.coalesce(
        F.col("cdn_name"),
        F.when(F.col("__base_cname").contains("kunlun"), F.lit(KUNLUN_PROVIDER)),
    )
    return joined.select(
        *[F.col(c) for c in df.columns], resolved.alias(out_col)
    )
