"""Offline audit reports over the domain universe.

``domain_alias_report`` ports the reference's post_domain_aliases stage
(post_domain_aliases/process_domain_aliases.py:31-99): for every seen
``.gov.au`` domain group probe the 4 variants (http|https) × (bare|www.),
ignore groups where all four fail (assumed wrong domain), and report each
failing variant as a (scheme, domain, reason) row — the reference prints
the same triples as CSV.

The reference probes with live HEAD requests; the sandbox probe derives
reachability from the synthetic host attributes (unknown name → DNS error,
``index_ok=False`` → timeout, ``https=False`` → TLS failure on the https
variants). On a real cluster, swap ``make_attr_probe`` for an async-HTTP
pandas UDF with the same (scheme, domain) → reason-or-null signature; the
surrounding plan (explode → probe → window count → filter) is unchanged
and embarrassingly parallel over domain groups.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from . import refsem


def make_attr_probe(spark: SparkSession, host_attrs: dict):
    """Attribute-driven variant probe: returns the failure reason for a
    (scheme, domain) pair, or null when the variant is reachable."""
    plain = {h: {"https": getattr(a, "https", True),
                 "index_ok": getattr(a, "index_ok", True)}
             for h, a in host_attrs.items()}
    bc = spark.sparkContext.broadcast(plain)

    @pandas_udf(StringType())
    def probe(scheme: pd.Series, domain: pd.Series) -> pd.Series:
        attrs = bc.value
        out = []
        for sch, dom in zip(scheme, domain):
            a = attrs.get(dom)
            if a is None:
                out.append("gaierror: Name or service not known")
            elif not a["index_ok"]:
                out.append("ConnectTimeout: request timed out")
            elif sch == "https" and not a["https"]:
                out.append("SSLError: certificate verify failed")
            else:
                out.append(None)
        return pd.Series(out)

    return probe


def domain_alias_report(spark: SparkSession, hosts: "list[str]",
                        probe) -> DataFrame:
    """The 4-variant reachability matrix as one DataFrame job. Returns the
    failing variants (scheme, domain, reason) of every ``.gov.au`` domain
    group that is reachable under at least one variant."""
    groups = sorted({refsem.host_group(h) for h in hosts
                     if (h or "").lower().endswith(".gov.au")})
    df = spark.createDataFrame([(g,) for g in groups], "grp string")
    variants = df.select(
        "grp",
        F.explode(F.array(*[
            F.struct(F.lit(sch).alias("scheme"),
                     (F.concat(F.lit("www."), F.col("grp")) if www
                      else F.col("grp")).alias("domain"))
            for sch in ("http", "https") for www in (False, True)
        ])).alias("v")).select("grp", "v.scheme", "v.domain")
    probed = variants.withColumn(
        "reason", probe(F.col("scheme"), F.col("domain")))
    n_fail = F.sum(F.when(F.col("reason").isNotNull(), 1).otherwise(0)) \
        .over(Window.partitionBy("grp"))
    return (probed.withColumn("n_fail", n_fail)
            .filter(F.col("reason").isNotNull() & (F.col("n_fail") < 4))
            .select("scheme", "domain", "reason"))
