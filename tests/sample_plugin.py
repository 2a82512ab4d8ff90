"""Sample X1 pipeline stage used by tests: a scoper-like plugin that
drops links pointing at a configurable host."""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCKED_HOST = "host003.example"


def drop_blocked_host_links(df: DataFrame, cfg) -> DataFrame:
    return df.withColumn(
        "links",
        F.filter("links", lambda u: ~u.contains(F.lit(BLOCKED_HOST))),
    )
