"""Source formats beyond parquet (S-family widening).

The reference reads exactly one format — raw blobs from GCS
(/root/reference/main.py:433, 692). An engine replacing it needs the
standard lake formats; each reader below returns a DataFrame with an
explicit schema (schema inference over 100 TB means reading the data
twice) and each writer round-trips losslessly for the testdata types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = True
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")  # malformed → NULL, never error
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)
