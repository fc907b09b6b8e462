"""CSV ingest / export — the reference's LoadDataExec and SelectIntoExec.

LOAD DATA (executor/load_data.go:46, options parsed at :112-114:
``FIELDS TERMINATED BY / ENCLOSED BY / ESCAPED BY``, ``LINES TERMINATED
BY``, ``IGNORE n LINES``) maps onto Spark's distributed CSV reader options;
SELECT … INTO OUTFILE (executor/select_into.go:33) onto ``df.write.csv``.
Both scale with the file listing — no driver-side row handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def load_data(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    terminated_by: str = ",",
    enclosed_by: str = '"',
    escaped_by: str = "\\",
    ignore_lines: int = 0,
) -> DataFrame:
    """LOAD DATA INFILE: distributed CSV scan with MySQL field options.

    ``IGNORE 1 LINES`` is the native header option; a general N skips the
    first N physical lines of EACH file via a per-file row index (matching
    LoadDataExec, which applies IGNORE per load — one file per statement
    there).
    """
    reader = (
        spark.read.schema(schema)
        .option("sep", terminated_by)
        .option("quote", enclosed_by)
        .option("escape", escaped_by)
        .option("mode", "PERMISSIVE")
    )
    if ignore_lines == 1:
        return reader.option("header", "true").csv(path)
    if ignore_lines == 0:
        return reader.csv(path)
    # General N: parse lines manually — text source + from_csv keeps it
    # distributed; _metadata.file_path scopes the index per file.
    text = (
        spark.read.text(path)
        .select("value", F.col("_metadata.file_path").alias("__f"))
        .withColumn(
            "__i",
            F.row_number().over(
                Window.partitionBy("__f").orderBy(F.monotonically_increasing_id())
            ),
        )
        .where(F.col("__i") > ignore_lines)
    )
    parsed = text.select(
        F.from_csv(
            "value",
            schema if isinstance(schema, str) else schema.simpleString(),
            {"sep": terminated_by, "quote": enclosed_by, "escape": escaped_by},
        ).alias("r")
    )
    return parsed.select("r.*")


def select_into_outfile(
    df: DataFrame,
    path: str,
    *,
    terminated_by: str = ",",
    enclosed_by: str = '"',
    escaped_by: str = "\\",
    header: bool = False,
    mode: str = "overwrite",
) -> None:
    """SELECT … INTO OUTFILE: distributed CSV write (one file per
    partition — the scale behavior; ``coalesce(1)`` upstream if a single
    file is required, accepting the single-writer cost)."""
    (
        df.write.mode(mode)
        .option("sep", terminated_by)
        .option("quote", enclosed_by)
        .option("escape", escaped_by)
        .option("header", str(header).lower())
        .csv(path)
    )
