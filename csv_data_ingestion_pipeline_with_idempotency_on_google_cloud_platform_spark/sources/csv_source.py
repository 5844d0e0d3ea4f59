"""CSV directory source — operator S1 in SURVEY.md §2a.

Reference behavior (``/root/reference/csv-processor-function/main.py:39-41,
116-121``): a new object in the bucket triggers processing; content is
downloaded as one text blob and split on newlines. Spark-first
re-expression:

- typed access:      ``spark.read.csv(dir, header=True, mode=PERMISSIVE)``
  with `_corrupt_record` capture so malformed rows become data, and
  partitioned scans instead of whole-file-in-memory download.
- file-granularity:  the hidden ``_metadata`` struct + ``input_file_name``
  gives (file_name, file_size, file_modification_time) without reading
  row content twice — the reference fetches the same triple via a GCS
  metadata RPC (``main.py:43-47``).
- event-driven:      ``spark.readStream`` file source (streaming module)
  natively reproduces "new file appears → gets processed"
  (``ARCHITECTURE.md:10-16``).

At 100 TB scale the batch reader splits large CSVs across tasks
(``spark.sql.files.maxPartitionBytes``) and compacts small files per task
(``openCostInBytes``); nothing is ever collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """Typed, partitioned CSV scan with corrupt-record capture.

    PERMISSIVE mode + `_corrupt_record` turns the reference's
    exception-driven failure path (main.py:126-127 raise) into a data
    path: bad rows survive the scan and can be routed to `failed`.
    """
    reader = spark.read.option("header", str(header).lower()).option("mode", "PERMISSIVE")
    if schema is not None:
        if "_corrupt_record" not in schema.fieldNames():
            schema = T.StructType(
                list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
            )
        reader = reader.schema(schema).option("columnNameOfCorruptRecord", "_corrupt_record")
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_csv_file_metadata(spark: SparkSession, path: str) -> DataFrame:
    """File-granularity metadata view: one row per CSV file.

    Columns mirror the triple the reference fetches per blob
    (main.py:43-47): (bucket_name, file_name, file_size, time_created).
    Uses Spark's `_metadata` hidden column on a text scan — the file is
    listed, not parsed, and content is read once line-wise for counting
    downstream.
    """
    df = (
        spark.read.format("text")
        .load(path)
        .select(
            F.col("_metadata.file_path").alias("full_path"),
            F.col("_metadata.file_name").alias("file_name"),
            F.col("_metadata.file_size").alias("file_size"),
            F.col("_metadata.file_modification_time").alias("time_created"),
            F.col("value").alias("line"),
        )
    )
    # bucket_name := parent directory (object-store bucket stand-in)
    return df.withColumn(
        "bucket_name",
        F.element_at(F.split(F.col("full_path"), "/"), -2),
    )


def read_csv_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int = 100,
) -> DataFrame:
    """Structured Streaming file source — the event-driven trigger.

    `maxFilesPerTrigger` is the admission-control knob standing in for
    the reference's per-event function invocation (ARCHITECTURE.md:153-158).
    """
    return (
        spark.readStream.format("csv")
        .schema(schema)
        .option("header", "true")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
    )
