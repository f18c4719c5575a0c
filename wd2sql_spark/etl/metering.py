"""Progress metering (2-A#16): the reference keeps a running count of
entities/bytes and redraws a status line every 1000 entities
(main.rs:108-118, 223-237). The Spark-native analog is ``df.observe`` —
metrics accumulate on executors during the job with zero extra passes and
are read on the driver after the action completes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from wd2sql_spark.etl import schema as S


def with_metering(entities: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach an Observation to the parsed-entities relation. After any
    action on a derived DataFrame, ``obs.get`` yields::

        {"entities": n_good, "corrupt": n_quarantined, "bytes": input_bytes}

    matching the reference's entity/byte counters (main.rs:170-186) plus
    its stderr error count (main.rs:177-219).
    """
    obs = Observation("wd2sql_etl")
    metered = entities.observe(
        obs,
        F.count(F.when(F.col(S.CORRUPT_COL).isNull() & F.col("id").isNotNull(), 1)).alias(
            "entities"
        ),
        F.count(F.when(F.col(S.CORRUPT_COL).isNotNull() | F.col("id").isNull(), 1)).alias(
            "corrupt"
        ),
        F.sum(F.length("line")).alias("bytes"),
    )
    return metered, obs
