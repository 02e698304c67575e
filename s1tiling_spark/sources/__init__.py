from s1tiling_spark.sources.tables import load_table, TABLES
from s1tiling_spark.sources.sequences import sequences_from_documents, SEQUENCES_ORACLE_CTE
from s1tiling_spark.sources.synth import synth_sequences

__all__ = [
    "load_table",
    "TABLES",
    "sequences_from_documents",
    "SEQUENCES_ORACLE_CTE",
    "synth_sequences",
]
