from fastselect_spark.sources.tables import read_transcripts_table, write_feature_table  # noqa: F401
