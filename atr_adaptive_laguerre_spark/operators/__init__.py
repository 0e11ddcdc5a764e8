"""Spark-native operator library: dedup, similarity search, text
analysis, multimodal plumbing, validation aggregates.  Each module
exposes ``QUERIES`` (name -> callable(spark, sf_dir) -> DataFrame) and
``ORACLES`` (name -> DuckDB SQL twin) that the driver contract merges."""
