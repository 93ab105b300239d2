"""Operator families (SURVEY.md §2): each module exposes QUERIES
(name -> callable(spark, sf_dir) -> DataFrame) and ORACLES
(name -> DuckDB SQL string; omitted keys are rows-only checks)."""
