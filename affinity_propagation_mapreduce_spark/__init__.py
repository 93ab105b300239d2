"""A PySpark-native analytics engine with the query and data-processing
capabilities of the reference ``dam-grassman/Affinity-Propagation-MapReduce``
(Affinity Propagation clustering expressed as MapReduce passes), rebuilt
Spark-first on the DataFrame/SQL/Catalyst stack and extended with the
relational / text / vector / event operators a large-scale training-data
pipeline needs (SURVEY.md §2).

Design notes
------------
* The reference's computational surface — pairwise similarity, median
  preference, alternating row-parallel (responsibility) and column-parallel
  (availability) message passes with damping, exemplar extraction, and
  assignment [Frey & Dueck 2007; Hung et al. MR-AP] — is expressed here as
  relational operators over a coordinate-format matrix DataFrame
  ``(i, k, s, r, a)``.  The MR row/column re-keying becomes a Catalyst-planned
  shuffle (``Window.partitionBy("i")`` vs ``partitionBy("k")``); the
  per-iteration HDFS round-trip becomes ``localCheckpoint()``.
* Every declared operator has a DuckDB-oracle SQL twin (see
  ``registry.ORACLES``); value parity is engineered to be bitwise where
  possible (sequential float64 folds) and rounded where summation order is
  engine-dependent.
"""

__version__ = "0.1.0"
