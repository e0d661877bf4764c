"""dig_entity_resolution_spark — a PySpark-native entity-resolution engine.

A from-scratch rebuild of the capabilities of usc-isi-i2/dig-entity-resolution
(reference mount at /root/reference was empty at survey time — see SURVEY.md §0;
semantics derive from the driver contract BASELINE.json and public algorithms):

  pages → extract → normalize → block (token/prefix/MinHash-LSH) →
  candidate pairs → vectorized pairwise scoring (Jaro-Winkler / Levenshtein /
  TF-IDF cosine) → match edges → transitive closure (large-star/small-star) →
  cluster ids, with checkpoint/resume and per-partition lineage.

Everything is the DataFrame API + Arrow-vectorized pandas UDFs; no per-row
Python UDFs anywhere (enforced by tests/test_no_row_udfs.py).
"""

__version__ = "0.1.0"
