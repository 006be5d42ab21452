"""ditto_spark — a from-scratch, PySpark-native record-linkage / entity-matching
engine with the capabilities of zhempstead/ditto (reference at /root/reference,
read-only), re-expressed Spark-first.

Pipeline (SURVEY.md §7): transcripts → serialize (window-ordered COL/VAL concat)
→ MinHash-LSH blocking over token shingles (salted hot keys) → batched pairwise
scorer inside pandas/Arrow iterator UDFs → strict p > τ threshold →
large-star/small-star connected components → entity clusters.

Everything is DataFrame-declarative so Catalyst/AQE pick physical strategies;
Python appears only inside Arrow-batched UDFs (never per-row).
"""

__version__ = "0.1.0"
