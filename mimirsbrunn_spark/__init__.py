"""mimirsbrunn_spark — a PySpark-native time-series rollup / downsample /
retention engine over Common-Crawl-style web-page tables.

Capability graft of antoine-de/mimirsbrunn (see SURVEY.md): the reference's
ingest → enrich → dedup/aggregate → atomic-publish → serve lifecycle
(/root/reference/src/bin/osm2mimir.rs:41-163, libs/mimir/src/rubber.rs:553-602)
re-expressed Spark-first:

- ``ingest``    — pages scan, host derivation, exact dedup, text invariant
- ``series``    — base 1-minute series via salted two-stage aggregation
- ``tiers``     — 1m → 1h → 1d → 30d continuous-aggregate cascade
- ``gapfill``   — time-spine + locf + linear interpolation window fills
- ``codecs``    — delta-of-delta timestamps + Gorilla-XOR values (numpy kernels
                  inside Arrow-batched pandas UDFs; no per-row Python)
- ``tables``    — snapshot table layer (atomic manifest commits, time travel,
                  lineage + metrics) — Iceberg-style; drop-in for real Iceberg
                  on a cluster (this sandbox ships no Iceberg jars)
- ``jobs``      — resumable spark-submit entry points
- ``operators`` — training-data pipeline ops (dedup/minhash/simhash, ANN,
                  text analysis, multimodal plumbing) + the reference's
                  relational operator inventory (SURVEY.md §2)
"""

__version__ = "0.1.0"
