"""entity_extractor_ray — a Ray-Data-native knowledge-graph construction engine.

From-scratch re-expression of the semantics of sabahshaikh03/entity-extractor
(viridium-ai-service, studied read-only at /root/reference) as an idiomatic
Ray Data pipeline over Parquet transcript tables:

    read_parquet(turns) -> map_batches(mention/triple actors)
      -> per-conversation assembly (groupby conv_id)
      -> entity linking + canonicalization (groupby block keys, union-find)
      -> graph materialize (node/edge dedup shuffles)
      -> PFAS-style status rollup (grouped lattice aggregate, fixed point)
      -> write_parquet(nodes, edges, lineage, metrics) with manifests

Nothing here calls ray.init()/ray.shutdown(); sessions are owned by the
caller (tests' conftest fixture, bench.py, or the driver).
"""

__version__ = "0.1.0"
