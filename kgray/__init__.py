"""kgray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the graph semantics of the reference `graph-db-parsers`
repo (Biolink property-graph node/edge tables, label-priority
normalization, typed-header schemas, class/predicate binning) as a
streaming Ray Data pipeline over Parquet transcript tables:

    read_parquet(transcripts)
      -> per-conversation turn ordering (sort conv_id, turn_idx)
      -> map_batches triple extraction (zero-copy Arrow)
      -> actor-pool entity linking (alias dict state in __init__)
      -> groupby canonicalization (union-find over equivalent ids)
      -> deduplicated (subject, predicate, object) edge materialization
      -> partitioned Parquet node/edge tables.

Nothing here calls ray.init(); sessions are owned by bench.py, CLI
entry points and the pytest fixture.
"""

__version__ = "0.1.0"
