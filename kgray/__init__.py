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

# module map (import directly; kept lazy so `import kgray` stays cheap):
#   kgray.pipeline      staged, resumable flagship (KGPipeline, run_flagship)
#   kgray.transcripts   deterministic transcript corpus + entity catalog
#   kgray.extract       TripleExtractor / MentionDetector map stages
#   kgray.link          broadcast + join entity-linking paths
#   kgray.canonicalize  union-find canonical maps (local / distributed)
#   kgray.materialize   edge dedup, node normalization, partitioned writes
#   kgray.normalize     M1-M7 Arrow kernels (labels, lists, casts)
#   kgray.schema        typed-header -> Arrow schema + DDL/cast codegen
#   kgray.graph_io      KGX CSV / JSONL / MemGraph JSON sources & sinks
#   kgray.relational    joins, grouped aggregates, top-k, runbook queries
#   kgray.dedup         exact / MinHash-LSH / SimHash / Jaccard / embedding
#   kgray.similarity    knn (exact + IVF), cosine pair joins
#   kgray.streaming     tumbling/hopping windows, sessionization
#   kgray.textops       token counts, quality, lang-ID, fingerprints,
#                       tf-idf/BM25, doc rarity, chunking, PII scrub
#   kgray.sampling      hash/stratified/weighted samples, splits, mixing
#   kgray.sketch        HLL, histogram quantiles, Bloom semi-join, CMS
#   kgray.graphalgo     components, PageRank, degrees, triangles, BFS
#   kgray.packing       sequence packing (next-fit token budgeting)
#   kgray.multimodal    binary-payload decode/feature actor plumbing
#   kgray.validate      strict/lenient table validation + drop accounting
#   kgray.lookups       broadcast helpers + class lookups
#   kgray.metrics       stage metrics, lineage manifests, skew stats
