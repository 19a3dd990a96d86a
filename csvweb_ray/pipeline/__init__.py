"""Ray-Data-native CSVW knowledge-graph pipeline (the flagship DAG).

Stage map (SURVEY.md §2.7, §3):

``read_parquet`` → ``filter_candidates`` (G1) → ``add_sha256`` (G2) →
``pair_files`` (G3, groupby map_groups with optional salting G8) →
``convert_batches`` (C1-C14/U/D/J as a stateless ``map_batches`` UDF) →
``EntityLinker`` (G4, actor pool over a broadcast IRI dictionary) →
``dedup_triples`` (G5/G6) → ``sort`` + partitioned Parquet write (G7),
orchestrated by ``runner.run_kg_pipeline`` with a per-shard checkpoint
manifest (G9).
"""

from .stages import (  # noqa: F401
    TRIPLE_COLUMNS,
    add_sha256,
    convert_batches,
    dedup_triples,
    filter_candidates,
    pair_files,
    render_ntriples_column,
    scan_corpus,
)
from .runner import run_kg_pipeline  # noqa: F401
from .linker import EntityLinker, build_iri_dictionary  # noqa: F401
