"""csvweb_ray — a Ray-Data-native CSV-on-the-Web (CSVW) knowledge-graph
construction engine.

Scans a Parquet corpus of source-code repositories
``(repo, path, commit, lang, content)``, finds CSV + CSVW-metadata files,
and converts them to RDF triples with the same semantics as the CSVW
csv2rdf algorithm (reference: DataDock/csvweb), expressed as a streaming
Ray Data DAG of ``map_batches`` stages over zero-copy Arrow.

Layout
------
- ``csvweb_ray.metadata`` — CSVW metadata normalization/parsing/compilation
  (pure Python; reference: ``src/DataDock.CsvWeb/Parsing/*``).
- ``csvweb_ray.convert`` — per-file CSV→triples conversion
  (reference: ``src/DataDock.CsvWeb/Rdf/Converter.cs``).
- ``csvweb_ray.rdf`` — Turtle/N-Triples parsing + graph isomorphism for
  conformance scoring (no external RDF library required).
- ``csvweb_ray.stages`` — the Ray Data stages (scan, pairing, convert,
  entity linking, dedup, sorted partitioned write, checkpoint/resume).
- ``csvweb_ray.ops`` — corpus-scale data-pipeline operators over the
  driver test tables (dedup family, ANN, text analysis, multimodal stubs).
"""

__version__ = "0.1.0"

# Sort-partitioning fast path must be active in WORKER processes too (sort
# tasks run the block accessor wherever the UDF deserializes, and workers
# do not see driver monkeypatches).  Every UDF in this package lives in a
# csvweb_ray.* module, so deserializing one imports this package first —
# patching here covers both sides.  Safe: version-guarded, falls back to
# the original implementation for any case it does not recognize.
from .raycfg import _patch_sort_partitioning as _p  # noqa: E402

_p()
del _p
