"""G4 — mention detection + entity-link scoring as an actor-pool stage.

The north-star pipeline scores literal mentions in the emitted triples
against a **shared IRI dictionary**.  The dictionary is built once from
the minted subject IRIs (label = the IRI's trailing path/fragment
segment), put in the object store with ``ray.put`` on the driver, and
read zero-copy by each actor in ``__init__`` — it is never re-shipped per
batch (the broadcast-small-side pattern; SURVEY.md §2.7 G4).

Scale assumption (documented): the entity dictionary is vocabulary-sized
and fits in a worker heap; ``max_entries`` caps it defensively.  At a
scale where it does not fit, the right design is a hash-partitioned
bucket join instead — the dictionary build below already pre-aggregates
per batch so only distinct (label, iri) pairs reach the driver.
"""

from __future__ import annotations

import re
import urllib.parse

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["build_iri_dictionary", "EntityLinker", "link_triples"]

#: Predicate minted for accepted links (our own vocab; the reference has
#: no linking stage — this is graft-added semantics).
LINK_PRED = "http://corpus.invalid/vocab#linksTo"

_WS = re.compile(r"\s+")


def _label_of_iri(iri: str) -> str | None:
    """Human label candidate from an IRI: last fragment / path segment,
    percent-decoded, word-normalized."""
    tail = iri.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
    if not tail:
        return None
    label = urllib.parse.unquote(tail).replace("_", " ").replace("-", " ")
    label = _WS.sub(" ", label).strip().casefold()
    return label or None


def build_iri_dictionary(triples_ds, max_entries: int = 1_000_000) -> dict:
    """label → IRI over distinct subject IRIs.

    Per-batch partial dedup (the combiner) → ``groupby(label)`` keeping the
    smallest IRI (deterministic) → driver dict.  Only the already-distinct
    (label, iri) pairs cross the shuffle.
    """
    from ray.data.aggregate import Min

    def _extract(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.equal(batch["subj_kind"], "i"))
        labels, iris = [], []
        for iri in pc.unique(sub["subj"]).to_pylist():
            label = _label_of_iri(iri)
            if label:
                labels.append(label)
                iris.append(iri)
        return pa.table({"label": pa.array(labels, type=pa.string()),
                         "iri": pa.array(iris, type=pa.string())})

    # native Min aggregate (vectorized per block) — a per-group UDF here
    # would cost one Python call per distinct label
    pairs = (triples_ds.map_batches(_extract, batch_format="pyarrow")
             .groupby("label").aggregate(Min("iri", alias_name="iri")))
    out: dict[str, str] = {}
    for batch in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for label, iri in zip(batch["label"].to_pylist(), batch["iri"].to_pylist()):
            if len(out) >= max_entries:
                return out
            out.setdefault(label, iri)
    return out


class EntityLinker:
    """Callable class → Ray actor pool: dictionary fetched ONCE per actor
    in ``__init__`` (zero-copy ``ray.get`` of the broadcast ref), batches
    scored in ``__call__``.

    Scoring: a string-literal object whose normalized text equals a
    dictionary label links with score 1.0; a literal whose token *set*
    equals a label's token set links 0.8 (mention detection by token
    identity — deterministic, no model).  Emits ``link_iri`` /
    ``link_score`` columns; ``as_triples=True`` additionally rewrites
    accepted links into ``linksTo`` triples.
    """

    def __init__(self, dict_ref):
        import ray

        self.lookup: dict[str, str] = (
            ray.get(dict_ref) if not isinstance(dict_ref, dict) else dict_ref)
        self.token_lookup = {}
        for label, iri in self.lookup.items():
            self.token_lookup.setdefault(frozenset(label.split()), (label, iri))
        self.ws = _WS

    def _score_one(self, value: str) -> tuple[str | None, float]:
        norm = self.ws.sub(" ", value).strip().casefold()
        if not norm:
            return None, 0.0
        hit = self.lookup.get(norm)
        if hit:
            return hit, 1.0
        tok = self.token_lookup.get(frozenset(norm.split()))
        if tok:
            return tok[1], 0.8
        return None, 0.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        # NB: pyarrow's and_/or_ are non-Kleene (True OR null = null), and
        # an all-null obj_datatype column reads back as null-typed — build
        # the mask in Python over the (small) per-batch lists
        kinds = batch["obj_kind"].to_pylist()
        dts = batch["obj_datatype"].to_pylist()
        xsd_string = "http://www.w3.org/2001/XMLSchema#string"
        mask = [k == "l" and (d is None or d == xsd_string)
                for k, d in zip(kinds, dts)]
        values = batch["obj_value"].to_pylist()
        # memoize per distinct value within the batch
        cache: dict[str, tuple[str | None, float]] = {}
        link_iri, link_score = [], []
        for keep, v in zip(mask, values):
            if not keep or v is None:
                link_iri.append(None)
                link_score.append(None)
                continue
            if v not in cache:
                cache[v] = self._score_one(v)
            iri, score = cache[v]
            link_iri.append(iri)
            link_score.append(score if iri else None)
        batch = batch.append_column("link_iri", pa.array(link_iri, type=pa.string()))
        return batch.append_column("link_score", pa.array(link_score, type=pa.float64()))


def default_pool_size() -> int:
    """Actor-pool size that leaves CPUs for the read/shuffle/write stages
    (a pool reserving every CPU deadlocks the streaming executor — the
    pipeline's other stages can never schedule)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(1, min(16, cpus // 2))


def link_triples(ds, dict_ref, concurrency: int | None = None,
                 batch_size: int = 4096, num_cpus: float = 1):
    """Attach the linker actor pool to a triples dataset."""
    if concurrency is None:
        concurrency = default_pool_size()
    return ds.map_batches(
        EntityLinker, fn_constructor_args=(dict_ref,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus)


def links_as_triples(ds):
    """Accepted links (score ≥ 0.8) → ``(subj, linksTo, link_iri)`` triple
    rows appended to the stream, lineage preserved."""

    def _emit(batch: pa.Table) -> pa.Table:
        accepted = batch.filter(pc.and_(pc.is_valid(batch["link_iri"]),
                                        pc.greater_equal(batch["link_score"], 0.8)))
        if accepted.num_rows == 0:
            return batch
        n = accepted.num_rows

        def typed(name: str, values=None):
            # mirror the incoming block's field type exactly (all-null
            # columns round-trip as null-typed; concat requires equality)
            ftype = batch.schema.field(name).type
            if values is None:
                return pa.nulls(n, type=ftype)
            return pa.array(values, type=None).cast(ftype) \
                if not pa.types.is_null(ftype) else pa.nulls(n, type=ftype)

        extra = {
            "subj_kind": accepted["subj_kind"],
            "subj": accepted["subj"],
            "pred": typed("pred", [LINK_PRED] * n),
            "obj_kind": typed("obj_kind", ["i"] * n),
            "obj_value": accepted["link_iri"].combine_chunks().cast(
                batch.schema.field("obj_value").type),
            "obj_datatype": typed("obj_datatype"),
            "obj_lang": typed("obj_lang"),
            "repo": accepted["repo"], "path": accepted["path"],
            "commit": accepted["commit"],
            "content_sha256": accepted["content_sha256"],
            "link_iri": typed("link_iri"),
            "link_score": typed("link_score"),
        }
        extra_tbl = pa.Table.from_pydict(
            {k: extra[k] for k in batch.column_names})
        return pa.concat_tables([batch, extra_tbl])

    return ds.map_batches(_emit, batch_format="pyarrow")
