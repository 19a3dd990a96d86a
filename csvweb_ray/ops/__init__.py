"""Large-scale training-data operators (graft-added, no reference
counterpart): deduplication family, similarity search, text analysis,
multimodal plumbing.  Each operator is a Dataset → Dataset transform
built from ``map_batches`` (+ a ``groupby`` only where co-location is
semantically required), with the vectorized kernel inside the batch
function.
"""

from . import dedup, multimodal, similarity, text  # noqa: F401
