"""L3b — place recognition (DBoW2-capability re-design).

A hierarchical-k-means binary-descriptor vocabulary stored as flat arrays
(children table + descriptor table), with batched tree descent on device
(all descriptors advance one level per step instead of the reference's
per-descriptor recursive walk, TemplatedVocabulary.h:1217-1259), sparse
BoW vectors, the six DBoW2 scorers, an inverted-file database with the
reference's loop-candidate cascade, and host-side vocabulary training
(hierarchical k-means with kmeans++ seeding and bit-majority means).
"""

from irotavg_tpu.placerec.vocabulary import (  # noqa: F401
    Vocabulary, train_vocabulary, train_vocabulary_flat,
)
from irotavg_tpu.placerec.bow import bow_score  # noqa: F401
from irotavg_tpu.placerec.database import ViewDatabase  # noqa: F401
