from . import knn, ivf, dedup, ann, partitioning, multimodal  # noqa: F401
