from .chunker import chunk_documents  # noqa: F401
from .knn import knn, knn_join  # noqa: F401
