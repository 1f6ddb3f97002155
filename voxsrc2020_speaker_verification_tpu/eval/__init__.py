from .extract import extract_embeddings, chunk_spans  # noqa: F401
from .scoring import (  # noqa: F401
    l2norm, speaker_means, cosine_scores, asnorm_scores, cohort_stats,
    read_trials, write_scores,
)
from .metrics import compute_eer_and_min_dcf, evaluate_trials  # noqa: F401
from .serving import EmbeddingService  # noqa: F401
