from . import kaldi_io  # noqa: F401
from . import audio  # noqa: F401
from .dataset import (  # noqa: F401
    FeatureShardDataset, SyntheticDataset, BatchFeeder, FeatureCropper,
    shard_paths_for_host,
)
