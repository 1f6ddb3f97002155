from .config import TrainConfig  # noqa: F401
from .speaker_net import SpeakerNet  # noqa: F401
from .trainer import (  # noqa: F401
    TrainState, build_speaker_net, create_train_state, make_train_step,
    make_embed_fn,
)
