from . import nn  # noqa: F401
from . import fbank  # noqa: F401
from . import cmvn  # noqa: F401
from . import specaug  # noqa: F401
