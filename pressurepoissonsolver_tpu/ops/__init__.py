from . import transforms  # noqa: F401
from . import level_ops  # noqa: F401
