from . import build, schemas  # noqa: F401
