from . import refops, text, vectors  # noqa: F401
