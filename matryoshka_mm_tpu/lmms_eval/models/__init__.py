from . import llava  # noqa: F401  (register adapters)
