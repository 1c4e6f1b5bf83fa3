from . import gpt4v, llava  # noqa: F401  (register adapters)
