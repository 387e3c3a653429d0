from .clip import CLIPTokenizer  # noqa: F401
